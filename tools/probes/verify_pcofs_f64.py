#!/usr/bin/env python
"""CPU-f64 verification of multistart campaign outputs: evaluate the final
pcofs of a cnot3_ms_*.npz in float64 (the library's documented final
verification pass) at the campaign's nsteps.

Usage: JAX_PLATFORMS=cpu python verify_pcofs_f64.py <tag> [nsteps] [topk]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax.numpy as jnp

import qgd_tpu
from qgd_tpu.segmented import segmented_objective_and_gradient

tag = sys.argv[1]
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 30720
topk = int(sys.argv[3]) if len(sys.argv) > 3 else 3

root = os.path.join(os.path.dirname(__file__), "..", "..")
a = np.load(os.path.join(root, "results", "diag", f"cnot3_{tag}.npz"))
pcofs, objs = a["pcofs"], a["objs"]
order_idx = np.argsort(objs[-1])[:topk]

prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=nsteps)
controls = tuple(qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
                 for f in qgd_tpu.models.cnot3_carrier_frequencies())
tgt = qgd_tpu.models.cnot3_target()

rows = []
for i in order_idx:
    (j1, g, r), grad = segmented_objective_and_gradient(
        prob, controls, jnp.asarray(pcofs[i]), tgt, 4,
        ridge_penalty_strength=1e-2)
    row = dict(start=int(i), f32_final=float(objs[-1][i]),
               f64_j1=float(j1), f64_guard=float(g),
               f64_total=float(j1) + float(g) + float(r),
               f64_grad_norm=float(jnp.linalg.norm(grad)))
    rows.append(row)
    print(json.dumps(row), flush=True)

out = os.path.join(root, "results", "diag", f"cnot3_{tag}.f64verify.json")
json.dump(rows, open(out, "w"), indent=1)
print("wrote", out, flush=True)
