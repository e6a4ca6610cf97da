#!/usr/bin/env python
"""TPU multistart basin scan for CNOT3 (round-3 diagnosis): S random seeds
optimized in lockstep on one chip (optimize_gate_multistart, the TPU-native
replacement of the reference's SLURM array scale-out). Tests whether the
guarded objective's infid~1.2e-2 equilibrium is the global basin or a
seed-1 artifact.

Usage: python tools/probes/cnot3_multistart.py [S] [nsteps] [maxIter]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import qgd_tpu

S = int(sys.argv[1]) if len(sys.argv) > 1 else 24
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 300

prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=nsteps)
prob = dataclasses.replace(prob, solver="schulz", dtype="float32",
                           hoist_batch_hint=S)
controls = tuple(qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
                 for f in qgd_tpu.models.cnot3_carrier_frequencies())
tgt = qgd_tpu.models.cnot3_target()
n = sum(c.N_coeff for c in controls)
rng = np.random.default_rng(100)
pcofs0 = jnp.asarray(rng.uniform(-0.002, 0.002, (S, n)))

print(f"backend={jax.default_backend()} S={S} nsteps={nsteps} "
      f"maxIter={max_iter}", flush=True)
t0 = time.time()
pcofs, objs = qgd_tpu.optimize_gate_multistart(
    prob, controls, pcofs0, tgt, order=4, pcof_L=-0.02, pcof_U=0.02,
    maxIter=max_iter, ridge_penalty_strength=1e-2, print_level=5)
wall = time.time() - t0

final = objs[-1]
best = int(np.argmin(final))
out = os.path.join(os.path.dirname(__file__), "..", "..", "results", "diag",
                   "cnot3_multistart")
np.savez(out + ".npz", pcofs=np.asarray(pcofs), objs=objs,
         pcofs0=np.asarray(pcofs0))
rec = {"S": S, "nsteps": nsteps, "maxIter": max_iter,
       "wall_s": round(wall, 1),
       "best_obj": float(final[best]), "best_seed_idx": best,
       "obj_min": float(final.min()), "obj_median": float(np.median(final)),
       "obj_max": float(final.max())}
print("MULTISTART_RESULT " + json.dumps(rec), flush=True)
with open(out + ".summary.json", "w") as f:
    json.dump(rec, f, indent=1)
