#!/usr/bin/env python
"""Fill the two missing gradient walls in results/cnot3_order_sweep.json
(VERDICT r4 #5): o2 nsteps=220k and o4 nsteps=307.2k, CPU f64 segmented
gradient, jit-warm timing (compile excluded via a tiny warmup at a
different nsteps is NOT possible — same-shape warmup run first, timed run
second)."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax.numpy as jnp
import qgd_tpu
from qgd_tpu.segmented import segmented_objective_and_gradient

root = os.path.join(os.path.dirname(__file__), "..", "..")
data = json.load(open(os.path.join(root, "results/cnot3_order_sweep.json")))
flag = np.load(os.path.join(root, "results/cnot3_r3_flagship.npz"))
h = json.load(open(os.path.join(root, "results/cnot3_r3_flagship.json")))
pcof = jnp.asarray(flag["pcof"][int(np.argmin(h["obj_value"]))])
tgt = qgd_tpu.models.cnot3_target()
controls = tuple(qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
                 for f in qgd_tpu.models.cnot3_carrier_frequencies())

for order, nsteps in [(2, 220_000), (4, 307_200)]:
    prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=nsteps)
    t0 = time.perf_counter()
    (j1, g, _), grad = segmented_objective_and_gradient(
        prob, controls, pcof, tgt, order)
    gn = float(jnp.linalg.norm(grad))
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    (j1, g, _), grad = segmented_objective_and_gradient(
        prob, controls, pcof, tgt, order)
    _ = float(jnp.linalg.norm(grad))
    wall = time.perf_counter() - t0
    print(f"o{order} nsteps={nsteps}: grad wall {wall:.1f} s "
          f"(first incl compile {compile_and_run:.1f}) |g|={gn:.4e}",
          flush=True)
    for row in data["rows"]:
        if row["order"] == order and row["nsteps"] == nsteps:
            row["grad_wall_s"] = round(wall, 1)
json.dump(data, open(os.path.join(root, "results/cnot3_order_sweep.json"),
                     "w"), indent=1)
print("updated results/cnot3_order_sweep.json", flush=True)
