#!/usr/bin/env python
"""On-chip f32 (order x stepsize) walls for the CNOT3 sweep (VERDICT r4
#5: connect the bench throughput to the time-to-error table on the
hardware this framework targets).

For each sweep config: forward wall and objective+gradient wall on the
TPU, f32 production mode (solver=schulz, warm budget 0, segmented
route), fetch-synchronized timing (CLAUDE.md: block_until_ready is a
no-op on axon — only a scalar fetch syncs). The ERROR column of the
sweep stays CPU-f64 (results/cnot3_order_sweep.json): f32 propagation
floors at the documented ~2e-5 drift, so on-chip time-to-error pairs the
f64 error with the f32 wall at the same (order, nsteps) — the production
operating mode (f32 optimize, f64 verify).

Writes results/cnot3_order_sweep_tpu.json.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

import qgd_tpu
from qgd_tpu.segmented import segmented_objective_and_gradient
from qgd_tpu.forward import eval_forward

CONFIGS = [   # (order, nsteps, chunked) — the CPU sweep's grid.
    # nsteps >= ~1e5 f32 single-dispatch gradients exceed the ~300 s
    # worker watchdog (CLAUDE.md rule 8; the unchunked 307.2k gradient
    # CRASHED the worker when first probed) -> chunked dispatches.
    (4, 30_720, False), (4, 307_200, True),
    (6, 982, False), (6, 5_500, False),
    (8, 550, False), (8, 1_719, False),
    (10, 423, False), (10, 982, False),
]

root = os.path.join(os.path.dirname(__file__), "..", "..")
flag = np.load(os.path.join(root, "results/cnot3_r3_flagship.npz"))
h = json.load(open(os.path.join(root, "results/cnot3_r3_flagship.json")))
pcof = jnp.asarray(flag["pcof"][int(np.argmin(h["obj_value"]))])
tgt = qgd_tpu.models.cnot3_target()
controls = tuple(qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
                 for f in qgd_tpu.models.cnot3_carrier_frequencies())

print(f"backend={jax.default_backend()}", flush=True)
rows = []
for order, nsteps, chunked in CONFIGS:
    prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=nsteps)
    prob = dataclasses.replace(prob, solver="schulz", dtype="float32",
                               schulz_warm_budget=0)
    se = max(nsteps // 512, 1)
    while nsteps % se:
        se -= 1

    def fwd():
        hist = eval_forward(prob, controls, pcof, order, save_every=se)
        return float(hist[-1][0, 0])          # fetch = sync

    if chunked:
        from qgd_tpu.chunked import chunked_objective_and_gradient

        def grad():
            (j1, g, _), gr = chunked_objective_and_gradient(
                prob, controls, pcof, tgt, order,
                max_dispatch_steps=30_720)
            return float(j1), float(g), float(jnp.linalg.norm(gr))
    else:
        def grad():
            (j1, g, _), gr = segmented_objective_and_gradient(
                prob, controls, pcof, tgt, order)
            return float(j1), float(g), float(jnp.linalg.norm(gr))

    t0 = time.perf_counter(); fwd()
    fwd_cold = time.perf_counter() - t0
    t0 = time.perf_counter(); fwd()
    fwd_warm = time.perf_counter() - t0
    t0 = time.perf_counter(); j1, g, gn = grad()
    grad_cold = time.perf_counter() - t0
    t0 = time.perf_counter(); grad()
    grad_warm = time.perf_counter() - t0
    row = dict(order=order, nsteps=nsteps, dt=550.0 / nsteps,
               chunked=chunked,
               fwd_wall_s=round(fwd_warm, 3),
               grad_wall_s=round(grad_warm, 3),
               fwd_compile_s=round(fwd_cold, 1),
               grad_compile_s=round(grad_cold, 1),
               j1=j1, guard=g, grad_norm=gn)
    rows.append(row)
    print(json.dumps(row), flush=True)

out = os.path.join(root, "results/cnot3_order_sweep_tpu.json")
json.dump({"mode": "f32 schulz warm0 segmented, one v5e chip",
           "pcof_source": "cnot3_r3_flagship best iterate",
           "rows": rows}, open(out, "w"), indent=1)
print("wrote", out, flush=True)
