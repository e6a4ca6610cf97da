#!/usr/bin/env python
"""Time one flagship-config objective+gradient eval on the TPU
(VERDICT r2 item 4: round 2 paid ~40 s/eval at nsteps=30720 with carrier
controls; target <= 10 s).

Measures the exact program optimize_gate runs at the flagship operating
point: CNOT3, order 4, nsteps=30720, f32 schulz propagation, carrier
controls, segmented (auto) gradient.

Usage: python tools/probes/flagship_latency.py [nsteps] [--plain]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import dataclasses

import qgd_tpu

nsteps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
    else 30720
use_plain = "--plain" in sys.argv
use_prefix = "--prefix" in sys.argv
warm = next((int(a.split("=")[1]) for a in sys.argv
             if a.startswith("--warm=")), -1)
n_seg = next((int(a.split("=")[1]) for a in sys.argv
              if a.startswith("--segments=")), 0)

prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=nsteps)
prob = dataclasses.replace(prob, solver="schulz", dtype="float32",
                           schulz_warm_budget=warm)
controls = tuple(qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
                 for f in qgd_tpu.models.cnot3_carrier_frequencies())
tgt = qgd_tpu.models.cnot3_target()
rng = np.random.default_rng(1)
pcof = jnp.asarray(rng.uniform(-0.002, 0.002, 180))

if use_plain:
    from qgd_tpu.adjoint import objective_and_gradient as oag
    fn = lambda pc: oag(prob, controls, pc, tgt, 4)
elif use_prefix:
    from qgd_tpu.prefix import prefix_objective_and_gradient as poag
    fn = lambda pc: poag(prob, controls, pc, tgt, 4, n_segments=n_seg)
else:
    from qgd_tpu.segmented import segmented_objective_and_gradient as soag
    fn = lambda pc: soag(prob, controls, pc, tgt, 4)

route = "plain" if use_plain else ("prefix" if use_prefix else "segmented")
print(f"backend={jax.default_backend()} nsteps={nsteps} "
      f"route={route} warm={warm} n_seg={n_seg}", flush=True)
t0 = time.time()
out = fn(pcof)
jax.block_until_ready(out)
print(f"compile+first eval (block_until_ready): {time.time()-t0:.1f} s",
      flush=True)
t0 = time.time()
g0 = float(out[1][0])
print(f"first-eval result fetch blocked a further {time.time()-t0:.1f} s "
      f"(if large, block_until_ready does NOT synchronize on this "
      f"backend and only fetch-timed numbers are real)", flush=True)
reps = 3
t0 = time.time()
for _ in range(reps):
    out = fn(pcof)
    _sync = float(out[1][0])     # scalar fetch = true synchronization
per = (time.time() - t0) / reps
(j1, guard, _), grad = out
print(f"PER_EVAL {per:.2f} s   j1={float(j1):.6f} guard={float(guard):.4e} "
      f"|g|={float(jnp.linalg.norm(grad)):.3e}", flush=True)
