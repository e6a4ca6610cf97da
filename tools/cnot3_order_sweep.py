#!/usr/bin/env python
"""CNOT3 (order x stepsize) sweep — the reference's headline experiment
(examples/cnot3_optimize_gate.sb:28-41: order 2 at dt 1e-2/1e-4 vs orders
4-10 at coarse dt), measured as forward time-to-error plus one gradient
timing per config (VERDICT r3 missing #5 / next #6).

All error-measuring runs are f64 (f32 floors at ~2e-5 model error, far
above the high-order configs' discretization error) with the Newton-Schulz
stage solver (TPU has no f64 LU). Error = relative final-state deviation
from an order-10 nsteps=4096 f64 truth (its own discretization error is
~1e-13-class, orders below every sweep point).

Long horizons run as host-chunked dispatches (CLAUDE.md rule 8: the axon
TPU kills any single execution past ~300 s): forward via chunked._fwd_chunk
chunks, gradient via chunked_objective_and_gradient. Every timed phase ends
with a scalar fetch (block_until_ready is a no-op on axon).

Writes results/cnot3_order_sweep.json.

Usage: python -u tools/cnot3_order_sweep.py [--quick]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (order, nsteps, gradient?) — dt = 550/nsteps; nsteps rounded to
# divisor-rich values within <1% of the reference's stepsizes so the
# chunk arithmetic divides evenly.
CONFIGS = [
    (2, 55_000, True),        # dt 1e-2 (reference o2 coarse)
    (2, 5_500_000, False),    # dt 1e-4 (reference o2 fine; fwd-only — the
                              #   gradient at this point is the round-3
                              #   26.2-min chunked record, f32)
    (4, 30_720, True),        # dt ~1.8e-2 (flagship nsteps)
    (4, 307_200, True),       # dt ~1.8e-3
    (6, 982, True),           # dt ~5.6e-1
    (6, 5_500, True),         # dt 1e-1
    (8, 550, True),           # dt 1e0
    (8, 1_719, True),         # dt ~3.2e-1
    (10, 423, True),          # dt ~1.3
    (10, 982, True),          # dt ~5.6e-1
]
FWD_DISPATCH_CAP = 25_000     # steps per forward device execution (f64)
GRAD_DISPATCH_CAP = 12_500    # steps per gradient device execution (f64)


def build(nsteps):
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    import qgd_tpu

    prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=nsteps)
    prob = dataclasses.replace(prob, solver="schulz", dtype="float64")
    controls = tuple(
        qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
        for f in qgd_tpu.models.cnot3_carrier_frequencies())
    d = np.load(os.path.join(os.path.dirname(__file__), "..", "results",
                             "cnot3_r3_flagship.npz"))
    pcof = jnp.asarray(d["pcof"][-1], dtype=jnp.float64)
    return prob, controls, pcof


def forward_final(prob, controls, pcof, order, cap):
    """Final state, host-chunked so no dispatch exceeds ``cap`` steps.
    Returns (w_final ndarray, wall_seconds, n_dispatches)."""
    import numpy as np
    import jax.numpy as jnp
    from qgd_tpu.forward import eval_forward
    from qgd_tpu.problem import working_problem
    from qgd_tpu.chunked import _fwd_chunk

    T = prob.nsteps
    if T <= cap:
        t0 = time.perf_counter()
        hist = eval_forward(prob, controls, pcof, order, save_every=T)
        w = np.asarray(hist[-1])             # fetch = sync
        return w, time.perf_counter() - t0, 1
    # chunk length: largest divisor of T that is <= cap
    L = max(d for d in range(1, cap + 1) if T % d == 0)
    C = T // L
    dt = prob.tf / T
    tau = np.ones(T, dtype=np.float64)
    tau[0] = 0.5
    w = working_problem(prob).w0
    t0 = time.perf_counter()
    for k in range(C):
        a, b = k * L, (k + 1) * L
        ts_chunk = jnp.arange(a, b + 1, dtype=jnp.float64) * dt
        w, _snaps, gp = _fwd_chunk(prob, controls, pcof, w, ts_chunk,
                                   jnp.asarray(tau[a:b]), order, 1, L)
        float(gp)                            # fetch paces the watchdog
    w = np.asarray(w)
    return w, time.perf_counter() - t0, C


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the 5.5M-step config")
    ap.add_argument("-o", "--out", default="results/cnot3_order_sweep.json")
    args = ap.parse_args()

    import numpy as np
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    from qgd_tpu.chunked import chunked_objective_and_gradient

    # truth: order-10 f64 at nsteps=4096 (discretization error ~1e-13)
    tprob, controls, pcof = build(4096)
    truth, t_truth, _ = forward_final(tprob, controls, pcof, 10,
                                      FWD_DISPATCH_CAP)
    tnorm = float(np.linalg.norm(truth))
    print(f"truth (o10 n4096 f64): {t_truth:.1f} s norm={tnorm:.6f}",
          flush=True)

    rows = []
    for order, nsteps, do_grad in CONFIGS:
        if args.quick and nsteps > 1_000_000:
            continue
        prob, controls, pcof = build(nsteps)
        # warm the compile caches with an identical-shape run, so the
        # recorded wall is execution, not XLA compilation (the reference's
        # @elapsed has no compile phase)
        forward_final(prob, controls, pcof, order, FWD_DISPATCH_CAP)
        w, wall, ndisp = forward_final(prob, controls, pcof, order,
                                       FWD_DISPATCH_CAP)
        err = float(np.linalg.norm(w - truth)) / tnorm
        row = {"order": order, "nsteps": nsteps,
               "dt": 550.0 / nsteps, "fwd_wall_s": round(wall, 3),
               "fwd_dispatches": ndisp, "rel_err": err}
        if do_grad:
            import qgd_tpu

            tgt = qgd_tpu.models.cnot3_target()
            cap = min(GRAD_DISPATCH_CAP, nsteps)
            # warm: all chunk programs compile on the first evaluation
            chunked_objective_and_gradient(prob, controls, pcof, tgt,
                                           order, max_dispatch_steps=cap)
            t0 = time.perf_counter()
            (j1, guard, _), grad = chunked_objective_and_gradient(
                prob, controls, pcof, tgt, order, max_dispatch_steps=cap)
            gn = float(np.linalg.norm(grad))
            row["grad_wall_s"] = round(time.perf_counter() - t0, 3)
            row["gradnorm"] = gn
            row["infidelity"] = float(j1)
        rows.append(row)
        print("SWEEP_ROW " + json.dumps(row), flush=True)

    rec = {"truth": "order 10, nsteps=4096, f64 (schulz)",
           "pcof_source": "results/cnot3_r3_flagship.npz (optimized)",
           "note": "f64 error-resolving sweep; production f32 runs the "
                   "same programs ~8x faster (see BENCH/FLAGSHIP)",
           "rows": rows}
    with open(os.path.join(os.path.dirname(__file__), "..", args.out),
              "w") as f:
        json.dump(rec, f, indent=1)
    print("ORDER_SWEEP_DONE", flush=True)


if __name__ == "__main__":
    main()
