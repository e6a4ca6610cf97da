#!/usr/bin/env python
"""On-chip Pallas measurement (VERDICT r2 weak #5).

QGD_PALLAS=1 routes the hoisted f32 stage-matrix build through the fused
Pallas kernel (qgd_tpu/ops/pallas_step.py, wired in forward.py
_stage_matrices). This probe measures it on the real chip:

  tiny   — nsteps=256 objective+gradient with the kernel enabled; proves
           the Pallas program COMPILES and runs through the axon tunnel
           (run this first: a failed Pallas compile can wedge the
           serialized compile queue for ~30-60 min, CLAUDE.md rule 4).
  time   — fetch-synced per-eval wall at a given nsteps with the current
           QGD_PALLAS setting; run once with QGD_PALLAS=0 and once with
           =1 (separate clients — the flag is read at trace time) and
           compare.

Routes (--route, for `time`):
  plain     — discrete_adjoint at --nsteps. NOTE: past the hoist memory cap
              (nsteps ~ 3000 at the default 1.5 GB) the hoisted stage build
              is disabled and the Pallas kernel NEVER RUNS — this route
              then measures the in-scan solver regardless of QGD_PALLAS.
  segmented — segmented_objective_and_gradient (the production long-horizon
              route; per-segment hoists are always small, so the Pallas
              branch is live at every horizon).
  bench     — the bench.py program shape: 32-scenario vmapped
              objective_and_gradient at nsteps=1000 with the hoist cap
              raised (set QGD_HOIST_CAP_BYTES=9000000000), fetch-synced.

Usage:
  QGD_PALLAS=1 python tools/probes/probe_pallas.py tiny
  QGD_PALLAS=x python tools/probes/probe_pallas.py time --route segmented
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build(nsteps):
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    import qgd_tpu

    prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=nsteps)
    prob = dataclasses.replace(
        prob, solver="schulz", dtype="float32",
        schulz_iters=int(os.environ.get("QGD_PROBE_SCHULZ_ITERS", "56")))
    controls = tuple(
        qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
        for f in qgd_tpu.models.cnot3_carrier_frequencies())
    tgt = qgd_tpu.models.cnot3_target()
    rng = np.random.default_rng(1)
    pcof = jnp.asarray(rng.uniform(-0.002, 0.002,
                                   sum(c.N_coeff for c in controls)))
    return prob, controls, pcof, tgt


def build_bench():
    """The bench.py program: 32-scenario vmapped objective+gradient,
    nsteps=1000, schulz/f32, hoisted stage build (needs
    QGD_HOIST_CAP_BYTES=9000000000 in the env)."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    import qgd_tpu
    from qgd_tpu.adjoint import objective_and_gradient

    scenarios = 32
    prob = qgd_tpu.models.cnot3_problem(nsteps=1000)
    prob = dataclasses.replace(prob, solver="schulz", dtype="float32",
                               hoist_batch_hint=scenarios)
    controls = tuple(qgd_tpu.BSpline2Control(10, float(prob.tf))
                     for _ in range(3))
    rng = np.random.default_rng(0)
    pcofs = jnp.asarray(rng.standard_normal((scenarios, 60)) * 0.01)
    rng2 = np.random.default_rng(1)
    tgt = rng2.standard_normal((64, 8)) + 1j * rng2.standard_normal((64, 8))

    def one(pc):
        (j1, guard, _), grad = objective_and_gradient(
            prob, controls, pc, tgt, 4)
        return j1 + guard, grad

    fn = jax.jit(jax.vmap(one))
    return fn, pcofs, 2 * 1000 * scenarios


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["tiny", "time"])
    ap.add_argument("--nsteps", type=int, default=30720)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--route", default="plain",
                    choices=["plain", "segmented", "bench"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from qgd_tpu.adjoint import discrete_adjoint
    from qgd_tpu.segmented import segmented_objective_and_gradient

    pallas = os.environ.get("QGD_PALLAS", "0")
    nsteps = 256 if args.mode == "tiny" else args.nsteps
    print(f"backend={jax.default_backend()} QGD_PALLAS={pallas} "
          f"route={args.route} nsteps={nsteps}", flush=True)

    if args.route == "bench" and args.mode == "time":
        fn, pcofs, steps = build_bench()

        def evaluate():
            out = fn(pcofs)
            return float(out[0][0])
    else:
        prob, controls, pcof, tgt = build(nsteps)
        if args.route == "segmented":
            def evaluate():
                (j1, guard, _), grad = segmented_objective_and_gradient(
                    prob, controls, pcof, tgt, 4)
                return float(jnp.linalg.norm(grad))
        else:
            def evaluate():
                grad = discrete_adjoint(prob, controls, pcof, tgt, order=4)
                return float(jnp.linalg.norm(grad))

    t0 = time.time()
    g0 = evaluate()                          # fetch = the only real sync
    first = time.time() - t0
    print(f"first eval (incl compile): {first:.1f} s val={g0:.6e}",
          flush=True)
    if args.mode == "tiny":
        print("PALLAS_TINY_OK " + json.dumps(
            {"gradnorm": g0, "first_s": round(first, 1)}), flush=True)
        return

    walls = []
    for _ in range(args.reps):
        t0 = time.time()
        g = evaluate()
        walls.append(time.time() - t0)
    rec = {"pallas": pallas, "route": args.route, "nsteps": nsteps,
           "walls_s": [round(w, 2) for w in walls],
           "best_s": round(min(walls), 2), "val": g0}
    if args.route == "bench":
        rec["steps_per_sec"] = round(steps / min(walls), 1)
    print("PALLAS_TIME " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
