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

Usage:
  QGD_PALLAS=1 python tools/probes/probe_pallas.py tiny
  QGD_PALLAS=x python tools/probes/probe_pallas.py time [--nsteps 30720]
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
    prob = dataclasses.replace(prob, solver="schulz", dtype="float32")
    controls = tuple(
        qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
        for f in qgd_tpu.models.cnot3_carrier_frequencies())
    tgt = qgd_tpu.models.cnot3_target()
    rng = np.random.default_rng(1)
    pcof = jnp.asarray(rng.uniform(-0.002, 0.002,
                                   sum(c.N_coeff for c in controls)))
    return prob, controls, pcof, tgt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["tiny", "time"])
    ap.add_argument("--nsteps", type=int, default=30720)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from qgd_tpu.adjoint import discrete_adjoint

    pallas = os.environ.get("QGD_PALLAS", "0")
    nsteps = 256 if args.mode == "tiny" else args.nsteps
    prob, controls, pcof, tgt = build(nsteps)
    print(f"backend={jax.default_backend()} QGD_PALLAS={pallas} "
          f"nsteps={nsteps}", flush=True)

    t0 = time.time()
    grad = discrete_adjoint(prob, controls, pcof, tgt, order=4)
    g0 = float(jnp.linalg.norm(grad))        # fetch = the only real sync
    first = time.time() - t0
    print(f"first eval (incl compile): {first:.1f} s gradnorm={g0:.6e}",
          flush=True)
    if args.mode == "tiny":
        print("PALLAS_TINY_OK " + json.dumps(
            {"gradnorm": g0, "first_s": round(first, 1)}), flush=True)
        return

    walls = []
    for _ in range(args.reps):
        t0 = time.time()
        grad = discrete_adjoint(prob, controls, pcof, tgt, order=4)
        float(jnp.linalg.norm(grad))
        walls.append(time.time() - t0)
    rec = {"pallas": pallas, "nsteps": nsteps, "walls_s":
           [round(w, 2) for w in walls], "best_s": round(min(walls), 2),
           "gradnorm": g0}
    print("PALLAS_TIME " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
