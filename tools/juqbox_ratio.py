#!/usr/bin/env python
"""Live Juqbox runtime-ratio artifact (VERDICT r2 missing #5 / next #9).

Runs the comparison the reference designed in ext/JuqboxHelpers.jl +
src/Tests/test_convergence.jl:256-312 — runtime to reach Richardson
relative error 1e-7 on the CNOT3 forward problem, our Hermite solver vs
the Juqbox-class order-2 Stormer-Verlet baseline
(qgd_tpu/models/juqbox_verlet.py; Juqbox.jl itself needs a Julia
toolchain this container does not have) — and writes
results/juqbox_ratio.json.

Both sides run single-process CPU f64 (set JAX_PLATFORMS=cpu), the same
machine-for-machine footing the reference's harness uses. The control
vector is the round-3 flagship's optimized pcof, i.e. the ratio is
measured at the benchmark's own operating point.

Usage: python tools/juqbox_ratio.py [--target 1e-7]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=float, default=1e-7)
    ap.add_argument("--orders", default="4,6")
    ap.add_argument("--verlet-base", type=int, default=65536)
    ap.add_argument("--verlet-iters", type=int, default=8)
    ap.add_argument("--hermite-base", type=int, default=1024)
    ap.add_argument("--hermite-iters", type=int, default=6)
    ap.add_argument("-o", "--out", default="results/juqbox_ratio.json")
    args = ap.parse_args()

    import numpy as np
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import qgd_tpu
    from qgd_tpu.models.juqbox_verlet import verlet_histories
    from qgd_tpu.utils.richardson import get_histories, get_runtime_ratios

    prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=1024)
    controls = tuple(
        qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
        for f in qgd_tpu.models.cnot3_carrier_frequencies())
    d = np.load(os.path.join(os.path.dirname(__file__), "..", "results",
                             "cnot3_r3_flagship.npz"))
    pcof = jnp.asarray(d["pcof"][-1])

    orders = tuple(int(o) for o in args.orders.split(","))
    print(f"Hermite sweep orders={orders} base={args.hermite_base}",
          flush=True)
    ours = get_histories(prob, controls, pcof, args.hermite_iters,
                         orders=orders, base_nsteps=args.hermite_base,
                         min_error_limit=args.target / 30.0)
    print(f"Verlet sweep base={args.verlet_base}", flush=True)
    verlet = verlet_histories(prob, controls, pcof, args.verlet_iters,
                              base_nsteps=args.verlet_base,
                              min_error_limit=args.target / 30.0)
    try:
        ratios = get_runtime_ratios(ours, verlet, target_error=args.target)
    except ValueError as e:
        ratios = {"error": str(e)}
    # The reference draws its target line at 1e-7; a NumPy Verlet sweep
    # actually REACHING 1e-7 on CNOT3 costs hours (order 2: ~sqrt(10) more
    # steps per error decade), so also record the asymptotic estimate from
    # each sweep's final log-log segment, labeled as such.
    try:
        ratios_1e7_extrap = get_runtime_ratios(ours, verlet,
                                               target_error=1e-7,
                                               extrapolate=True)
    except ValueError:
        ratios_1e7_extrap = None

    rec = {
        "target_error": args.target,
        "pcof_source": "results/cnot3_r3_flagship.npz (optimized)",
        "runtime_ratios_vs_verlet": ratios,
        "runtime_ratios_vs_verlet_1e-7_extrapolated": ratios_1e7_extrap,
        "hermite": {k: {kk: v[kk] for kk in ("elapsed", "nsteps",
                                             "rel_errs")}
                    for k, v in ours.items()},
        "verlet": {k: {kk: v[kk] for kk in ("elapsed", "nsteps",
                                            "rel_errs")}
                   for k, v in verlet.items()},
    }
    with open(os.path.join(os.path.dirname(__file__), "..", args.out),
              "w") as f:
        json.dump(rec, f, indent=1)
    print("JUQBOX_RATIO " + json.dumps(
        {"ratios": ratios, "target": args.target}), flush=True)


if __name__ == "__main__":
    main()
