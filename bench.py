"""Headline benchmark: Hermite timesteps/sec/chip (forward + adjoint) on the
CNOT3 configuration (BASELINE.md: the driver-defined primary metric).

Runs one jitted objective+gradient evaluation of the CNOT3 system
((4,4,4) qudits, 128-dim real-stacked state, 8 gate-basis columns, order-4
Hermite, B-spline controls), counts forward+adjoint timesteps, and prints
ONE JSON line.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
stand-in baseline is the reference's own hardware budget — a single CPU
core. We time the same workload on one host CPU core via the CPU backend
is not available in-process here, so the baseline constant below was
measured once with the pure-numpy step loop in this repo
(tools/baseline_cpu.py) on this machine: ~`BASELINE_STEPS_PER_SEC` CNOT3
order-4 forward+adjoint steps/sec single-core. vs_baseline = ours/that.
"""

import json
import time

import numpy as np


# Single-core CPU forward+adjoint steps/sec for CNOT3 order-4, measured with
# tools/baseline_cpu.py (numpy LU path, one core) on this container.
BASELINE_STEPS_PER_SEC = 987.7


def main():
    import jax
    import jax.numpy as jnp
    import qgd_tpu
    from qgd_tpu.adjoint import discrete_adjoint
    from qgd_tpu.objective import objective_value

    nsteps = 1000
    order = 4
    prob = qgd_tpu.models.cnot3_problem(nsteps=nsteps)
    controls = [qgd_tpu.BSpline2Control(10, float(prob.tf))
                for _ in range(3)]
    rng = np.random.default_rng(0)
    pcof = jnp.asarray(rng.standard_normal(60) * 0.01)
    rng2 = np.random.default_rng(1)
    tgt = jnp.asarray(
        rng2.standard_normal((64, 8)) + 1j * rng2.standard_normal((64, 8)))

    fn = jax.jit(lambda pc: (
        objective_value(prob, tuple(controls), pc, tgt, order),
        discrete_adjoint(prob, tuple(controls), pc, tgt, order)))

    # warmup/compile
    out = fn(pcof)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(pcof)
        jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / reps

    # forward (objective) + forward + backward (gradient) sweeps
    total_steps = 3 * nsteps
    steps_per_sec = total_steps / elapsed

    print(json.dumps({
        "metric": "cnot3_hermite_steps_per_sec_fwd_adj",
        "value": round(steps_per_sec, 1),
        "unit": "timesteps/sec/chip",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
