"""Headline benchmark: Hermite timesteps/sec/chip (forward + adjoint) on the
CNOT3 configuration (BASELINE.md: the driver-defined primary metric).

Times the jitted objective + discrete-adjoint gradient of the CNOT3 system
((4,4,4) qudits, 128-dim real-stacked state, 8 gate-basis columns, order-4
Hermite, B-spline controls) for a *batch of control-vector scenarios* — the
production workload shape (multi-start optimization; the reference's
SLURM-array scale-out, BASELINE.md configs list 256-scenario runs). Counted
timesteps = nsteps x (1 objective-forward + 1 gradient-forward + 1 adjoint
sweep) x scenarios.

Gradient route: the hand-structured Lagrange discrete adjoint
(forward-executed scans only — the axon TPU remote compiler cannot compile
transposed/reverse scans; see qgd_tpu/adjoint.py).

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
stand-in baseline is its hardware budget — a single CPU core — measured with
tools/baseline_cpu.py (same dense step loop, numpy/LAPACK, one thread) on
this machine: BASELINE_STEPS_PER_SEC forward+adjoint steps/sec.
"""

import json
import time

import numpy as np

# Single-core CPU forward+adjoint steps/sec for CNOT3 order-4, measured with
# tools/baseline_cpu.py (numpy LU path, one core) on this container.
BASELINE_STEPS_PER_SEC = 987.7

NSTEPS = 1000
ORDER = 4
SCENARIOS = 16


def main():
    import jax
    import jax.numpy as jnp
    import qgd_tpu
    from qgd_tpu.adjoint import discrete_adjoint
    from qgd_tpu.objective import objective_parts

    prob = qgd_tpu.models.cnot3_problem(nsteps=NSTEPS)
    controls = tuple(qgd_tpu.BSpline2Control(10, float(prob.tf))
                     for _ in range(3))
    rng = np.random.default_rng(0)
    pcofs = jnp.asarray(rng.standard_normal((SCENARIOS, 60)) * 0.01)
    rng2 = np.random.default_rng(1)
    tgt = jnp.asarray(
        rng2.standard_normal((64, 8)) + 1j * rng2.standard_normal((64, 8)))

    method = ("lagrange" if jax.default_backend() in ("tpu", "axon")
              else "ad")

    def one(pc):
        j1, guard, _ = objective_parts(prob, controls, pc, tgt, ORDER)
        grad = discrete_adjoint(prob, controls, pc, tgt, ORDER,
                                method=method)
        return j1 + guard, grad

    fn = jax.jit(jax.vmap(one))

    out = fn(pcofs)
    jax.block_until_ready(out)   # compile + warmup

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(pcofs)
        jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / reps

    total_steps = 3 * NSTEPS * SCENARIOS
    steps_per_sec = total_steps / elapsed

    print(json.dumps({
        "metric": "cnot3_hermite_steps_per_sec_fwd_adj",
        "value": round(steps_per_sec, 1),
        "unit": "timesteps/sec/chip",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
