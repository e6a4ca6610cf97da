"""Headline benchmark: Hermite timesteps/sec/chip (forward + adjoint) on the
CNOT3 configuration (BASELINE.md: the driver-defined primary metric).

Times the jitted objective + discrete-adjoint gradient of the CNOT3 system
((4,4,4) qudits, 128-dim real-stacked state, 8 gate-basis columns, order-4
Hermite, B-spline controls) for a batch of control-vector scenarios — the
production workload shape (multi-start optimization; the reference's
SLURM-array scale-out). Counted timesteps = nsteps x (1 objective-forward +
1 gradient-forward + 1 adjoint sweep) x scenarios.

TPU config: f32 propagation + f64 objective reduction (``dtype="float32"``;
the MXU has no native f64) with the Newton-Schulz stage solver. The f64
gradient-exactness gates (1e-14/1e-9) are enforced by the CPU test suite;
f32 propagation is the documented production trade for optimization runs,
with f64 available for final verification at ~8x the cost.

Robustness: the axon TPU remote-compile service in this container serializes
compiles and can be wedged for tens of minutes by orphaned jobs, so the
measurement runs in a subprocess with a per-attempt deadline and keeps
retrying (health-probe gated) until an overall budget expires
(QGD_BENCH_BUDGET_S, default 3 h — round 2 lost its TPU number to a
2x1500 s policy during a transient queue stall; the driver allows far
more). Only after the budget is exhausted does it fall back to the CPU
backend, loudly labeled via the metric suffix, so the driver always gets
its JSON line. Every attempt is logged to bench_debug.log (committed).

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
stand-in baseline is its hardware budget — a single CPU core — measured with
tools/baseline_cpu.py (same dense step loop, numpy/LAPACK, one thread) on
this machine.
"""

import json
import os
import subprocess
import sys
import time

# Single-core CPU forward+adjoint steps/sec for CNOT3 order-4, measured with
# tools/baseline_cpu.py (numpy LU path, one core) on this container.
BASELINE_STEPS_PER_SEC = 987.7

NSTEPS = 1000
ORDER = 4
# f32 propagation (production TPU mode: the MXU has no native f64; the
# objective still reduces in f64) batches 32 scenarios in HBM. Measured
# lever breakdown on the v5-lite chip (steps/s):
#   2026-08-18 (matmul precision "default" = single-pass bf16 — since
#   found NUMERICALLY INVALID: bf16 passes destabilize long horizons and
#   drift the objective by ~2e-2 even at 3k steps; kept for the record):
#     f64 schulz S=4  :  2,862   (round-1 config)
#     f32 schulz S=4  : 23,010
#     f32 schulz S=32 : 40,308
#   2026-08-19 (library default now precision="highest" for all dots,
#   objective correct to ~2e-5 of f64 at 30k steps):
#     f32 S=32, highest everywhere, universal-init schulz : 18,330
#     + Newton-Schulz construction at bf16 ("default") with
#       full-precision refinement polish                  : 24,425
#     + hoisted inverses warm-started from the drift-only
#       inverse (16 iters instead of the 56-iter ramp)    : 51,442 (52.1x)
#   2026-08-20 (round-4 sweep, tools/probes/bench_sweep.sh; stage
#   residual FLAT at 8.1e-8 across all three budgets — the refinement
#   sweeps set solve quality, so the smallest warm budget is free):
#     warm 16 (schulz_iters 56) : 53,273
#     warm 12 (schulz_iters 52) : 61,041
#     warm  8 (schulz_iters 48) : 69,911 (70.8x)  <- production config
#     scenarios=64: does not compile (12.6 GB hoisted stage tensors vs
#     16 GB HBM) — S=32 is the chip's batch ceiling for this program.
#   2026-08-21 (round-5 sweep; stage residual guard <= 1e-7 throughout):
#     plain S=32, warm budget 1               :  94,077
#     plain S=32, warm budget 0 + 3 refines   :  98,237
#     segmented route S=64, warm 1            :  89,659
#     segmented route S=128, warm 0 + 3 ref   : 100,208 (101.5x)
#     segmented route S=256, warm 0 + 3 ref   : 103,043 (104.3x) <- production
#     segmented route S=512, warm 0 + 3 ref   :  99,569 (past the sweet spot)
#   Per-step inverse construction is GONE at warm 0: every stage is solved
#   by refinement sweeps preconditioned with the single drift-only inverse
#   (contraction O(dt*amp) per sweep, measured 1.4e-2 at this dt; 3 sweeps
#   -> residual 9.9e-8). The segmented route hoists O(L)-per-segment stage
#   tensors, lifting the scenario ceiling from 32 (plain-route HBM cap) to
#   128+.
#   2026-08-21 later round-5 sweeps (same chip/server era, residual guard
#   9.9e-8 <= 1e-7 at every point):
#   (a) bf16 preconditioner-apply inside the refinement sweeps
#       (QGD_PRECOND_PRECISION=default; the residual matmul that pins the
#       fixed point stays "highest"): S=256 103,204 -> 107,449.
#   (b) SEGMENT LENGTH, the big lever (QGD_BENCH_SEGMENTS, S=256):
#         L=50: 105,329   L=20: 108,296   L=10: 121,131   L=5: 127,886
#         L=4 : 137,058   L=2 : 193,072   L=1 : 292,338 (296x) <- production
#       At L=1 the per-step stage matrices are built INSIDE the flat scan
#       step and fused with the solves (never staged through HBM as
#       (S,L,n,n) hoists), and the inner/outer scan nesting disappears;
#       backward stores only the (S,T,n,ic) boundary states (~1 GB).
#       Verified route-invariant: objective/grad equal to the plain path
#       to 3.5e-13 (CPU f64) and across L on-chip to f32 roundoff.
#       Scenario re-sweep at L=1: S=128 263,662; S=256 292,338;
#       S=512 243,004 — S=256 stays optimal. Precond attribution at L=1:
#       "highest" precond = 270,997, bf16 precond = 292,338 (+7.9%).
SCENARIOS = 256
SCHULZ_ITERS = 48
WARM_BUDGET = 0    # -1 = derived (schulz_warm_iters); 0 = drift-only mode
ROUTE = "segmented"
# 0 = the library's backend-aware auto rule (segmented._auto_segments):
# on TPU f32 it picks the smallest segment length whose boundary states
# fit QGD_SEG_STATE_BUDGET_GB — L=1 at this shape (the sweep's optimum;
# per-step builds fuse into the flat scan). The bench intentionally
# exercises the DEFAULT library path.
SEGMENTS = 0
REFINE_SWEEPS = 3  # QGD_REFINE_SWEEPS_F32 for warm 0 at dt=0.55 (see above)
WORK_DTYPE = "float32"
TPU_DEADLINE_S = 1500

# v5e (v5-lite) MXU peak, dense bf16 matmul. f32-precision dots at
# jax_default_matmul_precision="highest" cost ~6 bf16 passes on this MXU,
# so the achievable ceiling for the "highest"-precision fraction of the
# FLOPs is ~peak/6; mfu_vs_bf16_peak below deliberately uses the RAW bf16
# peak as denominator (the honest, hardware-absolute number).
V5E_BF16_PEAK_FLOPS = 197e12


def flops_model(order: int, n2: int, n_ic: int, schulz_warm_iters: int,
                refine_sweeps: int) -> float:
    """Algorithmic MXU FLOPs per Hermite timestep per scenario for the
    production path bench.py measures (hoisted stage builds + warm-started
    Newton-Schulz inverses + refined solves; forward + adjoint sweep).

    Counted terms, all per timestep (m = order/2, matmul = 2*n2^3 FLOPs,
    matvec batch = 2*n2^2*n_ic):

    * stage-matrix builds: the identity Leibniz recursion costs
      m(m+1)/2 matmuls; forward hoists the LHS, the adjoint sweep hoists
      RHS+LHS from one shared recursion -> 2 * m(m+1)/2 matmuls.
    * Newton-Schulz stage inverses: forward LHS + transposed LHS each run
      `schulz_warm_iters` iterations of 2 matmuls plus 1 guard-residual
      matmul -> 2 * (2*iters + 1) matmuls (at the pre-round-5 warm budget
      of 8 this was ~85% of all FLOPs; at the round-5 production budget 0
      only the guard matmuls remain — per-step inverse construction is
      deleted and the drift-preconditioned refinement sweeps below do the
      solving).
    * state-side matvec batches (derivative recursion on w, X@rhs solves,
      refinement sweeps, lambda sweep, cotangent transposes):
      ~ 4*m(m+1)/2 + 6 + 4*refine_sweeps matvecs — ~2% of the total at
      (n2, n_ic) = (128, 8); included for honesty, not significance.

    This is a transparent lower-bound model (weighted sums, table VJPs,
    reductions, and the segmented route's re-forward sweep are ignored);
    its purpose is making MFU regressions visible in BENCH records, not
    accounting exactness.
    """
    m = order // 2
    matmul = 2.0 * n2 ** 3
    matvec = 2.0 * n2 ** 2 * n_ic
    tri = m * (m + 1) // 2
    matmuls = 2 * tri + 2 * (2 * schulz_warm_iters + 1)
    matvecs = 4 * tri + 6 + 4 * refine_sweeps
    return matmuls * matmul + matvecs * matvec


def measure():
    """Worker: compile + time the benchmark on the current backend; prints
    an intermediate JSON line with the raw steps/sec."""
    # must precede the qgd_tpu import (linalg resolves it at import time)
    os.environ.setdefault("QGD_REFINE_SWEEPS_F32", str(REFINE_SWEEPS))

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import qgd_tpu
    from qgd_tpu.adjoint import objective_and_gradient

    backend = jax.default_backend()
    # Sweep knobs (VERDICT r3 #7): scenario batch and Newton-Schulz
    # iteration budget, overridable per worker run so the chosen defaults
    # are justified by measurement (tools/probes/bench_sweep.sh).
    scenarios = int(os.environ.get("QGD_BENCH_SCENARIOS", str(SCENARIOS)))
    if backend not in ("tpu", "axon"):
        scenarios = 1
    schulz_iters = int(os.environ.get("QGD_BENCH_SCHULZ_ITERS",
                                      str(SCHULZ_ITERS)))
    # Explicit warm-start Schulz budget (-1 = derived default). ``0`` is
    # the round-5 production config: NO per-step inverse construction —
    # stages solved by refinement sweeps preconditioned with the one
    # drift-only inverse (see problem.schulz_warm_budget).
    warm_budget = int(os.environ.get("QGD_BENCH_WARM_BUDGET",
                                     str(WARM_BUDGET)))

    prob = qgd_tpu.models.cnot3_problem(nsteps=NSTEPS)
    if backend in ("tpu", "axon"):
        # Scenario-vmapped programs must avoid getrf entirely (a batched
        # LU factorization wedges the axon remote compiler): use the
        # matmul-only Newton-Schulz stage solver (qgd_tpu/ops/linalg.py),
        # f32 propagation (f64 objective reduction), and tell the hoisting
        # cap about the scenario batch.
        prob = dataclasses.replace(prob, solver="schulz", dtype=WORK_DTYPE,
                                   schulz_iters=schulz_iters,
                                   schulz_warm_budget=warm_budget,
                                   hoist_batch_hint=scenarios)
    controls = tuple(qgd_tpu.BSpline2Control(10, float(prob.tf))
                     for _ in range(3))
    rng = np.random.default_rng(0)
    pcofs = jnp.asarray(rng.standard_normal((scenarios, 60)) * 0.01)
    # Keep the complex target as a HOST numpy array: complex128 device
    # transfers hang the axon TPU tunnel; the library realifies targets
    # host-side before they cross the jit boundary (objective.py).
    rng2 = np.random.default_rng(1)
    tgt = rng2.standard_normal((64, 8)) + 1j * rng2.standard_normal((64, 8))

    # Gradient route: "plain" hoists O(T) stage tensors (the round-4
    # production path; S=32 is its HBM ceiling at 16 GB); "segmented"
    # hoists O(L)-per-segment tensors (qgd_tpu/segmented.py), which is what
    # lifts the scenario ceiling past 32 (VERDICT r4 weak #3).
    # default route is backend-dependent: segmented pays a re-forward for
    # its O(L) hoists — a good trade on TPU (lifts the scenario ceiling),
    # pure cost on the single-scenario CPU fallback
    route = os.environ.get("QGD_BENCH_ROUTE",
                           ROUTE if backend in ("tpu", "axon") else "plain")
    # Default L=1 (n_segments = nsteps): stage builds fuse into the flat
    # propagation scan instead of staging (S, L, n, n) hoists through HBM
    # — the round-5 segment-length sweep's optimum (see table above).
    n_segments = int(os.environ.get("QGD_BENCH_SEGMENTS", str(SEGMENTS)))
    if route == "segmented":
        from qgd_tpu.segmented import segmented_objective_and_gradient

        def one(pc):
            (j1, guard, _), grad = segmented_objective_and_gradient(
                prob, controls, pc, tgt, ORDER, n_segments=n_segments)
            return j1 + guard, grad
    else:
        def one(pc):
            (j1, guard, _), grad = objective_and_gradient(
                prob, controls, pc, tgt, ORDER)
            return j1 + guard, grad

    fn = jax.jit(jax.vmap(one))

    # jax.block_until_ready is a NO-OP on the axon remote backend (measured
    # 2026-08-20: a first-eval result fetch blocked 254 s AFTER
    # block_until_ready returned, tools/probes/flagship_latency.py) — a
    # scalar result fetch is the only real synchronization, so every timed
    # repetition ends with one.
    out = fn(pcofs)
    _ = float(out[0][0])         # compile + warmup, fetch-synced

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(pcofs)
        _ = float(out[0][0])
    elapsed = (time.perf_counter() - t0) / reps

    # objective+gradient = forward sweep + adjoint sweep (+ accumulation)
    total_steps = 2 * NSTEPS * scenarios
    rec = {
        "_worker": True,
        "backend": backend,
        "scenarios": scenarios,
        "route": route,
        "schulz_iters": prob.schulz_iters,
        "schulz_warm_budget": prob.schulz_warm_budget,
        "steps_per_sec": total_steps / elapsed,
    }
    if backend in ("tpu", "axon"):
        # FLOP/MFU accounting (per TIMESTEP, not per counted fwd+adj step),
        # TPU-only: the model and the bf16-peak denominator describe the
        # TPU program — a CPU-fallback MFU would be meaningless. The warm
        # Schulz budget and f32 refine-sweep count come from the library
        # (qgd_tpu.ops.linalg) so the model can't silently diverge from the
        # measured program.
        from qgd_tpu.ops.linalg import REFINE_SWEEPS_F32, schulz_warm_iters

        warm = (prob.schulz_warm_budget if prob.schulz_warm_budget >= 0
                else schulz_warm_iters(prob.schulz_iters))
        per_step = flops_model(ORDER, prob.real_system_size,
                               prob.N_initial_conditions, warm,
                               REFINE_SWEEPS_F32)
        achieved = per_step * NSTEPS * scenarios / elapsed
        rec["model_tflops"] = round(achieved / 1e12, 2)
        rec["mfu_vs_bf16_peak"] = round(achieved / V5E_BF16_PEAK_FLOPS, 4)
        rec["refine_sweeps_f32"] = REFINE_SWEEPS_F32
        # the residual guard that justifies the Schulz budget: solve
        # quality at the benchmarked iteration count (state-aware probes)
        from qgd_tpu.diagnostics import stage_residuals

        rec["stage_residual_max"] = stage_residuals(
            prob, controls, np.asarray(pcofs[0]), ORDER)["max"]
    print(json.dumps(rec), flush=True)


def _log_debug(msg):
    """Worker failures are otherwise silent (the driver only reads the final
    JSON line); keep a post-mortem trail."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_debug.log"), "a") as f:
            f.write(f"[{time.strftime('%F %T')}] {msg}\n")
    except OSError:
        pass


def _run_worker(env_extra, timeout):
    env = dict(os.environ, **env_extra)
    try:
        res = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--worker"],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired as e:
        _log_debug(f"worker TIMEOUT after {timeout}s; stdout tail: "
                   f"{(e.stdout or b'')[-500:]} stderr tail: "
                   f"{(e.stderr or b'')[-500:]}")
        return None
    for line in res.stdout.splitlines():
        try:
            d = json.loads(line)
            if d.get("_worker"):
                return d
        except json.JSONDecodeError:
            continue
    _log_debug(f"worker rc={res.returncode} no JSON; stdout tail: "
               f"{res.stdout[-500:]!r} stderr tail: {res.stderr[-1500:]!r}")
    return None


def _tpu_tunnel_healthy(timeout=120) -> bool:
    """Quick probe: a tiny device round-trip on the default backend. The
    axon tunnel can die in a way where devices still enumerate but
    transfers hang forever."""
    code = ("import jax, jax.numpy as jnp, numpy as np;"
            "x = jnp.asarray(np.ones((4,4)));"
            "print('HEALTHY', float(np.asarray(x).sum()))")
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return False
    return "HEALTHY" in res.stdout


def main():
    result = None
    # plain-route sweeps need the raised hoist cap; the refine-sweep count
    # pairs with the warm-0 drift-preconditioned default (resolved at
    # qgd_tpu import inside the worker, so it must come through the env)
    hoist = {"QGD_HOIST_CAP_BYTES": "9000000000",
             "QGD_REFINE_SWEEPS_F32": os.environ.get(
                 "QGD_REFINE_SWEEPS_F32", str(REFINE_SWEEPS))}
    budget = float(os.environ.get("QGD_BENCH_BUDGET_S", "10800"))
    deadline = time.time() + budget
    attempt = 0
    while result is None and time.time() < deadline:
        attempt += 1
        if not _tpu_tunnel_healthy():
            _log_debug(f"attempt {attempt}: tunnel probe failed; "
                       f"{deadline - time.time():.0f}s of budget left")
            time.sleep(min(120, max(deadline - time.time(), 0)))
            continue
        _log_debug(f"attempt {attempt}: tunnel healthy, running TPU worker")
        remaining = deadline - time.time()
        result = _run_worker(hoist, max(min(TPU_DEADLINE_S, remaining), 60))
        if result is not None:
            _log_debug(f"attempt {attempt}: TPU worker OK "
                       f"({result['steps_per_sec']:.1f} steps/s)")
    suffix = ""
    if result is None:
        _log_debug(f"budget {budget:.0f}s exhausted after {attempt} "
                   "attempts; falling back to CPU (labeled)")
        # TPU compile service unavailable: measure on CPU so the driver
        # still gets a number (labeled).
        result = _run_worker(
            {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}, 1200)
        suffix = "_cpu_fallback"
    if result is None:
        print(json.dumps({
            "metric": "cnot3_hermite_steps_per_sec_fwd_adj_failed",
            "value": 0.0, "unit": "timesteps/sec/chip", "vs_baseline": 0.0}))
        return
    sps = result["steps_per_sec"]
    rec = {
        "metric": "cnot3_hermite_steps_per_sec_fwd_adj" + suffix,
        "value": round(sps, 1),
        "unit": "timesteps/sec/chip",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 3),
    }
    # FLOP model + MFU (flops_model docstring) — regression-visibility
    # extras; the worker emits them only on TPU backends (the model is the
    # TPU path's), so CPU-fallback records carry none of them.
    for k in ("model_tflops", "mfu_vs_bf16_peak", "stage_residual_max",
              "schulz_iters", "schulz_warm_budget", "refine_sweeps_f32",
              "scenarios", "route"):
        if k in result:
            rec[k] = result[k]
    print(json.dumps(rec))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        measure()
    else:
        main()
