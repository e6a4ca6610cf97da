"""Convergence / benchmark harness (reference src/Tests/test_convergence.jl).

``get_histories`` runs each method order at successively doubled step counts,
times the forward solves, and estimates the error of each refinement by
Richardson extrapolation against the next-finer one — the reference's
accuracy *and* speed metric (runtime to reach a target relative error,
src/Tests/test_convergence.jl:256-312).
"""

from __future__ import annotations

import json
import time
from collections import OrderedDict

import jax
import numpy as np


def richardson_extrap_sol(sol_h, sol_2h, order: int):
    """``(2^n A_h - A_2h) / (2^n - 1)`` (test_convergence.jl:238-244)."""
    f = 2.0 ** order
    return (f * sol_h - sol_2h) / (f - 1.0)


def richardson_extrap_rel_err(sol_h, sol_2h, order: int):
    """Relative error estimate of ``sol_h`` using the extrapolant as truth
    (test_convergence.jl:246-250)."""
    extrap = richardson_extrap_sol(sol_h, sol_2h, order)
    return float(np.linalg.norm(np.asarray(sol_h - extrap))
                 / np.linalg.norm(np.asarray(extrap)))


def get_histories(prob, controls, pcof, N_iterations: int, *, orders=(2, 4),
                  base_nsteps=None, nsteps_change_factor: int = 2,
                  min_error_limit: float = -np.inf,
                  max_error_limit: float = np.inf,
                  jld2_filename: str | None = None, verbose: bool = True,
                  with_diagnostics: bool = False):
    """Timed convergence sweep (reference ``get_histories``,
    test_convergence.jl:20-146).

    For each order, runs ``N_iterations`` forward solves with
    ``nsteps = base_nsteps * factor^(k-1)``, saving on the coarsest grid so
    all runs are comparable; records wall-clock and Richardson errors.
    Early-stops an order when the error drops below ``min_error_limit`` or
    stops decreasing (saturation at machine precision).

    Returns an OrderedDict ``{"Order k": {"histories": [...], "elapsed":
    [...], "nsteps": [...], "rel_errs": [...]}}``. If ``jld2_filename`` is
    given, results are incrementally dumped as JSON+npz (the reference's
    incremental JLD2 checkpoints, test_convergence.jl:76-121).
    ``with_diagnostics=True`` additionally records the stage-solve residual
    per run (``"stage_residual"`` entries — the analogue of the reference's
    per-solve GMRES iteration report, src/forward_evolution.jl:224-229).
    """
    from ..forward import eval_forward

    if base_nsteps is None:
        base_nsteps = prob.nsteps
    results = OrderedDict()
    for order in orders:
        key = f"Order {order}"
        entry = dict(histories=[], elapsed=[], nsteps=[], rel_errs=[])
        if with_diagnostics:
            entry["stage_residual"] = []
        results[key] = entry
        prev_final = None
        prev_err = np.inf
        for k in range(N_iterations):
            nsteps = base_nsteps * nsteps_change_factor ** k
            p = prob.with_nsteps(nsteps)
            save_every = nsteps_change_factor ** k
            # warm the jit cache so `elapsed` measures the solve, not XLA
            # compilation (the reference's @elapsed has no compile phase)
            jax.block_until_ready(
                eval_forward(p, controls, pcof, order, save_every=save_every))
            t0 = time.perf_counter()
            hist = eval_forward(p, controls, pcof, order,
                                save_every=save_every)
            hist = jax.block_until_ready(hist)
            elapsed = time.perf_counter() - t0
            hist = np.asarray(hist)
            entry["histories"].append(hist)
            entry["elapsed"].append(elapsed)
            entry["nsteps"].append(nsteps)
            if with_diagnostics:
                from ..diagnostics import stage_residuals

                entry["stage_residual"].append(
                    stage_residuals(p, controls, pcof, order))
            if prev_final is not None:
                rel_err = richardson_extrap_rel_err(hist[-1], prev_final, order)
                entry["rel_errs"].append(rel_err)
                if verbose:
                    print(f"[{key}] nsteps={nsteps} rel_err={rel_err:.3e} "
                          f"elapsed={elapsed:.3f}s")
                # early-stop logic (test_convergence.jl:124-137)
                if rel_err < min_error_limit:
                    break
                if rel_err > prev_err and rel_err < max_error_limit:
                    break
                prev_err = rel_err
            elif verbose:
                print(f"[{key}] nsteps={nsteps} elapsed={elapsed:.3f}s")
            prev_final = hist[-1]
        if jld2_filename is not None:
            _dump(results, jld2_filename)
    return results


def _dump(results, filename: str):
    meta = {k: {kk: v[kk] for kk in ("elapsed", "nsteps", "rel_errs")}
            for k, v in results.items()}
    with open(filename + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    arrays = {}
    for k, v in results.items():
        for i, h in enumerate(v["histories"]):
            arrays[f"{k}/history_{i}"] = h
    np.savez_compressed(filename + ".npz", **arrays)


def find_target_y(x1, y1, x2, y2, target_y):
    """Log-log interpolate the x at which y reaches ``target_y``
    (test_convergence.jl:283-299)."""
    lx1, ly1, lx2, ly2 = (np.log(v) for v in (x1, y1, x2, y2))
    lt = np.log(target_y)
    lx = lx1 + (lt - ly1) * (lx2 - lx1) / (ly2 - ly1)
    return float(np.exp(lx))


def get_runtime_ratios(results, results_reference, target_error: float = 1e-7,
                       extrapolate: bool = False):
    """Runtime-to-target-error ratios vs a reference sweep — the reference's
    speed metric vs Juqbox (test_convergence.jl:256-281). Both arguments are
    ``get_histories`` outputs; returns ``{order_key: ratio}``.

    Default semantics match the reference: the target must be bracketed by
    the sweep or ValueError is raised. ``extrapolate=True`` additionally
    allows extending a sweep's last log-log segment beyond its final point
    — useful when the baseline's cost to actually *reach* the target is
    prohibitive (e.g. an order-2 method needs ~sqrt(err1/err2) more steps
    per decade); such ratios are asymptotic estimates, not measurements,
    and callers should label them so.

    Fault tolerance is per-order on OUR side: an order whose sweep does not
    bracket (or, with ``extrapolate``, cannot extend to) the target maps to
    ``None`` instead of poisoning every other order's ratio. A baseline
    sweep that cannot reach the target still raises — there is no ratio
    without a denominator."""
    def runtime_to_target(entry):
        errs, times = entry["rel_errs"], entry["elapsed"][1:]
        for i in range(1, len(errs)):
            if errs[i] <= target_error <= errs[i - 1]:
                return find_target_y(times[i - 1], errs[i - 1], times[i],
                                     errs[i], target_error)
        if extrapolate and len(errs) >= 2 and errs[-1] > target_error:
            return find_target_y(times[-2], errs[-2], times[-1], errs[-1],
                                 target_error)
        raise ValueError("target error not bracketed by sweep")

    ref_key = next(iter(results_reference))
    ref_rt = runtime_to_target(results_reference[ref_key])
    out = {}
    for k, v in results.items():
        try:
            out[k] = runtime_to_target(v) / ref_rt
        except ValueError:
            out[k] = None
    return out
