"""Host-chunked long-horizon gradient (qgd_tpu/chunked.py) must reproduce
the single-dispatch paths exactly (up to summation reordering of the final
pcof reduction): it is the mitigation for the axon TPU's ~300 s
per-execution watchdog (CLAUDE.md rule 8), so its correctness gate is
equality with the plain Lagrange adjoint — the same arithmetic the
reference holds in RAM (src/eval_grad_discrete_adjoint.jl:94-96)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import qgd_tpu
from qgd_tpu import (
    construct_rand_prob,
    BSpline2Control,
    GRAPEControl,
    CarrierControl,
    total_control_parameters,
)
from qgd_tpu.adjoint import objective_and_gradient
from qgd_tpu.segmented import segmented_objective_and_gradient
from qgd_tpu.chunked import chunked_objective_and_gradient, _chunk_divisor


def _case(nsteps, guarded=True):
    rng = np.random.default_rng(11)
    if guarded:
        prob = qgd_tpu.models.cnot3_problem(nsteps=nsteps)
        controls = tuple(BSpline2Control(4, float(prob.tf)) for _ in range(3))
    else:
        prob = construct_rand_prob(3, 2, tf=2.0, nsteps=nsteps, seed=3)
        controls = (CarrierControl(BSpline2Control(4, float(prob.tf)),
                                   [0.7, 2.1]),
                    GRAPEControl(2, float(prob.tf)))
    n = total_control_parameters(controls)
    pcof = jnp.asarray(rng.standard_normal(n) * 0.05)
    n_lev, n_ic = prob.N_tot_levels, prob.N_initial_conditions
    tgt = rng.standard_normal((n_lev, n_ic)) + 1j * rng.standard_normal(
        (n_lev, n_ic))
    return prob, controls, pcof, tgt


def test_chunk_divisor():
    assert _chunk_divisor(12, 8, 0) == 12          # no cap -> one chunk
    assert _chunk_divisor(12, 8, 40) == 4          # 4*8=32 <= 40 < 6*8
    assert _chunk_divisor(12, 8, 8) == 1
    assert _chunk_divisor(12, 8, 7) == 1           # floor at 1 segment
    assert _chunk_divisor(7, 10, 30) == 1          # prime S


@pytest.mark.parametrize("order", [2, 4])
def test_chunked_matches_plain(order):
    """Guarded CNOT3 shape: multiple dispatches == one program, to
    summation roundoff (f64)."""
    prob, controls, pcof, tgt = _case(48)
    (j1_p, g_p, r_p), grad_p = objective_and_gradient(
        prob, controls, pcof, tgt, order, ridge_penalty_strength=1e-2)
    (j1_s, g_s, r_s), grad_s = segmented_objective_and_gradient(
        prob, controls, pcof, tgt, order, ridge_penalty_strength=1e-2,
        n_segments=12)
    walls = []
    (j1_c, g_c, r_c), grad_c = chunked_objective_and_gradient(
        prob, controls, pcof, tgt, order, ridge_penalty_strength=1e-2,
        n_segments=12, segments_per_chunk=3,
        progress=lambda ph, k, n, w: walls.append((ph, k)))
    # Same segment count -> same per-segment arithmetic; only the final
    # pcof reduction is reordered across chunks.
    assert np.isclose(float(j1_c), float(j1_s), rtol=1e-13, atol=1e-15)
    assert np.isclose(float(g_c), float(g_s), rtol=1e-12, atol=1e-16)
    assert np.isclose(float(r_c), float(r_s), rtol=1e-13)
    scale = max(1.0, np.abs(grad_s).max())
    np.testing.assert_allclose(np.asarray(grad_c), np.asarray(grad_s),
                               rtol=1e-12, atol=1e-13 * scale)
    # Plain path is a different program shape (XLA fusion reorders the
    # per-step reductions) -> slightly looser gate, same as segmented's.
    assert np.isclose(float(j1_c), float(j1_p), rtol=2e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(grad_c), np.asarray(grad_p),
                               rtol=5e-12, atol=1e-13 * scale)
    # 4 forward + 1 terminal + 4 backward dispatches
    assert [p for p, _ in walls].count("fwd") == 4
    assert [p for p, _ in walls].count("bwd") == 4
    assert ("terminal", 0) in walls


def test_chunked_matches_segmented_schulz():
    """Newton-Schulz production solver (the TPU path), unguarded random
    problem with carrier controls; chunk sizing via max_dispatch_steps."""
    prob, controls, pcof, tgt = _case(64, guarded=False)
    prob = dataclasses.replace(prob, solver="schulz")
    (j1_s, g_s, r_s), grad_s = segmented_objective_and_gradient(
        prob, controls, pcof, tgt, 4, n_segments=8)
    (j1_c, g_c, r_c), grad_c = chunked_objective_and_gradient(
        prob, controls, pcof, tgt, 4, n_segments=8, max_dispatch_steps=17)
    # 17-step cap with L=8 -> 2 segments (16 steps) per chunk, 4 chunks
    assert np.isclose(float(j1_c), float(j1_s), rtol=1e-12, atol=1e-15)
    assert np.isclose(float(g_c), float(g_s), rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(np.asarray(grad_c), np.asarray(grad_s),
                               rtol=5e-11, atol=1e-13)


def test_chunked_single_chunk_is_segmented():
    """max_dispatch_steps=0 (no cap): one forward + one backward dispatch,
    numbers equal to the segmented path."""
    prob, controls, pcof, tgt = _case(32)
    (j1_s, g_s, _), grad_s = segmented_objective_and_gradient(
        prob, controls, pcof, tgt, 4, n_segments=8)
    walls = []
    (j1_c, g_c, _), grad_c = chunked_objective_and_gradient(
        prob, controls, pcof, tgt, 4, n_segments=8,
        progress=lambda ph, k, n, w: walls.append(ph))
    assert walls.count("fwd") == 1 and walls.count("bwd") == 1
    assert np.isclose(float(j1_c), float(j1_s), rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(grad_c), np.asarray(grad_s),
                               rtol=5e-12, atol=1e-14)


def test_optimize_gate_chunked_end_to_end(tmp_path):
    """optimize_gate(max_dispatch_steps=...) — the user-facing long-horizon
    route (optimize.py value_parts_and_grad chunked branch) — must walk the
    same optimization trajectory as the plain path, and the saved setup must
    carry the chunked routing into resume_optimization (a resume that
    silently dropped max_dispatch_steps would re-enter the single-dispatch
    >300 s watchdog configuration the flag exists to avoid)."""
    prob, controls, pcof, tgt = _case(48)
    kw = dict(order=2, maxIter=3, ridge_penalty_strength=1e-2,
              print_level=0, max_cpu_time=600.0)
    h_plain = qgd_tpu.optimize_gate(prob, controls, pcof, tgt, **kw)
    base = str(tmp_path / "chunked_run")
    h_chunk = qgd_tpu.optimize_gate(
        prob, controls, pcof, tgt, n_segments=12, max_dispatch_steps=24,
        filename=base, **kw)  # L=4, cap 24 -> 6 segments/chunk, 2 chunks
    n = min(len(h_plain.obj_value), len(h_chunk.obj_value))
    assert n >= 2
    np.testing.assert_allclose(h_chunk.obj_value[:n], h_plain.obj_value[:n],
                               rtol=1e-9)
    np.testing.assert_allclose(h_chunk.infidelity[:n], h_plain.infidelity[:n],
                               rtol=1e-8, atol=1e-14)

    # the persisted setup must round-trip the routing flags (ADVICE r3)
    from qgd_tpu.checkpoint import load_setup, resume_optimization
    setup = load_setup(base)
    assert setup["max_dispatch_steps"] == 24
    assert setup["n_segments"] == 12
    h_res = resume_optimization(base, maxIter=2, print_level=0)
    assert len(h_res.obj_value) > n  # appended to the loaded history


def test_optimize_gate_chunked_rejects_lbfgs_method():
    """method='lbfgs' + max_dispatch_steps must fail fast with a clear
    message (ADVICE r3): optax's zoom linesearch traces value_fn inside a
    lax.while_loop, so the host chunk loop cannot serve it — without the
    guard a long TPU run would die mid-optimization with
    ConcretizationTypeError the first time the linesearch probes."""
    prob, controls, pcof, tgt = _case(32)
    with pytest.raises(ValueError, match="lbfgsb"):
        qgd_tpu.optimize_gate(
            prob, controls, pcof, tgt, order=2, maxIter=2, method="lbfgs",
            n_segments=8, max_dispatch_steps=16, print_level=0)


def test_chunked_sharded_matches_single():
    """mesh= : every chunk dispatch under shard_map with ic columns split
    over the mesh; values equal the single-device chunked path to
    summation roundoff (VERDICT r4 #7)."""
    from qgd_tpu.parallel import make_mesh

    prob, controls, pcof, tgt = _case(48)
    (j1_1, g_1, r_1), grad_1 = chunked_objective_and_gradient(
        prob, controls, pcof, tgt, 4, n_segments=6, segments_per_chunk=3,
        ridge_penalty_strength=1e-2)
    mesh = make_mesh(1, 4)
    (j1_m, g_m, r_m), grad_m = chunked_objective_and_gradient(
        prob, controls, pcof, tgt, 4, n_segments=6, segments_per_chunk=3,
        ridge_penalty_strength=1e-2, mesh=mesh)
    assert abs(j1_m - j1_1) < 1e-13
    assert abs(g_m - g_1) < 1e-13
    np.testing.assert_allclose(np.asarray(grad_m), np.asarray(grad_1),
                               rtol=1e-11, atol=1e-13)
