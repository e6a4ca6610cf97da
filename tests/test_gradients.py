"""Gradient cross-validation — the reference's signature test
(test/GradientTests/compare_gradients.jl:23-252): discrete adjoint vs forced
(both exact for the discretized dynamics) to 1e-14, and both vs centered
finite differences to ~1e-9, across orders x control families x problems.
Deliberately uses coarse timesteps: gradient exactness holds regardless of
discretization error (compare_gradients.jl:9-14)."""

import numpy as np
import jax.numpy as jnp
import pytest

import qgd_tpu
from qgd_tpu import (
    discrete_adjoint,
    eval_grad_forced,
    eval_grad_finite_difference,
    construct_rabi_prob,
    construct_rand_prob,
    GRAPEControl,
    BSpline2Control,
    CarrierControl,
    total_control_parameters,
)


def _setups():
    rng = np.random.default_rng(42)
    tf_rabi = float(np.pi)
    rabi = construct_rabi_prob(nsteps=10)
    rand = construct_rand_prob(3, 2, tf=2.0, nsteps=10, seed=7)
    out = []
    for name, prob, ctrl_builder in [
        ("rabi_grape", rabi, lambda tf: [GRAPEControl(3, tf)]),
        ("rabi_bspline", rabi, lambda tf: [BSpline2Control(5, tf)]),
        ("rand_grape", rand, lambda tf: [GRAPEControl(2, tf),
                                         GRAPEControl(2, tf)]),
        ("rand_bspline_carrier", rand,
         lambda tf: [CarrierControl(BSpline2Control(4, tf), [0.7, 2.1]),
                     BSpline2Control(4, tf)]),
    ]:
        controls = ctrl_builder(float(prob.tf))
        n = total_control_parameters(controls)
        pcof = jnp.asarray(rng.standard_normal(n) * 0.3)
        # random unitary-ish target (real/imag parts of a random complex mat)
        n_lev = prob.N_tot_levels
        n_ic = prob.N_initial_conditions
        tgt = rng.standard_normal((n_lev, n_ic)) + 1j * rng.standard_normal(
            (n_lev, n_ic))
        out.append((name, prob, controls, pcof, jnp.asarray(tgt)))
    return out


SETUPS = _setups()


@pytest.mark.parametrize("order", [2, 4, 6, 8, 10, 12])
@pytest.mark.parametrize("case", [s[0] for s in SETUPS])
def test_adjoint_vs_forced_exact(case, order):
    name, prob, controls, pcof, target = next(s for s in SETUPS
                                              if s[0] == case)
    g_adj = np.asarray(discrete_adjoint(prob, controls, pcof, target, order))
    g_for = np.asarray(eval_grad_forced(prob, controls, pcof, target, order))
    scale = max(1.0, np.abs(g_adj).max())
    np.testing.assert_allclose(g_adj, g_for, rtol=1e-13, atol=1e-14 * scale)


@pytest.mark.parametrize("order", [2, 4, 6])
@pytest.mark.parametrize("case", [s[0] for s in SETUPS])
def test_adjoint_vs_finite_difference(case, order):
    """Reference-parity gate: atol/rtol 1e-9 like Julia's
    ``isapprox(...; atol=1e-9, rtol=1e-9)``
    (test/GradientTests/compare_gradients.jl:47-48)."""
    name, prob, controls, pcof, target = next(s for s in SETUPS
                                              if s[0] == case)
    g_adj = np.asarray(discrete_adjoint(prob, controls, pcof, target, order))
    g_fd = np.asarray(eval_grad_finite_difference(prob, controls, pcof,
                                                  target, order))
    np.testing.assert_allclose(g_adj, g_fd, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("order", [2, 4, 6])
def test_lagrange_structured_adjoint_matches_ad(order):
    """The hand-structured (terminal condition + backward lambda sweep +
    accumulation) route must reproduce the AD route to roundoff."""
    name, prob, controls, pcof, target = SETUPS[1]
    g_ad = np.asarray(discrete_adjoint(prob, controls, pcof, target, order,
                                       method="ad"))
    g_lg = np.asarray(discrete_adjoint(prob, controls, pcof, target, order,
                                       method="lagrange"))
    scale = max(1.0, np.abs(g_ad).max())
    np.testing.assert_allclose(g_ad, g_lg, rtol=1e-12, atol=1e-13 * scale)


@pytest.mark.parametrize("cost_type", ["Tracking", "Norm"])
def test_other_cost_types(cost_type):
    name, prob, controls, pcof, target = SETUPS[0]
    g_adj = np.asarray(discrete_adjoint(prob, controls, pcof, target, 4,
                                        cost_type=cost_type))
    g_for = np.asarray(eval_grad_forced(prob, controls, pcof, target, 4,
                                        cost_type=cost_type))
    scale = max(1.0, np.abs(g_adj).max())
    np.testing.assert_allclose(g_adj, g_for, rtol=1e-13, atol=1e-14 * scale)


def test_hessian_symmetric_and_matches_fd():
    name, prob, controls, pcof, target = SETUPS[0]
    H_ad = np.asarray(qgd_tpu.eval_hessian(prob, controls, pcof, target, 2))
    np.testing.assert_allclose(H_ad, H_ad.T, atol=1e-12)
    H_fd = np.asarray(qgd_tpu.eval_hessian(prob, controls, pcof, target, 2,
                                           method="fd"))
    np.testing.assert_allclose(H_ad, H_fd, rtol=1e-4, atol=1e-5)
