"""Unit tests of the Hermite Taylor-derivative core against hand-derived
matrix oracles — the strategy of the reference's
test/hardcoded_derivatives.jl:33-216: build explicit matrices ``A``, ``dA/dt``
etc. for a tiny system and check the recursion against non-recursive
formulas like ``w'' = (A' A + A^2) w / 2!`` ... to 1e-14."""

import numpy as np
import jax.numpy as jnp
import pytest

import qgd_tpu
from qgd_tpu import (
    hermite_coefficient,
    assemble_generator_stack,
    scaled_derivatives,
    adjoint_scaled_derivatives,
    build_rhs,
    build_lhs,
    taylor_expand,
    SinCosControl,
)
from qgd_tpu.controls import control_tables_at
from qgd_tpu.models.builders import construct_rabi_prob
from qgd_tpu.problem import schrodinger_problem


def _toy_problem():
    """2-level system with drift and one sin/cos control."""
    K = np.array([[1.0, 0.5], [0.5, -0.3]])
    S = np.array([[0.0, 0.7], [-0.7, 0.0]])
    sym_op = np.array([[0.0, 1.0], [1.0, 0.0]])
    asym_op = np.array([[0.0, 1.0], [-1.0, 0.0]])
    u0 = np.array([[1.0], [0.0]])
    v0 = np.array([[0.0], [0.0]])
    prob = schrodinger_problem(K, S, [sym_op], [asym_op], u0, v0,
                               tf=1.0, nsteps=10, N_ess_levels=2)
    control = SinCosControl(1.0, frequency=1.7)
    pcof = np.array([0.8, -0.3])
    return prob, control, pcof, (K, S, sym_op, asym_op)


def _A_of_t(prob, control, pcof, t, deriv=0):
    """Dense A^{(deriv)}(t) built independently from closed forms."""
    K0 = np.asarray(prob.system_sym)
    S0 = np.asarray(prob.system_asym)
    sym = np.asarray(prob.sym_operators[0])
    asym = np.asarray(prob.asym_operators[0])
    w = control.frequency
    a_p, a_q = pcof
    # p = a_p sin(wt): p^(k) = a_p w^k sin(wt + k pi/2)
    p_k = a_p * w ** deriv * np.sin(w * t + deriv * np.pi / 2)
    q_k = a_q * w ** deriv * np.cos(w * t + deriv * np.pi / 2)
    K = p_k * sym + (K0 if deriv == 0 else 0.0 * K0)
    S = q_k * asym + (S0 if deriv == 0 else 0.0 * S0)
    return np.block([[S, K], [-K, S]])


def test_coefficients():
    # c_jm = m!(2m-j)!/((2m)!(m-j)!)  (src/hermite.jl:389-391)
    assert hermite_coefficient(0, 1, 1) == 1.0
    assert hermite_coefficient(1, 1, 1) == 0.5
    assert hermite_coefficient(0, 2, 2) == 1.0
    assert hermite_coefficient(1, 2, 2) == 0.5
    import math
    assert hermite_coefficient(2, 2, 2) == pytest.approx(
        2 * math.factorial(2) / math.factorial(4))


def test_generator_assembly_matches_oracle():
    prob, control, pcof, _ = _toy_problem()
    t = 0.37
    m = 4
    p_vals, q_vals = control_tables_at((control,), jnp.asarray(pcof), t, m)
    A_stack = np.asarray(assemble_generator_stack(prob, p_vals, q_vals, m))
    import math
    for k in range(m):
        oracle = _A_of_t(prob, control, pcof, t, deriv=k) / math.factorial(k)
        np.testing.assert_allclose(A_stack[k], oracle, atol=1e-14)


def test_derivative_recursion_against_matrix_formulas():
    """w' = Aw; w''/2 = (A' + A^2) w / 2; w'''/6 = (A'' + 2 A'A + AA' + A^3) w/6
    etc. — built here by symbolic Leibniz expansion over matrix products."""
    prob, control, pcof, _ = _toy_problem()
    t = 0.29
    m = 3
    p_vals, q_vals = control_tables_at((control,), jnp.asarray(pcof), t, m)
    A_stack = assemble_generator_stack(prob, p_vals, q_vals, m)
    w0 = np.array([[0.3], [0.1], [-0.5], [0.9]])
    Ws = np.asarray(scaled_derivatives(A_stack, jnp.asarray(w0), m))

    A = _A_of_t(prob, control, pcof, t, 0)
    Ap = _A_of_t(prob, control, pcof, t, 1)
    App = _A_of_t(prob, control, pcof, t, 2)

    w1 = A @ w0
    w2 = (Ap + A @ A) @ w0                       # w''
    w3 = (App + 2 * Ap @ A + A @ Ap + A @ A @ A) @ w0  # w'''

    np.testing.assert_allclose(Ws[0], w0, atol=1e-14)
    np.testing.assert_allclose(Ws[1], w1, atol=1e-13)
    np.testing.assert_allclose(Ws[2], w2 / 2.0, atol=1e-13)
    np.testing.assert_allclose(Ws[3], w3 / 6.0, atol=1e-12)


def test_adjoint_recursion_is_transposed_recursion():
    """The adjoint recursion equals the plain recursion run with A^T
    (reference compute_adjoint_derivatives!, src/hermite.jl:225-305)."""
    prob, control, pcof, _ = _toy_problem()
    t = 0.12
    m = 3
    p_vals, q_vals = control_tables_at((control,), jnp.asarray(pcof), t, m)
    A_stack = assemble_generator_stack(prob, p_vals, q_vals, m)
    lam0 = np.random.default_rng(0).standard_normal((4, 2))
    La = np.asarray(adjoint_scaled_derivatives(A_stack, jnp.asarray(lam0), m))
    AT_stack = jnp.swapaxes(A_stack, -1, -2)
    Lb = np.asarray(scaled_derivatives(AT_stack, jnp.asarray(lam0), m))
    np.testing.assert_allclose(La, Lb, atol=1e-14)


def test_rhs_lhs_taylor():
    rng = np.random.default_rng(1)
    m = 2
    Ws = jnp.asarray(rng.standard_normal((m + 1, 4, 1)))
    dt = 0.01
    c = [hermite_coefficient(j, m, m) for j in range(m + 1)]
    rhs_expect = sum(c[j] * dt ** j * np.asarray(Ws[j]) for j in range(m + 1))
    lhs_expect = sum(c[j] * (-dt) ** j * np.asarray(Ws[j]) for j in range(m + 1))
    taylor_expect = sum(dt ** j * np.asarray(Ws[j]) for j in range(m + 1))
    np.testing.assert_allclose(np.asarray(build_rhs(Ws, dt, m)), rhs_expect,
                               atol=1e-15)
    np.testing.assert_allclose(np.asarray(build_lhs(Ws, dt, m)), lhs_expect,
                               atol=1e-15)
    np.testing.assert_allclose(np.asarray(taylor_expand(Ws, dt, m)),
                               taylor_expect, atol=1e-15)


def test_forward_dahlquist_analytic():
    """y' = i y integrated to t=1 must match exp(i t) at the method's order."""
    lam = 1j
    prob = qgd_tpu.dahlquist_problem(lam, tf=1.0, nsteps=200)
    hist = qgd_tpu.eval_forward(prob, (), jnp.zeros((0,)), order=4)
    final = np.asarray(hist[-1])[:, 0]
    expected = np.exp(1j * 1.0)
    assert abs(final[0] - expected.real) < 1e-12
    assert abs(final[1] - expected.imag) < 1e-12


def test_forward_rabi_analytic_swap():
    """Rabi problem with constant amplitude 0.5 over tf=pi is a SWAP
    (rabi_oscillator.jl:1-6): |0> -> -i|1> in this convention; verify the
    evolution against the closed-form rotation."""
    prob = construct_rabi_prob(nsteps=200)
    control = qgd_tpu.GRAPEControl(1, float(np.pi))
    pcof = jnp.asarray([0.5, 0.0])
    hist = qgd_tpu.eval_forward(prob, control, pcof, order=8)
    final_c = np.asarray(hist[-1][:2]) + 1j * np.asarray(hist[-1][2:])
    # H = p (a + a') -> psi(t) = exp(-i p t sigma_x) psi(0)
    theta = 0.5 * np.pi
    U = np.array([[np.cos(theta), -1j * np.sin(theta)],
                  [-1j * np.sin(theta), np.cos(theta)]])
    np.testing.assert_allclose(final_c, U, atol=1e-10)


@pytest.mark.parametrize("order", [2, 4, 6, 8, 10, 12])
def test_forward_matches_expm(order):
    """Constant-Hamiltonian evolution must converge to the matrix
    exponential."""
    from scipy.linalg import expm

    prob, control, pcof, (K, S, sym, asym) = _toy_problem()
    # constant control: GRAPE with 1 region
    control = qgd_tpu.GRAPEControl(1, 1.0)
    pcof = jnp.asarray([0.33, -0.21])
    hist = qgd_tpu.eval_forward(prob.with_nsteps(64), control, pcof, order)
    Kc = K + 0.33 * sym
    Sc = S + (-0.21) * asym
    A = np.block([[Sc, Kc], [-Kc, Sc]])
    expected = expm(A * 1.0) @ np.asarray(prob.w0)
    tol = {2: 1e-4, 4: 1e-8, 6: 1e-11, 8: 1e-12, 10: 1e-12, 12: 1e-12}[order]
    np.testing.assert_allclose(np.asarray(hist[-1]), expected, atol=tol)


def test_forward_with_constant_forcing():
    """Inhomogeneous evolution w' = A w + f with constant A, f has the
    closed form w(t) = e^{At} w0 + A^{-1}(e^{At} - I) f — validates the
    forcing machinery (reference forcing path,
    src/forward_evolution.jl:195-206) end to end."""
    from scipy.linalg import expm

    prob, _, _, (K, S, sym, asym) = _toy_problem()
    control = qgd_tpu.GRAPEControl(1, 1.0)
    pcof = jnp.asarray([0.2, -0.1])
    Kc = K + 0.2 * sym
    Sc = S - 0.1 * asym
    A = np.block([[Sc, Kc], [-Kc, Sc]])

    rng = np.random.default_rng(7)
    f0 = rng.standard_normal((4, 1))
    nsteps, order, m = 64, 6, 3
    p = prob.with_nsteps(nsteps)
    # forcing spec: (nsteps+1, m, 2N, B) scaled derivatives f^{(j)}/j!;
    # constant forcing has only level 0
    forcing = np.zeros((nsteps + 1, m, 4, 1))
    forcing[:, 0] = f0
    hist = qgd_tpu.eval_forward(p, control, pcof, order,
                                forcing=jnp.asarray(forcing))
    eAt = expm(A * 1.0)
    expected = eAt @ np.asarray(p.w0) + np.linalg.solve(
        A, (eAt - np.eye(4)) @ f0)
    np.testing.assert_allclose(np.asarray(hist[-1]), expected, atol=1e-11)
