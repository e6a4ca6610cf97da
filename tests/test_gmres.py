"""GMRES stage-solver and preconditioner tests: the iterative path must
reproduce the direct-LU path (the reference's production solver is GMRES,
src/forward_evolution.jl:142-220; ours is direct — equivalence is the
parity requirement)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import qgd_tpu
from qgd_tpu import eval_forward, discrete_adjoint, BSpline2Control
from qgd_tpu.models.builders import rotating_frame_qubit, construct_rabi_prob
from qgd_tpu.ops.gmres import gmres_solve
from qgd_tpu.ops.preconditioners import (
    no_control_lhs,
    lu_preconditioner,
    diagonal_hamiltonian_preconditioner,
)


def test_gmres_solves_dense_system():
    rng = np.random.default_rng(0)
    n = 24
    A = jnp.asarray(np.eye(n) + 0.1 * rng.standard_normal((n, n)))
    B = jnp.asarray(rng.standard_normal((n, 3)))
    X = gmres_solve(lambda v: A @ v, B, jnp.zeros_like(B), iters=n)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B), atol=1e-10)


def _gmres_prob(base, iters=25, precond="identity"):
    return dataclasses.replace(base, solver="gmres", gmres_iters=iters,
                               preconditioner_type=precond)


@pytest.mark.parametrize("precond", ["identity", "lu", "diagonal"])
def test_gmres_forward_matches_lu(precond):
    base = rotating_frame_qubit(3, 1, tf=1.0, nsteps=20,
                                detuning_frequency=0.4,
                                self_kerr_coefficient=0.2)
    ctrl = BSpline2Control(4, 1.0)
    rng = np.random.default_rng(1)
    pcof = jnp.asarray(rng.standard_normal(8) * 0.2)
    h_lu = eval_forward(base, ctrl, pcof, 4)
    h_gm = eval_forward(_gmres_prob(base, precond=precond), ctrl, pcof, 4)
    np.testing.assert_allclose(np.asarray(h_gm), np.asarray(h_lu),
                               atol=1e-10)


def test_gmres_gradient_matches_lu():
    base = construct_rabi_prob(nsteps=15)
    ctrl = BSpline2Control(4, float(base.tf))
    rng = np.random.default_rng(2)
    pcof = jnp.asarray(rng.standard_normal(8) * 0.3)
    tgt = jnp.asarray(rng.standard_normal((2, 2))
                      + 1j * rng.standard_normal((2, 2)))
    g_lu = discrete_adjoint(base, ctrl, pcof, tgt, 4)
    g_gm = discrete_adjoint(_gmres_prob(base, iters=8), ctrl, pcof, tgt, 4)
    np.testing.assert_allclose(np.asarray(g_gm), np.asarray(g_lu),
                               rtol=1e-9, atol=1e-10)


def test_preconditioners_invert_no_control_lhs():
    prob = rotating_frame_qubit(3, 1, tf=1.0, nsteps=10,
                                detuning_frequency=0.4,
                                self_kerr_coefficient=0.2)
    dt = float(prob.tf) / prob.nsteps
    M = np.asarray(no_control_lhs(prob, dt, 4))
    rng = np.random.default_rng(3)
    V = jnp.asarray(rng.standard_normal((M.shape[0], 2)))
    for factory in (lu_preconditioner, diagonal_hamiltonian_preconditioner):
        apply, apply_T = factory(prob, dt, 4)
        np.testing.assert_allclose(np.asarray(M @ apply(V)), np.asarray(V),
                                   atol=1e-10, err_msg=str(factory))
        np.testing.assert_allclose(np.asarray(M.T @ apply_T(V)),
                                   np.asarray(V), atol=1e-10)
