"""Tests for the external ground-truth cross-check, state helpers, model
builders, and plotting smoke coverage."""

import numpy as np
import jax.numpy as jnp
import pytest

import qgd_tpu
from qgd_tpu import (
    construct_rabi_prob,
    GRAPEControl,
    BSpline2Control,
    basis_state,
    create_initial_conditions,
    create_gate,
    guard_projector,
    lowering_operators_system,
    target_helper,
    complex_to_real,
    real_to_complex,
    get_populations,
)
from qgd_tpu.utils.ode_check import test_agreement as ode_agreement
from qgd_tpu.models.builders import rotating_frame_qubit


def test_hermite_vs_scipy_ode():
    """Hermite propagation agrees with scipy DOP853 ground truth (the
    reference's external DifferentialEquations/QuTiP checks)."""
    prob = rotating_frame_qubit(3, 1, tf=1.0, nsteps=200,
                                detuning_frequency=0.4,
                                self_kerr_coefficient=0.2)
    ctrl = BSpline2Control(4, 1.0)
    pcof = jnp.asarray(np.linspace(-0.3, 0.4, 8))
    dev = ode_agreement(prob, ctrl, pcof, order=6, rtol=1e-12)
    assert dev < 1e-9


def test_basis_state_orderings():
    # |1 0> with sizes (2, 3), bitstring ordered: index 1*3 + 0 = 3
    v = basis_state((2, 3), (1, 0))
    assert v[3] == 1.0 and v.sum() == 1.0
    # reversed ordering: first index changes fastest
    v2 = basis_state((2, 3), (1, 0), bitstring_ordered=False)
    assert v2[1] == 1.0


def test_initial_conditions_and_guard_projector():
    U0 = create_initial_conditions((3,), (2,))
    assert U0.shape == (3, 2)
    np.testing.assert_allclose(np.real(U0), np.eye(3)[:, :2])
    W = guard_projector((3,), (2,))
    # reference docstring example (multi_qudit_systems.jl:295-303)
    G = W[:3, :3]
    np.testing.assert_allclose(np.diag(G), [0, 0, 1])
    # Asymmetric essential sizes: guarded iff subsystem 1's level >= 1
    # (the reference's docstring shows [0,0,1,1] from its index-pairing
    # defect — see guard_projector docstring; correct pairing gives:)
    W2 = guard_projector((2, 2), (2, 1))
    np.testing.assert_allclose(np.diag(W2[:4, :4]), [0, 1, 0, 1])


def test_create_gate_cnot():
    # 2-qubit CNOT: swap columns |10> and |11>
    G = create_gate((2, 2), (2, 2), [((1, 0), (1, 1)), ((1, 1), (1, 0))])
    expected = np.eye(4)[:, [0, 1, 3, 2]]
    np.testing.assert_allclose(np.real(G), expected)


def test_cnot3_target_rotating_frame():
    """The benchmark target must carry the rotating-frame phases
    (docs/src/examples.md:142-146): rotated = diag(exp(i sum_q w_q n_q tf))
    @ lab gate. Round 2 optimized the lab-frame gate by mistake and
    plateaued at infidelity 0.47 (results/diag/)."""
    tf = 550.0
    lab = qgd_tpu.models.cnot3_target(tf=tf, rotating_frame=False)
    rot = qgd_tpu.models.cnot3_target(tf=tf, rotating_frame=True)
    # unitary columns either way
    np.testing.assert_allclose(np.linalg.norm(rot, axis=0), 1.0, atol=1e-12)
    # per-row phases: exp(i (w1 n1 + w2 n2 + w3 n3) tf) in bitstring order
    w = 2 * np.pi * np.array([4.10336, 4.81831, 7.8447])
    phases = np.zeros(64, dtype=complex)
    idx = 0
    for n1 in range(4):
        for n2 in range(4):
            for n3 in range(4):
                phases[idx] = np.exp(1j * tf * (w[0] * n1 + w[1] * n2
                                                + w[2] * n3))
                idx += 1
    np.testing.assert_allclose(rot, phases[:, None] * lab, atol=1e-9)
    # the lab gate is the plain CNOT x I embedding
    assert np.allclose(lab.imag, 0.0)


def test_lowering_operators_commutation():
    ops = lowering_operators_system((2, 3))
    a, b = ops
    # [a, a'] = I restricted to non-truncated block; cross-ops commute
    np.testing.assert_allclose(a @ b - b @ a, np.zeros((6, 6)), atol=1e-14)


def test_state_helpers_roundtrip():
    rng = np.random.default_rng(0)
    psi = rng.standard_normal((4, 2)) + 1j * rng.standard_normal((4, 2))
    w = complex_to_real(psi)
    assert w.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(real_to_complex(w)), psi)
    tgt = target_helper(psi, N_guard_levels=2)
    assert tgt.shape == (12, 2)
    np.testing.assert_allclose(np.asarray(tgt[:4]), np.real(psi))
    np.testing.assert_allclose(np.asarray(tgt[6:10]), np.imag(psi))


def test_populations_conserved():
    prob = construct_rabi_prob(nsteps=50)
    ctrl = GRAPEControl(1, float(prob.tf))
    hist = qgd_tpu.eval_forward(prob, ctrl, jnp.asarray([0.3, 0.1]), 6)
    pops = np.asarray(get_populations(hist))
    totals = pops.sum(axis=1)
    np.testing.assert_allclose(totals, 1.0, atol=1e-10)


def test_cli_example_runs(capsys):
    import sys
    sys.path.insert(0, "/root/repo/examples")
    import cnot3_optimize_gate as cli
    rc = cli.main(["4", "50.0", "-m", "1", "--tf", "100.0", "--d1", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "min objective" in out


def test_problem_repr():
    """__repr__ mirrors the reference pretty-printer's content
    (src/SchrodingerProb.jl:278-327): sizes, tf/nsteps, solver config."""
    import dataclasses
    from qgd_tpu.models import cnot3_problem

    prob = cnot3_problem(nsteps=100)
    r = repr(prob)
    assert "64 total" in r and "8 essential" in r and "56 guarded" in r
    assert "nsteps = 100" in r and "solver = 'lu'" in r
    r2 = repr(dataclasses.replace(prob, solver="schulz", schulz_iters=48))
    assert "schulz_iters = 48" in r2
