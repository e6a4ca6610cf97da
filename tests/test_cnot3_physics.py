"""Independent physics validation of the CNOT3 carrier-control objective
(VERDICT r2 item 6): the flagship's forward propagation — full (4,4,4)
dispersive system, carrier-wave controls at the cross-Kerr sidebands —
cross-checked against scipy's adaptive DOP853 integrator (the reference's
external-ground-truth role, ext/OrdinaryDiffEqInterface.jl:72-107), and the
rotating-frame target verified to leave the no-control infidelity exactly
where drift-only evolution predicts."""

import numpy as np
import jax.numpy as jnp
import pytest

import qgd_tpu
from qgd_tpu.utils.ode_check import solve_ivp_reference


@pytest.fixture(scope="module")
def cnot3_setup():
    prob = qgd_tpu.models.cnot3_problem(tf=550.0, nsteps=2048)
    controls = tuple(
        qgd_tpu.CarrierControl(qgd_tpu.BSpline2Control(10, 550.0), f)
        for f in qgd_tpu.models.cnot3_carrier_frequencies())
    rng = np.random.default_rng(5)
    pcof = jnp.asarray(rng.uniform(-0.002, 0.002, 180))
    return prob, controls, pcof


def test_cnot3_carrier_forward_matches_dop853(cnot3_setup):
    """Model error of the discretized objective must be far below the
    optimization scales (the 1e-2..1e-3 infidelities the flagship record
    reports): order-4 Hermite at nsteps=2048 vs DOP853 at rtol 1e-11."""
    prob, controls, pcof = cnot3_setup
    hist = qgd_tpu.eval_forward(prob, controls, pcof, 4,
                                save_every=prob.nsteps)
    ours = np.asarray(hist[-1])
    truth = solve_ivp_reference(prob, controls, pcof, rtol=1e-11, atol=1e-11)
    err = np.abs(ours - truth).max()
    # measured: 8.68e-5 at nsteps=2048, 5.48e-6 at 4096 (ratio 15.8 = 2^4,
    # clean order-4 asymptotics, not DOP853-limited) -> extrapolated model
    # error 1.7e-9 at the flagship's nsteps=30720, orders below the
    # 1e-2..1e-3 infidelities the record reports. CI runs one size.
    assert err < 2e-4, err


def test_cnot3_no_control_infidelity_matches_drift_phases(cnot3_setup):
    """With zero controls the propagator is exp(drift phases) exactly; the
    rotating-frame target's infidelity then has a closed form through the
    Kerr phases of the 8 essential states. Guards the target/frame/sign
    conventions end to end."""
    prob, controls, _ = cnot3_setup
    pcof0 = jnp.zeros(180)
    tgt = qgd_tpu.models.cnot3_target()
    hist = qgd_tpu.eval_forward_complex(prob, controls, pcof0, 4,
                                        save_every=prob.nsteps)
    psi = np.asarray(hist[-1])

    # drift is diagonal: exp(-i E t), E = sum self-Kerr (0 on essentials)
    # + cross-Kerr -xi_pq n_p n_q  (builders.py dispersive convention)
    xi12, xi13, xi23 = 2 * np.pi * np.array([0.01, 0.001, 0.001])
    ov = np.einsum("nc,nc->c", tgt.conj(), psi)
    import itertools
    tr = 0.0 + 0.0j
    for c, (n1, n2, n3) in enumerate(
            itertools.product(range(2), range(2), range(2))):
        E = -(xi12 * n1 * n2 + xi13 * n1 * n3 + xi23 * n2 * n3)
        # target column flips n2 when n1=1 -> drift phase of the *initial*
        # basis state evolves it; overlap vs target col c:
        # <tgt_c | e^{-iEt} |init_c> ; init_c stays init_c under drift
        phase = np.exp(-1j * E * 550.0)
        # the rotated target column equals R |final_c>; drift keeps
        # |init_c>, so overlap = conj(R_row(init_c)) * phase when
        # final_c == init_c (n1=0 columns), else 0
        if n1 == 0:
            w = 2 * np.pi * np.array([4.10336, 4.81831, 7.8447])
            rph = np.exp(1j * 550.0 * (w[0] * n1 + w[1] * n2 + w[2] * n3))
            expect = np.conj(rph) * phase
            assert abs(ov[c] - expect) < 1e-6, (c, ov[c], expect)
        else:
            assert abs(ov[c]) < 1e-6, (c, ov[c])
        tr += ov[c]
    infid = 1.0 - (abs(tr) / 8) ** 2
    from qgd_tpu.objective import objective_parts
    j1, _, _ = objective_parts(prob, controls, pcof0, tgt, 4)
    assert abs(float(j1) - infid) < 1e-9
