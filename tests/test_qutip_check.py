"""Optional QuTiP external ground truth (reference ext/QuTipIntegration.jl:
88-128 ``simulate_prob_no_control``); skipped when qutip is absent — the
scipy DOP853 cross-check in utils/ode_check.py is the always-on analogue."""

import numpy as np
import pytest

qutip = pytest.importorskip("qutip")

import qgd_tpu
from qgd_tpu.utils.ode_check import simulate_prob_no_control


def test_drift_only_matches_qutip():
    prob = qgd_tpu.models.rotating_frame_qubit(2, 1, tf=1.0, nsteps=400,
                                               detuning_frequency=0.3,
                                               self_kerr_coefficient=0.1)
    truth = simulate_prob_no_control(prob, nsteps_out=2)[-1]  # (N, B)
    hist = qgd_tpu.eval_forward_complex(
        prob, (qgd_tpu.ZeroControl(float(prob.tf)),),
        np.zeros(0), 8)
    ours = np.asarray(hist[-1])
    assert np.abs(ours - truth).max() < 1e-8
