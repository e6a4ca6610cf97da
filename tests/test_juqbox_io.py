"""Juqbox interchange round-trip tests (reference
src/ProblemConstructors/juqbox_converter.jl)."""

import numpy as np
import pytest

import qgd_tpu
from qgd_tpu.models.juqbox_io import (
    convert_juqbox,
    convert_to_juqbox,
    load_juqbox_npz,
)
from qgd_tpu.models.builders import rotating_frame_qubit


def _params():
    prob = rotating_frame_qubit(2, 1, tf=2.0, nsteps=30,
                                detuning_frequency=0.3,
                                self_kerr_coefficient=0.1)
    H = np.asarray(prob.system_sym) + 1j * np.asarray(prob.system_asym)
    return dict(
        Hconst=H,
        Hsym_ops=[np.asarray(op) for op in prob.sym_operators],
        Hanti_ops=[np.asarray(op) for op in prob.asym_operators],
        Uinit=np.asarray(prob.u0) + 0j,
        T=2.0, nsteps=30, N=2,
        wmat_real=np.diag([0.0, 0.0, 1.0]),
    ), prob


def test_convert_juqbox_fields():
    params, ref = _params()
    prob = convert_juqbox(params)
    assert prob.N_ess_levels == 2
    assert prob.nsteps == 30
    np.testing.assert_allclose(np.asarray(prob.system_sym),
                               np.asarray(ref.system_sym))
    W = np.asarray(prob.guard_subspace_projector)
    np.testing.assert_allclose(np.diag(W), [0, 0, 1, 0, 0, 1])


def test_convert_rejects_uncoupled_ops():
    params, _ = _params()
    params["Hunc_ops"] = [np.eye(3)]
    with pytest.raises(ValueError):
        convert_juqbox(params)


def test_roundtrip_via_npz(tmp_path):
    params, ref = _params()
    path = tmp_path / "juq.npz"
    flat = {k: params[k] for k in ("Hconst", "Uinit", "wmat_real")}
    flat.update(T=params["T"], nsteps=params["nsteps"], N=params["N"])
    for i, op in enumerate(params["Hsym_ops"]):
        flat[f"Hsym_ops_{i}"] = op
    for i, op in enumerate(params["Hanti_ops"]):
        flat[f"Hanti_ops_{i}"] = op
    np.savez(path, **flat)
    prob = load_juqbox_npz(str(path))
    np.testing.assert_allclose(np.asarray(prob.u0), np.asarray(ref.u0))

    out = convert_to_juqbox(prob, Ne=[2], Ng=[1], Cfreq=[[0.0]], nCoeff=10,
                            target_complex=np.eye(3)[:, :2])
    assert out["Tmax"] == 2.0
    # Hconst in Juqbox's real-stacked convention [[S, -K], [K, S]]
    S = np.asarray(prob.system_asym)
    K = np.asarray(prob.system_sym)
    np.testing.assert_allclose(out["Hconst"],
                               np.block([[S, -K], [K, S]]))
