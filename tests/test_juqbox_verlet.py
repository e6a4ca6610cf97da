"""Juqbox-class Stormer-Verlet baseline (reference ext/JuqboxHelpers.jl).

Validates the order-2 Verlet stand-in used for the live runtime-ratio
artifact (tools/juqbox_ratio.py): second-order convergence against a
high-order Hermite fine solution, and end-to-end runtime-ratio
computation through ``get_runtime_ratios`` (the reference's speed metric,
src/Tests/test_convergence.jl:256-312).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import qgd_tpu
from qgd_tpu.forward import eval_forward
from qgd_tpu.models.juqbox_verlet import verlet_forward, verlet_histories
from qgd_tpu.utils.richardson import get_histories, get_runtime_ratios


@pytest.fixture(scope="module")
def setup():
    prob = qgd_tpu.models.construct_rand_prob(8, 2, tf=2.0, nsteps=64,
                                              seed=3)
    controls = tuple(qgd_tpu.BSpline2Control(6, 2.0) for _ in range(2))
    rng = np.random.default_rng(0)
    pcof = jnp.asarray(
        rng.uniform(-0.5, 0.5, sum(c.N_coeff for c in controls)))
    return prob, controls, pcof


def test_verlet_second_order(setup):
    prob, controls, pcof = setup
    ref = np.asarray(eval_forward(prob.with_nsteps(1024), controls, pcof, 8,
                                  save_every=1024))[-1]
    errs = []
    for ns in (64, 128, 256):
        h = verlet_forward(prob.with_nsteps(ns), controls, pcof)
        errs.append(np.linalg.norm(h[-1] - ref) / np.linalg.norm(ref))
    slopes = np.log2(np.array(errs[:-1]) / np.array(errs[1:]))
    assert np.all(np.abs(slopes - 2.0) < 0.5), slopes


def test_verlet_save_grid_matches_hermite(setup):
    """Thinned Verlet history lands on the same save grid as eval_forward
    (so Richardson comparisons line up point for point)."""
    prob, controls, pcof = setup
    h2 = verlet_forward(prob.with_nsteps(128), controls, pcof, save_every=2)
    h1 = verlet_forward(prob.with_nsteps(64), controls, pcof)
    assert h2.shape == h1.shape
    # coarse and fine agree to the discretization error, not more
    assert np.linalg.norm(h2 - h1) / np.linalg.norm(h1) < 0.1


def test_runtime_ratio_end_to_end(setup):
    """get_runtime_ratios(ours, verlet) — the reference's Juqbox speed
    metric — runs live on a small problem."""
    prob, controls, pcof = setup
    ours = get_histories(prob, controls, pcof, 5, orders=(4,),
                         base_nsteps=16, verbose=False)
    verlet = verlet_histories(prob, controls, pcof, 7, base_nsteps=32,
                              verbose=False)
    errs_o = ours["Order 4"]["rel_errs"]
    errs_v = verlet["Verlet order 2"]["rel_errs"]
    # pick a target both sweeps bracket
    lo = max(min(errs_o), min(errs_v))
    hi = min(max(errs_o), max(errs_v))
    assert lo < hi, (errs_o, errs_v)
    target = float(np.sqrt(lo * hi))
    ratios = get_runtime_ratios(ours, verlet, target_error=target)
    assert np.isfinite(ratios["Order 4"]) and ratios["Order 4"] > 0
