"""Order-of-convergence integration tests (reference
test/ConvergenceTests/forward_convergence.jl): for Rabi and seeded-random
problems x control families, halve the stepsize repeatedly and assert the
log2 Richardson-error slopes match the method order +- 0.5."""

import numpy as np
import jax.numpy as jnp
import pytest

import qgd_tpu
from qgd_tpu import (
    construct_rabi_prob,
    construct_rand_prob,
    GRAPEControl,
    BSpline2Control,
    CarrierControl,
    eval_forward,
)
from qgd_tpu.utils import richardson_extrap_rel_err


def _order_slope(prob, controls, pcof, order, base_nsteps, n_refine=4):
    finals = []
    for k in range(n_refine):
        p = prob.with_nsteps(base_nsteps * 2 ** k)
        hist = eval_forward(p, controls, pcof, order)
        finals.append(np.asarray(hist[-1]))
    errs = [richardson_extrap_rel_err(finals[i + 1], finals[i], order)
            for i in range(n_refine - 1)]
    slopes = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    return errs, slopes


CASES = []
_rabi = construct_rabi_prob(nsteps=10)
_rand = construct_rand_prob(3, 1, tf=1.0, nsteps=10, seed=21)
_rng = np.random.default_rng(2)
for name, prob, controls in [
    ("rabi_const", _rabi, [GRAPEControl(1, float(_rabi.tf))]),
    ("rabi_bspline", _rabi, [BSpline2Control(5, float(_rabi.tf))]),
    ("rand_bspline_carrier", _rand,
     [CarrierControl(BSpline2Control(4, float(_rand.tf)), [1.0, 2.5])]),
]:
    n = sum(c.N_coeff for c in controls)
    CASES.append((name, prob, controls,
                  jnp.asarray(_rng.standard_normal(n) * 0.5)))


@pytest.mark.parametrize("order,base", [(2, 32), (4, 16), (6, 8), (8, 6),
                                        (10, 4)])
@pytest.mark.parametrize("case", [c[0] for c in CASES])
def test_convergence_order(case, order, base):
    name, prob, controls, pcof = next(c for c in CASES if c[0] == case)
    errs, slopes = _order_slope(prob, controls, pcof, order, base)
    # skip refinements that hit machine precision
    usable = [s for s, e in zip(slopes, errs[1:]) if e > 1e-13]
    assert usable, f"{name}: all errors at machine precision, lower base"
    mean_slope = np.mean(usable)
    assert abs(mean_slope - order) < 0.5, (
        f"{name} order={order}: slopes {slopes}, errors {errs}")


def test_get_histories_harness(tmp_path):
    """The Richardson sweep harness runs, early-stops, and checkpoints."""
    name, prob, controls, pcof = CASES[0]
    res = qgd_tpu.get_histories(
        prob, controls, pcof, 4, orders=(2, 4), base_nsteps=16,
        jld2_filename=str(tmp_path / "sweep"), verbose=False)
    assert "Order 2" in res and "Order 4" in res
    assert len(res["Order 2"]["rel_errs"]) >= 2
    # order-4 errors decay faster than order-2 at matching refinements
    e2, e4 = res["Order 2"]["rel_errs"], res["Order 4"]["rel_errs"]
    assert e4[0] < e2[0]
    assert (tmp_path / "sweep.json").exists()
    assert (tmp_path / "sweep.npz").exists()


def test_timestep_estimation():
    prob = construct_rabi_prob(nsteps=10)
    period = qgd_tpu.get_shortest_period(prob, [0.5])
    # H = 0.5*(a+a') has eigenvalues +-0.5 -> period 4pi
    assert abs(period - 4 * np.pi) < 1e-10
    n = qgd_tpu.estimate_N_timesteps(prob, [0.5], timesteps_per_period=40)
    assert n == int(np.ceil(float(prob.tf) / period * 40))
    errs = qgd_tpu.estimate_timesteps_per_period(
        prob, [0.5], 4, resolutions=[4, 8, 16])
    assert errs[-1] < errs[0]
