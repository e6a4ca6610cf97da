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


CASES = {}
# Long-duration problems so high orders don't hit machine precision at the
# coarse grids, and *smooth* (high-degree de Boor) splines for the B-spline
# cases — quadratic splines are only C^1, which caps convergence near order
# 3; the reference makes the same choices ("High degree, because we want a
# smooth control", forward_convergence.jl:144-146, and constant controls for
# orders 8-12, :158-163).
_rabi_lo = construct_rabi_prob(tf=2 * np.pi, nsteps=10)
_rabi_hi = construct_rabi_prob(tf=12 * np.pi, nsteps=10)
_rand = construct_rand_prob(3, 1, tf=2.0, nsteps=10, seed=21)
_rng = np.random.default_rng(2)


def _case(name, prob, controls):
    n = sum(c.N_coeff for c in controls)
    CASES[name] = (prob, controls,
                   jnp.asarray(_rng.standard_normal(n) * 0.5 + 0.3))


from qgd_tpu import FortranBSplineControl  # noqa: E402

_case("rabi_const", _rabi_lo, [GRAPEControl(1, float(_rabi_lo.tf))])
_case("rabi_const_hi", _rabi_hi, [GRAPEControl(1, float(_rabi_hi.tf))])
_case("rabi_smooth_spline", _rabi_lo,
      [FortranBSplineControl(10, 14, float(_rabi_lo.tf))])
_case("rand_spline_carrier", _rand,
      [CarrierControl(FortranBSplineControl(8, 12, float(_rand.tf)),
                      [1.0, 2.5])])
# order-8 with a NON-constant control: degree-12 spline is C^11, smooth
# enough for the order-8 scheme (round-1 review weak #7 — the reference
# itself falls back to constant controls at orders 8-12,
# forward_convergence.jl:158-163; this case goes one notch beyond parity)
_case("rabi_spline8", _rabi_hi,
      [FortranBSplineControl(12, 16, float(_rabi_hi.tf))])

PARAMS = [
    ("rabi_const", 2, 64), ("rabi_const", 4, 32),
    ("rabi_const_hi", 6, 48), ("rabi_const_hi", 8, 24),
    ("rabi_const_hi", 10, 16),
    ("rabi_smooth_spline", 2, 64), ("rabi_smooth_spline", 4, 32),
    ("rabi_smooth_spline", 6, 16),
    ("rand_spline_carrier", 2, 64), ("rand_spline_carrier", 4, 32),
    ("rand_spline_carrier", 6, 16),
    ("rabi_spline8", 8, 24),
    # order 12 (reference exercises 8-12 with CONSTANT controls,
    # forward_convergence.jl:99-109, because spline envelopes are
    # pre-asymptotic at reachable grids — measured here too: degree-16
    # spline slopes 9.1/10.2 rising toward 12 at base 16). Constant
    # control at base 4 (coarsest pair is pre-asymptotic at this pcof's
    # amplitude — dt*omega ~ 2.9 — so it is dropped; measured errors
    # 5.5e-5 -> 4.8e-8 -> 1.6e-11, slopes 10.16 -> 11.58).
    ("rabi_const_hi", 12, 4),
]

# At order 8 with a non-constant spline the coarsest refinement pair is
# still pre-asymptotic (slope 6.7 before settling at 7.6/7.9); drop the
# leading pair and refine once more — standard Richardson practice, and the
# reason the reference restricts orders 8-12 to constant controls
# (forward_convergence.jl:158-163).
_DEEP_CASES = {("rabi_spline8", 8): dict(n_refine=5, skip_first=1),
               ("rabi_const_hi", 12): dict(n_refine=4, skip_first=1)}


def test_order12_smooth_spline_superconvergence():
    """Order 12 with a NON-constant (degree-16, C^15) spline: the scheme
    is pre-asymptotic at reachable grids (machine precision arrives before
    the 12th-order term dominates — the same reason the reference limits
    orders 8-12 to constant controls, forward_convergence.jl:158-163).
    Assert the honest property: error decays at >= 9th order and reaches
    1e-11-class by the third refinement (measured slopes 9.06 -> 10.19,
    rising toward 12)."""
    prob = CASES["rabi_const_hi"][0]
    ctrl = [FortranBSplineControl(16, 20, float(prob.tf))]
    rng2 = np.random.default_rng(5)
    pcof = jnp.asarray(rng2.standard_normal(ctrl[0].N_coeff) * 0.5 + 0.3)
    errs, slopes = _order_slope(prob, ctrl, pcof, 12, 16, n_refine=4)
    assert errs[-1] < 5e-11, errs
    assert np.mean(slopes) > 9.0, slopes


@pytest.mark.parametrize("case,order,base", PARAMS)
def test_convergence_order(case, order, base):
    prob, controls, pcof = CASES[case]
    deep = _DEEP_CASES.get((case, order), {})
    errs, slopes = _order_slope(prob, controls, pcof, order, base,
                                n_refine=deep.get("n_refine", 4))
    slopes = slopes[deep.get("skip_first", 0):]
    errs_for_slopes = errs[1 + deep.get("skip_first", 0):]
    # skip refinements that hit machine precision
    usable = [s for s, e in zip(slopes, errs_for_slopes) if e > 1e-13]
    assert usable, f"{case}: all errors at machine precision, lower base"
    mean_slope = np.mean(usable)
    assert abs(mean_slope - order) < 0.55, (
        f"{case} order={order}: slopes {slopes}, errors {errs}")


def test_get_histories_harness(tmp_path):
    """The Richardson sweep harness runs, early-stops, and checkpoints."""
    prob, controls, pcof = CASES["rabi_const"]
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
    # H_max = 0.5*(a+a') + 0.5i*(a-a') has eigenvalues +-|0.5+0.5i|
    # (reference get_shortest_period adds both quadratures at max amplitude,
    # src/calculate_timestep.jl:17-33)
    assert abs(period - 2 * np.pi / (0.5 * np.sqrt(2))) < 1e-10
    n = qgd_tpu.estimate_N_timesteps(prob, [0.5], timesteps_per_period=40)
    assert n == int(np.ceil(float(prob.tf) / period * 40))
    errs = qgd_tpu.estimate_timesteps_per_period(
        prob, [0.5], 4, resolutions=[4, 8, 16])
    assert errs[-1] < errs[0]


def test_runtime_ratios_synthetic():
    """get_runtime_ratios log-log interpolation on synthetic sweeps
    (reference test_convergence.jl:256-312)."""
    from qgd_tpu.utils.richardson import get_runtime_ratios, find_target_y

    ours = {"Order 4": dict(rel_errs=[1e-5, 1e-6, 1e-8],
                            elapsed=[0.05, 0.1, 0.2, 0.4])}
    ref = {"Order 2": dict(rel_errs=[1e-6, 1e-7, 1e-8],
                           elapsed=[0.5, 1.0, 2.0, 4.0])}
    ratios = get_runtime_ratios(ours, ref, target_error=1e-7)
    assert 0.0 < ratios["Order 4"] < 1.0  # ours reaches 1e-7 faster
    # interpolation sanity: target at an endpoint returns that x
    assert abs(find_target_y(1.0, 1e-6, 2.0, 1e-8, 1e-6) - 1.0) < 1e-12
    # opt-in extrapolation past the final sweep point (default: raise)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        get_runtime_ratios(ours, ref, target_error=1e-9)
    r = get_runtime_ratios(ours, ref, target_error=1e-9, extrapolate=True)
    # ref's last segment doubles time per error decade -> 8.0 s at 1e-9;
    # ours doubles time per TWO decades -> 0.4*sqrt(2) s at 1e-9
    assert abs(r["Order 4"] - 0.4 * np.sqrt(2) / 8.0) < 1e-9
