"""Parity tests: native C++ de Boor (bsplvb/bsplvd) vs the JAX recurrence +
Taylor-mode AD derivatives, and vs scipy's BSpline ground truth — the
role the reference's Fortran ccall path plays
(src/Controls/FortranBSpline.jl, test/ControlFunctionTests)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from qgd_tpu.native import bsplvb, bsplvd, bspline_tables, native_available
from qgd_tpu.controls.deboor import (
    clamped_uniform_knots,
    deboor_nonzero_values,
)
from qgd_tpu import FortranBSplineControl, eval_p_derivative

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ build failed")


@pytest.mark.parametrize("degree,n_distinct", [(2, 5), (3, 6), (5, 4)])
def test_bsplvb_matches_jax_recurrence(degree, n_distinct):
    k = degree + 1
    knots = clamped_uniform_knots(k, n_distinct)
    for x in np.linspace(0.01, 0.99, 13):
        l_dist = min(int(x * (n_distinct - 1)), n_distinct - 2)
        left = degree + l_dist
        c_vals = bsplvb(knots, k, x, left)
        j_vals = np.asarray(deboor_nonzero_values(
            jnp.asarray(knots), k, jnp.asarray(x), left))
        np.testing.assert_allclose(c_vals, j_vals, atol=1e-14)


@pytest.mark.parametrize("degree,n_distinct", [(2, 5), (3, 6), (4, 5)])
def test_bsplvd_matches_scipy(degree, n_distinct):
    from scipy.interpolate import BSpline

    k = degree + 1
    knots = clamped_uniform_knots(k, n_distinct)
    n_basis = len(knots) - k
    for x in np.linspace(0.02, 0.98, 9):
        l_dist = min(int(x * (n_distinct - 1)), n_distinct - 2)
        left = degree + l_dist
        table = bsplvd(knots, k, x, left, min(k, 3))
        for i in range(k):
            gidx = left - k + 1 + i
            c = np.zeros(n_basis)
            c[gidx] = 1.0
            spl = BSpline(knots, c, degree)
            for m in range(table.shape[1]):
                expect = spl.derivative(m)(x) if m else spl(x)
                assert abs(table[i, m] - expect) < 1e-11, (
                    degree, x, i, m, table[i, m], expect)


def test_native_tables_match_control_derivatives():
    """The batched native tables must reproduce the control's scaled
    derivative API (which uses Taylor-mode AD over the JAX recurrence)."""
    degree, n_basis, tf = 3, 7, 2.0
    ctrl = FortranBSplineControl(degree, n_basis, tf)
    k = degree + 1
    knots = np.asarray(ctrl.knot_vector)
    rng = np.random.default_rng(0)
    pcof = rng.standard_normal(ctrl.N_coeff)
    ts = np.linspace(0.05, tf - 0.05, 7)
    vals, offsets = bspline_tables(knots, k, ctrl.N_distinct_knots,
                                   ts / tf, 3)
    for ix, t in enumerate(ts):
        off = int(offsets[ix])
        taps = pcof[off:off + k]
        for m in range(3):
            native = float(vals[ix, m] @ taps) / tf ** m
            ad = float(eval_p_derivative(ctrl, t, jnp.asarray(pcof), m))
            assert abs(native - ad) < 1e-10 * max(1.0, abs(ad)), (t, m)
