"""Interpret-mode correctness tests for the Pallas fused Hermite-step
kernels against the XLA reference implementation (qgd_tpu/ops/hermite.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qgd_tpu.ops.hermite import (
    scaled_derivatives,
    build_rhs,
    build_lhs,
)
from qgd_tpu.ops.pallas_step import (
    hermite_rhs_kernel_call,
    hermite_lhs_matrix_kernel_call,
)


@pytest.mark.parametrize("m", [1, 2, 3, 6])
def test_rhs_kernel_matches_reference(m):
    rng = np.random.default_rng(0)
    B, n, b = 3, 16, 4
    A = jnp.asarray(rng.standard_normal((B, m, n, n)) * 0.3,
                    dtype=jnp.float32)
    W = jnp.asarray(rng.standard_normal((B, n, b)), dtype=jnp.float32)
    dt = 0.05
    out = np.asarray(hermite_rhs_kernel_call(A, W, dt, m, interpret=True))
    for k in range(B):
        Ws = scaled_derivatives(A[k], W[k], m)
        expect = np.asarray(build_rhs(Ws, jnp.float32(dt), m))
        np.testing.assert_allclose(out[k], expect, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("m", [1, 2, 3, 6])
def test_lhs_kernel_matches_reference(m):
    rng = np.random.default_rng(1)
    B, n = 2, 16
    A = jnp.asarray(rng.standard_normal((B, m, n, n)) * 0.3,
                    dtype=jnp.float32)
    dt = 0.05
    out = np.asarray(hermite_lhs_matrix_kernel_call(A, dt, m,
                                                    interpret=True))
    eye = jnp.eye(n, dtype=jnp.float32)
    for k in range(B):
        D = scaled_derivatives(A[k], eye, m)
        expect = np.asarray(build_lhs(D, jnp.float32(dt), m))
        np.testing.assert_allclose(out[k], expect, rtol=2e-6, atol=2e-6)


def test_wired_stage_matrices_pallas_path(monkeypatch):
    """QGD_PALLAS=1 routes the hoisted stage-matrix build through the fused
    kernel (interpret mode off-TPU); must equal the XLA build bit-for-bit
    in f32 for both signs (forward LHS and adjoint RHS)."""
    import dataclasses
    import qgd_tpu
    from qgd_tpu.controls import control_tables, as_control_tuple
    from qgd_tpu.forward import _stage_matrices, _time_grid
    from qgd_tpu.problem import working_problem

    prob = qgd_tpu.models.cnot2_problem(nsteps=6)
    prob = dataclasses.replace(prob, dtype="float32", solver="schulz")
    wprob = working_problem(prob)
    ctrls = as_control_tuple(
        tuple(qgd_tpu.BSpline2Control(4, float(prob.tf)) for _ in range(2)))
    rng = np.random.default_rng(0)
    pcof = jnp.asarray(rng.standard_normal(16) * 0.1)
    m = 2
    dt, ts = _time_grid(prob)
    P, Q = control_tables(ctrls, pcof, ts, m)
    P, Q = P.astype(jnp.float32), Q.astype(jnp.float32)
    dt32 = dt.astype(jnp.float32)

    for sign in (1.0, -1.0):
        monkeypatch.delenv("QGD_PALLAS", raising=False)
        ref = np.asarray(_stage_matrices(wprob, m, dt32, P, Q, sign))
        monkeypatch.setenv("QGD_PALLAS", "1")
        fused = np.asarray(_stage_matrices(wprob, m, dt32, P, Q, sign))
        np.testing.assert_allclose(fused, ref, rtol=2e-6, atol=2e-7)


def test_lhs_kernel_is_differentiable():
    """The kernel has a custom VJP (XLA-path equivalent): callers like
    optax's zoom linesearch differentiate through eval_forward, which
    crosses the kernel when QGD_PALLAS is on (the TPU default). Without
    the rule that fails with 'Linearization failed to produce known
    values for all output primals' (measured, multistart driver)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qgd_tpu.ops.pallas_step import (hermite_lhs_matrix_kernel_call,
                                         _lhs_matrix_xla)

    rng = np.random.default_rng(5)
    m, n, B = 2, 8, 3
    A = jnp.asarray(rng.standard_normal((B, m, n, n)) * 0.1,
                    dtype=jnp.float32)
    dt = 0.37

    def f_kernel(a):
        return jnp.sum(hermite_lhs_matrix_kernel_call(a, dt, m,
                                                      interpret=True) ** 2)

    def f_xla(a):
        return jnp.sum(_lhs_matrix_xla(a, dt, m) ** 2)

    # primal parity (kernel == definition)
    np.testing.assert_allclose(float(f_kernel(A)), float(f_xla(A)),
                               rtol=1e-6)
    g_k = jax.grad(f_kernel)(A)
    g_x = jax.grad(f_xla)(A)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-5, atol=1e-7)
