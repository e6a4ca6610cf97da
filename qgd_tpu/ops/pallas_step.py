"""Pallas TPU kernels for the Hermite-step hot path (f32 production mode).

The per-step compute is a chain of small matmuls with tiny intermediates —
exactly the shape where XLA's per-op dispatch overhead dominates on TPU.
These kernels fuse the whole chain in VMEM:

* :func:`hermite_rhs_kernel_call` — the explicit half of a step: run the
  Leibniz recursion ``W_{j+1} = 1/(j+1) sum_i A_{j-i} W_i`` and accumulate
  ``RHS = sum_j dt^j c_j W_j`` in one kernel (reference hot loop:
  compute_derivatives! + build_RHS!, src/forward_evolution.jl:163-184).
* :func:`hermite_lhs_matrix_kernel_call` — materialize the implicit-stage
  matrix ``LHS = sum_j (-dt)^j c_j D_j`` by the same recursion on the
  identity.

Both are batched over a leading axis (timesteps for precompute, scenarios
for the step) via the Pallas grid. All operands for one grid cell fit in
VMEM with room to spare (m * 2N * 2N f32 at 2N=128 is ~128 KB per
derivative level).

The dt-dependence enters by PRE-SCALING the operand stack, not via a
scalar operand: with ``A_k -> s^(k+1) A_k`` the recursion gives
``D_j -> s^j D_j``, so the kernel only needs the CONSTANT Hermite
coefficients ``c_j`` (baked in as Python floats). An earlier version
passed ``c_j s^j`` through SMEM; under a vmapped optax linesearch the
batching rule rebuilt that BlockSpec without its memory space and Mosaic
rejected the (S, m+1) block ("last two dimensions ... divisible by 8 and
128") — measured 2026-08-21, multistart driver. No scalar operands, no
such failure mode.

f32 only: the MXU has no f64; the f64 path uses the XLA implementation in
qgd_tpu/ops/hermite.py. Correctness is locked by interpret-mode tests
(tests/test_pallas.py) against that implementation.

AD: both kernel calls carry a ``jax.custom_vjp`` whose backward pass runs
``jax.vjp`` over the XLA-path equivalent (:func:`_lhs_matrix_xla` /
:func:`_rhs_xla`) — Pallas kernels have no AD rules, and callers like
optax's zoom linesearch DO differentiate through ``eval_forward``
('Linearization failed to produce known values for all output primals',
measured the day the LHS kernel became the TPU default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .hermite import hermite_coefficients


def _scaled_stack(A_stack, dt, m: int, sign: float):
    """``A_k -> (sign*dt)^(k+1) A_k`` (k = stack index, f32): folds the
    step weights into the operands so the kernel's accumulation
    coefficients are compile-time constants."""
    s = (jnp.asarray(sign, jnp.float32) * jnp.asarray(dt, jnp.float32))
    scales = s ** jnp.arange(1, m + 1, dtype=jnp.float32)
    return A_stack.astype(jnp.float32) * scales[..., :, None, None]


def _rhs_kernel(m, coeffs, a_ref, w_ref, out_ref):
    """One grid cell: scaled A_stack (m, n, n), W (n, b) -> RHS (n, b)."""
    Ws = [w_ref[0]]
    acc = coeffs[0] * Ws[0]
    for j in range(m):
        s = jnp.dot(a_ref[0, j], Ws[0], preferred_element_type=jnp.float32)
        for i in range(1, j + 1):
            s = s + jnp.dot(a_ref[0, j - i], Ws[i],
                            preferred_element_type=jnp.float32)
        w_next = s / float(j + 1)
        Ws.append(w_next)
        acc = acc + coeffs[j + 1] * w_next
    out_ref[0] = acc


def _rhs_xla(A_stack, W, dt, m: int):
    """The RHS kernel's mathematical definition in plain XLA ops (f32):
    per batch element, ``sum_j dt^j c_j W_j`` from the Leibniz recursion on
    ``W``. Serves as the kernel's differentiation rule."""
    from .hermite import scaled_derivatives, build_rhs

    def one(A, w):
        Ws = scaled_derivatives(A.astype(jnp.float32), w.astype(jnp.float32),
                                m)
        return build_rhs(Ws, jnp.asarray(dt, jnp.float32), m)

    return jax.vmap(one)(A_stack, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hermite_rhs_kernel_call(A_stack, W, dt, m: int, interpret: bool = False):
    """Fused explicit-half of the Hermite step.

    ``A_stack (B, m, n, n)``, ``W (B, n, b)``, scalar ``dt`` -> ``(B, n, b)``.
    ``B`` is the batch (scenario) grid axis.

    Differentiable the same way as :func:`hermite_lhs_matrix_kernel_call`:
    primal in Mosaic, VJP through the XLA-path equivalent (``_rhs_xla``).
    """
    return _rhs_kernel_call_impl(A_stack, W, dt, m, interpret)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _rhs_kernel_call_impl(A_stack, W, dt, m: int, interpret: bool = False):
    B, _, n, _ = A_stack.shape
    b = W.shape[-1]
    coeffs = tuple(float(c) for c in hermite_coefficients(m))
    kernel = functools.partial(_rhs_kernel, m, coeffs)
    # Trace the pallas_call with x64 OFF: under jax_enable_x64 the
    # BlockSpec index maps lower their constant indices to i64 and Mosaic
    # fails server-side with "failed to legalize operation 'func.return'"
    # on the (i32, i64, i64, i64) window transform (measured 2026-08-20).
    # Everything in the kernel is f32, so the context changes nothing else.
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, m, n, n), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, n, b), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n, b), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, n, b), jnp.float32),
            interpret=interpret,
        )(_scaled_stack(A_stack, dt, m, 1.0), W.astype(jnp.float32))


def _rhs_kernel_call_fwd(A_stack, W, dt, m, interpret):
    return _rhs_kernel_call_impl(A_stack, W, dt, m, interpret), (A_stack, W,
                                                                 dt)


def _rhs_kernel_call_bwd(m, interpret, res, g):
    A_stack, W, dt = res
    _, vjp = jax.vjp(lambda a, w, d: _rhs_xla(a, w, d, m), A_stack, W, dt)
    dA, dW, ddt = vjp(g.astype(jnp.float32))
    return (dA.astype(A_stack.dtype), dW.astype(W.dtype),
            ddt.astype(jnp.result_type(dt)))


hermite_rhs_kernel_call.defvjp(_rhs_kernel_call_fwd, _rhs_kernel_call_bwd)


def _lhs_kernel(m, coeffs, a_ref, out_ref):
    """One grid cell: scaled A_stack (m, n, n) -> LHS matrix (n, n)."""
    n = out_ref.shape[-1]
    # NOT jnp.eye: under jax_enable_x64 it lowers to int64 iota/cmpi, and
    # Mosaic's vector layout only supports bitwidths <= 32 — the server-side
    # compile aborts with "Check failed: has_single_bit(bitwidth_) &&
    # bitwidth_ <= 32" (measured 2026-08-20). Build the identity from i32.
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
           ).astype(jnp.float32)
    Ds = [eye]
    acc = coeffs[0] * eye
    for j in range(m):
        s = jnp.dot(a_ref[0, j], Ds[0], preferred_element_type=jnp.float32)
        for i in range(1, j + 1):
            s = s + jnp.dot(a_ref[0, j - i], Ds[i],
                            preferred_element_type=jnp.float32)
        d_next = s / float(j + 1)
        Ds.append(d_next)
        acc = acc + coeffs[j + 1] * d_next
    out_ref[0] = acc


def _lhs_matrix_xla(A_stack, dt, m: int):
    """The kernel's mathematical definition in plain XLA ops (f32):
    per batch element, ``sum_j (-dt)^j c_j D_j`` from the identity Leibniz
    recursion. Serves as the kernel's differentiation rule."""
    from .hermite import scaled_derivatives, build_lhs

    n = A_stack.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)

    def one(A):
        D = scaled_derivatives(A.astype(jnp.float32), eye, m)
        return build_lhs(D, jnp.asarray(dt, jnp.float32), m)

    return jax.vmap(one)(A_stack)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hermite_lhs_matrix_kernel_call(A_stack, dt, m: int,
                                   interpret: bool = False):
    """Fused implicit-stage matrix materialization.

    ``A_stack (B, m, n, n)``, scalar ``dt`` -> ``(B, n, n)`` LHS matrices
    (``sum_j (-dt)^j c_j D_j``).

    Differentiable: the primal runs the fused kernel; the VJP runs the
    XLA-path equivalent (``_lhs_matrix_xla``) under ``jax.vjp`` — exact
    for the same arithmetic, and AD never has to look inside Mosaic.
    """
    return _lhs_kernel_call_impl(A_stack, dt, m, interpret)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _lhs_kernel_call_impl(A_stack, dt, m: int, interpret: bool = False):
    B, _, n, _ = A_stack.shape
    coeffs = tuple(float(c) for c in hermite_coefficients(m))
    kernel = functools.partial(_lhs_kernel, m, coeffs)
    # x64 off during the trace — see hermite_rhs_kernel_call.
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, m, n, n), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            interpret=interpret,
        )(_scaled_stack(A_stack, dt, m, -1.0))


def _lhs_kernel_call_fwd(A_stack, dt, m, interpret):
    return _lhs_kernel_call_impl(A_stack, dt, m, interpret), (A_stack, dt)


def _lhs_kernel_call_bwd(m, interpret, res, g):
    A_stack, dt = res
    _, vjp = jax.vjp(lambda a, d: _lhs_matrix_xla(a, d, m), A_stack, dt)
    dA, ddt = vjp(g.astype(jnp.float32))
    return dA.astype(A_stack.dtype), ddt.astype(jnp.result_type(dt))


hermite_lhs_matrix_kernel_call.defvjp(_lhs_kernel_call_fwd,
                                      _lhs_kernel_call_bwd)
