"""State-vector helpers (reference src/state_vector_helpers.jl)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_populations(history):
    """Per-level populations ``|u|^2 + |v|^2``.

    Accepts a real time-major history ``(T, 2N, B)`` (or ``(T, m+1, 2N, B)``
    with derivative columns, of which only the state column is used) and
    returns ``(T, N, B)`` (reference ``get_populations``,
    src/state_vector_helpers.jl:10-62, transposed to time-major layout).
    """
    history = jnp.asarray(history)
    if history.ndim == 4:
        history = history[:, 0]
    n = history.shape[-2] // 2
    return history[..., :n, :] ** 2 + history[..., n:, :] ** 2


def target_helper(target, N_guard_levels: int = 0):
    """Realify a (possibly complex) essential-subspace target and pad with
    guard levels (src/state_vector_helpers.jl:68-84)."""
    target = np.asarray(target)
    if target.ndim == 1:
        target = target[:, None]
    n_ess, n_ic = target.shape
    n_tot = n_ess + N_guard_levels
    out = np.zeros((2 * n_tot, n_ic))
    out[:n_ess, :] = np.real(target)
    out[n_tot:n_tot + n_ess, :] = np.imag(target)
    return jnp.asarray(out)


def complex_to_real(x):
    """Stack ``[Re; Im]`` along the leading state axis
    (src/state_vector_helpers.jl:88-90)."""
    x = jnp.asarray(x)
    return jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=0)


def real_to_complex(x, x_imag=None):
    """Inverse of :func:`complex_to_real` (src/state_vector_helpers.jl:94-106)."""
    if x_imag is not None:
        return jnp.asarray(x) + 1j * jnp.asarray(x_imag)
    x = jnp.asarray(x)
    n = x.shape[0] // 2
    return x[:n] + 1j * x[n:]


def initial_basis(N_ess: int, N_guard: int):
    """Essential-basis initial conditions padded with guard levels
    (src/state_vector_helpers.jl:110-118)."""
    n_tot = N_ess + N_guard
    u0 = np.zeros((n_tot, N_ess))
    for i in range(N_ess):
        u0[i, i] = 1.0
    return jnp.asarray(u0), jnp.zeros((n_tot, N_ess))
