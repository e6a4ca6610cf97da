"""Analytic test controls (reference src/Controls/sincos_control.jl,
zero_control.jl) and piecewise-constant / piecewise-monomial GRAPE controls
(src/Controls/grape_control.jl, generalized_grape_control.jl).

All are closed-form in both ``t`` and ``pcof``; the trig families get exact
arbitrary-order scaled-derivative tables so they exercise high-order methods
in tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from .base import Control


def _static():
    return field(metadata=dict(static=True))


def _trig_scaled_derivs(w, t, m: int, phase_cos: bool):
    """Scaled derivatives of cos(w t) (phase_cos) or sin(w t): the k-th
    scaled derivative is ``w^k/k! * trig(w t + k pi/2)``."""
    ks = jnp.arange(m)
    fact = jnp.asarray([math.factorial(int(k)) for k in range(m)],
                       dtype=jnp.float64)
    phase = w * t + ks * (jnp.pi / 2.0)
    base = jnp.cos(phase) if phase_cos else jnp.sin(phase)
    return (w ** ks) / fact * base


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _SinCosFamily(Control):
    """p = amp_trig_p(w t) * pcof[ip], q = amp_trig_q(w t) * pcof[iq]."""
    frequency: float = _static()
    kind: str = _static()

    def _amp(self, pcof, idx):
        if self.kind == "squared_amp_cos":
            return pcof[idx] ** 2
        return pcof[idx]

    def p(self, t, pcof):
        if self.kind in ("sincos", "sin"):
            tr = jnp.sin(t * self.frequency)
        else:
            tr = jnp.cos(t * self.frequency)
        return tr * self._amp(pcof, 0)

    def q(self, t, pcof):
        if self.kind == "single_sym_cos":
            return jnp.zeros_like(jnp.asarray(t, jnp.float64))
        if self.kind == "sincos":
            tr = jnp.cos(t * self.frequency)
        elif self.kind == "sin":
            tr = jnp.sin(t * self.frequency)
        else:
            tr = jnp.cos(t * self.frequency)
        return tr * self._amp(pcof, 1)

    def p_derivatives(self, t, pcof, m: int):
        phase_cos = self.kind not in ("sincos", "sin")
        tab = _trig_scaled_derivs(self.frequency, t, m, phase_cos)
        return tab * self._amp(pcof, 0)

    def q_derivatives(self, t, pcof, m: int):
        if self.kind == "single_sym_cos":
            return jnp.zeros((m,), dtype=jnp.float64)
        phase_cos = self.kind != "sin"
        tab = _trig_scaled_derivs(self.frequency, t, m, phase_cos)
        return tab * self._amp(pcof, 1)


def SinCosControl(tf, frequency=1.0):
    """p = pcof[0] sin(w t), q = pcof[1] cos(w t)
    (src/Controls/sincos_control.jl:5-24)."""
    return _SinCosFamily(N_coeff=2, tf=float(tf), frequency=float(frequency),
                         kind="sincos")


def SinControl(tf, frequency=1.0):
    """p = pcof[0] sin(w t), q = pcof[1] sin(w t)
    (src/Controls/sincos_control.jl:33-52)."""
    return _SinCosFamily(N_coeff=2, tf=float(tf), frequency=float(frequency),
                         kind="sin")


def CosControl(tf, frequency=1.0):
    """p = pcof[0] cos(w t), q = pcof[1] cos(w t)
    (src/Controls/sincos_control.jl:54-73)."""
    return _SinCosFamily(N_coeff=2, tf=float(tf), frequency=float(frequency),
                         kind="cos")


def SquaredAmpCosControl(tf, frequency=1.0):
    """p = pcof[0]^2 cos(w t), q = pcof[1]^2 cos(w t) — *nonlinear* in pcof
    (src/Controls/sincos_control.jl:75-94)."""
    return _SinCosFamily(N_coeff=2, tf=float(tf), frequency=float(frequency),
                         kind="squared_amp_cos")


def SingleSymCosControl(tf, frequency=1.0):
    """p = pcof[0] cos(w t), q = 0 (src/Controls/sincos_control.jl:96-115)."""
    return _SinCosFamily(N_coeff=1, tf=float(tf), frequency=float(frequency),
                         kind="single_sym_cos")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _Zero(Control):
    def p(self, t, pcof):
        return jnp.asarray(0.0, jnp.float64)

    def q(self, t, pcof):
        return jnp.asarray(0.0, jnp.float64)

    def p_derivatives(self, t, pcof, m: int):
        return jnp.zeros((m,), dtype=jnp.float64)

    q_derivatives = p_derivatives


def ZeroControl(tf=1.0, N_coeff=0):
    """p = q = 0 (src/Controls/zero_control.jl)."""
    return _Zero(N_coeff=int(N_coeff), tf=float(tf))


def _region_index(t, tf: float, n_regions: int):
    """Uniform-interval region index, clamped — the semantics the reference
    documents for ``find_region_index`` (src/Controls/grape_control.jl:81-99);
    0-based here."""
    idx = jnp.floor(t * (n_regions / tf)).astype(jnp.int32)
    return jnp.clip(idx, 0, n_regions - 1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class _GRAPE(Control):
    """Piecewise monomial amplitudes; ``monomial_order = 0`` is classic
    piecewise-constant GRAPE. pcof = [p amplitudes; q amplitudes].

    Note: the reference's ``GeneralGRAPEControl`` and several other controls
    call a 3-arg ``find_region_index`` that is never defined in the package
    (latent defect, see SURVEY.md §2.2); the documented uniform-interval
    semantics is implemented here.
    """
    N_amplitudes: int = _static()
    monomial_order: int = _static()

    def _local(self, t):
        width = self.tf / self.N_amplitudes
        idx = _region_index(t, self.tf, self.N_amplitudes)
        local_t = (t - idx * width) / width
        return idx, local_t, width

    def p(self, t, pcof):
        idx, local_t, _ = self._local(t)
        return pcof[idx] * local_t ** self.monomial_order

    def q(self, t, pcof):
        idx, local_t, _ = self._local(t)
        return pcof[self.N_amplitudes + idx] * local_t ** self.monomial_order

    def _derivs(self, t, coeff, m: int):
        idx, local_t, width = self._local(t)
        # d^k/dt^k [ (t_loc)^mo ] / k! = C(mo, k) t_loc^(mo-k) / width^k
        mo = self.monomial_order
        out = []
        for k in range(m):
            if k > mo:
                out.append(jnp.zeros_like(local_t))
            else:
                out.append(math.comb(mo, k) * local_t ** (mo - k) / width ** k)
        return coeff * jnp.stack(out)

    def p_derivatives(self, t, pcof, m: int):
        idx, _, _ = self._local(t)
        return self._derivs(t, pcof[idx], m)

    def q_derivatives(self, t, pcof, m: int):
        idx, _, _ = self._local(t)
        return self._derivs(t, pcof[self.N_amplitudes + idx], m)


def GRAPEControl(N_amplitudes, tf):
    """Piecewise-constant control (src/Controls/grape_control.jl:18-26)."""
    return _GRAPE(N_coeff=2 * int(N_amplitudes), tf=float(tf),
                  N_amplitudes=int(N_amplitudes), monomial_order=0)


def GeneralGRAPEControl(N_amplitudes, tf, monomial_order):
    """Piecewise monomial control
    (src/Controls/generalized_grape_control.jl:6-16)."""
    return _GRAPE(N_coeff=2 * int(N_amplitudes), tf=float(tf),
                  N_amplitudes=int(N_amplitudes),
                  monomial_order=int(monomial_order))
