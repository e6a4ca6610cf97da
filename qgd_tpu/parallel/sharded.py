"""Sharded objective/gradient evaluation and the multi-chip training step.

See package docstring for the mesh design. Everything here is built on
``shard_map`` + explicit ``psum`` so the communication pattern is exactly
what the docstring promises — XLA inserts nothing else.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..controls import as_control_tuple
from ..forward import eval_forward
from ..objective import (_realify_target, _target_T, host_realify_target,
                         with_host_target)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize multi-host JAX (``jax.distributed``) so
    :func:`make_mesh` sees every host's devices. The scenario axis is the
    natural cross-host (DCN) axis — scenarios never communicate; the ic
    axis's scalar psums should stay within a host/slice (ICI).

    No-op when already initialized or running single-process.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def make_mesh(n_scenario: int = 1, n_ic: int = 1, devices=None) -> Mesh:
    """Build a ``(scenario, ic)`` device mesh from the available devices."""
    if devices is None:
        devices = jax.devices()
    n = n_scenario * n_ic
    if n > len(devices):
        raise ValueError(f"mesh {n_scenario}x{n_ic} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(n_scenario, n_ic)
    return Mesh(dev_array, axis_names=("scenario", "ic"))


def _local_objective(prob, controls, pcof, target_real, order: int,
                     ic_axis: str | None):
    """Objective where every initial-condition reduction optionally psums
    over ``ic_axis`` — the sharded counterpart of
    qgd_tpu.objective.objective_parts."""
    hist = eval_forward(prob, controls, pcof, order)
    final_state = hist[-1]
    N_tot = prob.N_tot_levels
    R = target_real
    T = _target_T(target_real, N_tot)
    a = jnp.vdot(final_state, R)
    b = jnp.vdot(final_state, T)

    dt = prob.tf / prob.nsteps
    W = prob.guard_subspace_projector
    Wh = jnp.einsum("ab,tbj->taj", W, hist)
    per_t = jnp.einsum("taj,taj->t", hist, Wh)
    n = per_t.shape[0]
    wts = jnp.ones(n, dtype=per_t.dtype).at[0].set(0.5).at[-1].set(0.5)
    guard_local = jnp.sum(wts * per_t) * dt / prob.tf

    if ic_axis is not None:
        a = jax.lax.psum(a, ic_axis)
        b = jax.lax.psum(b, ic_axis)
        guard = jax.lax.psum(guard_local, ic_axis)
    else:
        guard = guard_local

    infid = 1.0 - (a * a + b * b) / (prob.N_ess_levels ** 2)
    return infid + guard


# with_host_target sits OUTSIDE jit: a complex target must be realified on
# the host before it becomes a jit input (a complex128 device transfer hangs
# the axon TPU tunnel — see objective.host_realify_target).
@with_host_target(3)
@partial(jax.jit, static_argnames=("order", "mesh", "ridge_penalty_strength"))
def sharded_objective_and_grad(prob, controls, pcof, target, mesh: Mesh,
                               order: int = 4,
                               ridge_penalty_strength: float = 0.0):
    """Objective + gradient with initial-condition columns sharded over the
    mesh's ``ic`` axis (single control vector)."""
    controls = as_control_tuple(controls)
    target_real = jnp.asarray(host_realify_target(target))
    ic_spec = P(None, "ic")

    def local(u0, v0, tgt, pc):
        p_local = dataclasses.replace(prob, u0=u0, v0=v0)
        val, grad = jax.value_and_grad(
            lambda q: _local_objective(p_local, controls, q, tgt, order,
                                       "ic"))(pc)
        # psum transposes to psum, so each shard's local grad carries an
        # extra axis-size factor on its own contribution; psum/n recovers
        # the exact full gradient (verified to 2e-16 vs the single-device
        # adjoint in tests/test_sharding.py).
        return val, jax.lax.psum(grad, "ic") / jax.lax.axis_size("ic")

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(ic_spec, ic_spec, ic_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    val, grad = fn(prob.u0, prob.v0, target_real, jnp.asarray(pcof))
    pcof = jnp.asarray(pcof)
    ridge = ridge_penalty_strength * jnp.vdot(pcof, pcof) / pcof.shape[0]
    return val + ridge, grad + 2.0 * ridge_penalty_strength * pcof / pcof.shape[0]


@with_host_target(3)
@partial(jax.jit, static_argnames=("order", "mesh", "ridge_penalty_strength"))
def batched_objective_and_grad(prob, controls, pcofs, target, mesh: Mesh,
                               order: int = 4,
                               ridge_penalty_strength: float = 0.0):
    """Per-scenario objective + gradient for a batch of control vectors
    ``pcofs (S, n_params)``, scenarios sharded over ``scenario`` and
    initial-condition columns over ``ic``."""
    controls = as_control_tuple(controls)
    target_real = jnp.asarray(host_realify_target(target))

    def local(u0, v0, tgt, pcs):
        p_local = dataclasses.replace(prob, u0=u0, v0=v0)

        def one(pc):
            val, grad = jax.value_and_grad(
                lambda q: _local_objective(p_local, controls, q, tgt, order,
                                           "ic"))(pc)
            # see sharded_objective_and_grad for the psum/n reasoning
            return val, jax.lax.psum(grad, "ic") / jax.lax.axis_size("ic")

        return jax.vmap(one)(pcs)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "ic"), P(None, "ic"), P(None, "ic"),
                  P("scenario", None)),
        out_specs=(P("scenario"), P("scenario", None)),
        check_vma=False,
    )
    pcofs = jnp.asarray(pcofs)
    vals, grads = fn(prob.u0, prob.v0, target_real, pcofs)
    n = pcofs.shape[-1]
    ridge = ridge_penalty_strength * jnp.sum(pcofs * pcofs, axis=-1) / n
    return vals + ridge, grads + 2.0 * ridge_penalty_strength * pcofs / n


def multichip_train_step(prob, controls, target, mesh: Mesh, order: int = 4,
                         ridge_penalty_strength: float = 1e-2,
                         learning_rate: float = 0.02):
    """Build a jitted multi-chip optimization step: batched scenario
    gradients + a gradient-descent update, all device-resident. Returns
    ``step(pcofs) -> (pcofs', objectives)``.

    (The production driver uses L-BFGS on the host or optax on device; this
    fixed-step variant is what the multi-chip dry-run compiles.)
    """
    # Realify once, before ``target`` is closed over: inside jit(step) a
    # complex target would otherwise become an embedded complex128 constant
    # (the axon-tunnel hang with_host_target exists to prevent).
    target = host_realify_target(target)

    def step(pcofs):
        vals, grads = batched_objective_and_grad(
            prob, controls, pcofs, target, mesh, order,
            ridge_penalty_strength)
        return pcofs - learning_rate * grads, vals

    return jax.jit(step)
