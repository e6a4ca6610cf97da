"""Multi-chip scale-out over a ``jax.sharding.Mesh``.

The reference's only parallelism is Julia threads over initial-condition
columns (src/forward_evolution.jl:48) plus embarrassingly-parallel SLURM job
arrays over optimization configurations (examples/cnot3_optimize_gate.sb).
Here both become mesh axes:

* ``scenario`` (data-parallel): a batch of control vectors optimized
  simultaneously (multi-start / configuration sweeps). Fully independent —
  zero communication.
* ``ic`` (model-parallel-ish): the gate-basis initial-condition columns.
  The Hermite stage matrix is state-independent, so propagation of a column
  block needs NO communication; only the objective's three scalar
  reductions (two infidelity inner products, one guard-penalty sum —
  src/infidelity.jl:17,56-96) ``psum`` over this axis, and reverse-mode AD
  transposes them automatically.

This is the weak-scaling profile SURVEY.md §2.6 calls for: the only
cross-device traffic is O(1) scalars per objective evaluation plus the
per-iteration gradient all-reduce.
"""

from .sharded import (
    initialize_distributed,
    make_mesh,
    sharded_objective_and_grad,
    batched_objective_and_grad,
    multichip_train_step,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "sharded_objective_and_grad",
    "batched_objective_and_grad",
    "multichip_train_step",
]
