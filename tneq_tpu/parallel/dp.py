"""Data parallelism: batch sharding + compiler-inserted gradient reduction.

Replaces the reference's ``DataParallelTrainer``
(``tneq_qc/distributed/parallel/data_parallel.py``): instead of manually
sharding ``data_list`` across ranks and AllReduce-averaging gradients
(``:142-307``), the batch axis is sharded over the mesh's ``data`` axis and
GSPMD inserts the cross-device ``psum`` for the mean-loss gradient — the
sync/async/accumulate modes of the reference collapse into XLA's overlapped
collective schedule.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.trainer import Trainer
from .mesh import data_sharding, replicated

__all__ = ["shard_batch", "make_dp_train_step"]


def shard_batch(x: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Place a batch with its leading dim sharded over ``axis``.

    The batch size must divide by the axis size (the reference instead gives
    remainders to early ranks, ``data_parallel.py:142-170`` — pad or trim to
    a multiple for TPU static shapes).
    """
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def make_dp_train_step(trainer: Trainer, mesh: Mesh, axis: str = "data") -> Callable:
    """Jitted DP train step: params/opt-state replicated, batch sharded.

    Returns ``step(params, opt_state, states, x)`` like
    ``Trainer.train_step``; pass ``x`` through :func:`shard_batch` (or let
    the sharding constraint move it).
    """
    rep = replicated(mesh)
    batch = data_sharding(mesh, axis)
    optimizer = trainer.optimizer

    def step(params, opt_state, states, x):
        x = jax.lax.with_sharding_constraint(x, batch)
        loss_val, grads = jax.value_and_grad(trainer.loss)(params, states, x)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss_val

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, batch),
        out_shardings=(rep, rep, rep),
    )
