"""Data utilities for likelihood training.

The reference prepares data as host-side lists of Gaussian batches, shuffled
with a broadcast seed so every rank sees the same order
(``distributed_trainer.py:347-398``, ``data_parallel.py:336-341``).  Here:
seeded generators producing device-ready arrays, an epoch shuffler, and a
batch iterator that cycles like the reference's ``Optimizer`` loop.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_batches", "shuffled_epochs", "cycle_batches"]


def gaussian_batches(
    n_batches: int,
    batch_size: int,
    n_qubits: int,
    seed: int = 0,
    scale: float = 1.0,
) -> List[jax.Array]:
    """Deterministic Gaussian data batches ``[B, nqubits]`` (the shared-seed
    equivalent of the reference's rank-0 generate + broadcast)."""
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(
            rng.normal(scale=scale, size=(batch_size, n_qubits)), jnp.float32
        )
        for _ in range(n_batches)
    ]


def shuffled_epochs(
    data_list: Sequence[jax.Array], seed: int = 0
) -> Iterator[jax.Array]:
    """Yield batches forever, reshuffling the batch order each epoch with a
    deterministic seed (same order on every process)."""
    rng = np.random.default_rng(seed)
    n = len(data_list)
    while True:
        order = rng.permutation(n)
        for i in order:
            yield data_list[int(i)]


def cycle_batches(data_list: Sequence[jax.Array]) -> Iterator[jax.Array]:
    """Plain cycling without shuffling (reference ``optimizer.py:85``)."""
    i = 0
    n = len(data_list)
    while True:
        yield data_list[i % n]
        i += 1
