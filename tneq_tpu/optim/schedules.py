"""Learning-rate schedules.

Step-table schedule matching the reference's ``[(step, lr), ...]`` format
(``tneq_qc/optim/optimizer.py:41-61`` and ``LRScheduler``,
``distributed_sgdg.py:321-349``), plus passthrough to any optax schedule.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["step_table_schedule"]


def step_table_schedule(table: Sequence[Tuple[int, float]], init_lr: float = None):
    """lr(count): piecewise-constant from a sorted ``[(step, lr), ...]`` table.

    The lr of the largest table step <= count applies; before the first table
    entry, ``init_lr`` (default: first table lr) applies.
    """
    if not table:
        raise ValueError("schedule table must be non-empty")
    table = sorted(table)
    steps = np.asarray([s for s, _ in table], np.int32)
    lrs = np.asarray([l for _, l in table], np.float32)
    first = np.float32(init_lr if init_lr is not None else table[0][1])

    def schedule(count):
        idx = jnp.sum(steps <= count) - 1
        return jnp.where(idx < 0, first, lrs[jnp.clip(idx, 0, len(table) - 1)])

    return schedule
