"""Device-mesh helpers: the TPU-native replacement for the reference's
communication backends.

The reference maintains two full comm stacks (mpi4py + torch.distributed
behind ``CommBase``, ``tneq_qc/distributed/comm/``) plus mock variants.  On
TPU a single ``jax.sharding.Mesh`` over ICI subsumes all of it: collectives
are ``psum``/``all_gather``/``ppermute`` inside ``shard_map`` (differentiable,
so the reference's grad-aware collective wrappers ``allreduce_grad.py`` are
unnecessary), and the "mock" single-process backends map to a 1-device mesh.

Axis convention: ``data`` (batch sharding, = the reference's
DataParallelTrainer) and ``model`` (sliced-bond contraction, = the
reference's K-sharded tensor-parallel matmul, ``distributed_engine.py:1384``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated"]


def make_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a mesh with named axes, e.g. ``{'data': 4, 'model': 2}``.

    Defaults to all devices on one ``data`` axis.  The axis-size product must
    equal the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    sizes = list(axes.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh axes {axes} need {int(np.prod(sizes))} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
