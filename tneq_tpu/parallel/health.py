"""Mesh health checks: collective self-tests and latency probes.

Equivalent of the reference's ``check_comm_health`` allgather self-test
(``distributed_engine.py:293-332``) and the standalone deadlock/latency probe
``tools/diagnose_distributed_comm.py``: every device contributes its index
through each collective and the result is validated, with wall-time per
primitive reported.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["check_mesh_health"]


def check_mesh_health(mesh: Mesh, verbose: bool = True) -> Dict[str, Any]:
    """Run allgather / psum / ppermute identity tests over every mesh axis.

    Returns a report dict; ``ok`` is False if any collective returned wrong
    values (misconfigured mesh / broken interconnect).
    """
    report: Dict[str, Any] = {"axes": {}, "ok": True}
    for axis, size in mesh.shape.items():
        axis_report: Dict[str, Any] = {"size": size}
        x = jnp.arange(size, dtype=jnp.float32).reshape(size, 1)

        def gather(v):
            return jax.lax.all_gather(v, axis)

        def reduce(v):
            return jax.lax.psum(v, axis)

        def ring(v):
            return jax.lax.ppermute(
                v, axis, [(i, (i + 1) % size) for i in range(size)]
            )

        in_spec = P(axis)
        for name, fn, check in (
            (
                "all_gather",
                gather,
                # every shard gathers [0..size-1]; global view tiles it
                lambda out: np.array_equal(
                    np.asarray(out).ravel(),
                    np.tile(np.arange(size, dtype=np.float32), size),
                ),
            ),
            (
                "psum",
                reduce,
                lambda out: np.allclose(
                    np.asarray(out), size * (size - 1) / 2.0
                ),
            ),
            (
                "ppermute",
                ring,
                lambda out: np.array_equal(
                    np.sort(np.asarray(out).ravel()),
                    np.arange(size, dtype=np.float32),
                ),
            ),
        ):
            prog = jax.jit(
                jax.shard_map(
                    fn, mesh=mesh, in_specs=in_spec,
                    out_specs=in_spec,
                )
            )
            t0 = time.perf_counter()
            out = jax.block_until_ready(prog(x))
            dt = time.perf_counter() - t0
            ok = bool(check(out))
            axis_report[name] = {"ok": ok, "ms": round(dt * 1e3, 3)}
            if not ok:
                report["ok"] = False
        report["axes"][axis] = axis_report
        if verbose:
            print(f"mesh axis {axis!r}: {axis_report}", flush=True)
    return report
