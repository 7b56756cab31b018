"""Multi-host initialization: the reference's comm auto-detection, TPU-style.

The reference auto-detects its communication backend from the environment
(initialized torch.distributed -> mpi4py world size -> env vars -> mock;
``comm_factory.py:203-243``).  On TPU pods the equivalent is
``jax.distributed.initialize`` keyed off the standard coordinator env vars;
single-process runs (the "mock" case) simply skip initialization — a
1-process mesh is the mock backend.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["detect_multihost", "initialize_multihost", "is_main_process"]


def detect_multihost() -> Optional[dict]:
    """Return coordinator settings from the environment, or None for
    single-process runs.

    Recognized (in order): explicit JAX vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``), then the common launcher
    vars the reference's detector reads (``MASTER_ADDR``/``MASTER_PORT`` +
    ``WORLD_SIZE``/``RANK``, ``comm_factory.py:223-243``).
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return {
            "coordinator_address": os.environ["JAX_COORDINATOR_ADDRESS"],
            "num_processes": int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            "process_id": int(os.environ.get("JAX_PROCESS_ID", "0")),
        }
    if os.environ.get("MASTER_ADDR") and int(os.environ.get("WORLD_SIZE", "1")) > 1:
        addr = os.environ["MASTER_ADDR"]
        port = os.environ.get("MASTER_PORT", "8476")
        return {
            "coordinator_address": f"{addr}:{port}",
            "num_processes": int(os.environ["WORLD_SIZE"]),
            "process_id": int(os.environ.get("RANK", "0")),
        }
    return None


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-host settings are present.

    Explicit arguments win; otherwise the environment is consulted.
    Returns True when distributed init ran, False for single-process.
    """
    if coordinator_address is None:
        detected = detect_multihost()
        if detected is None:
            return False
        coordinator_address = detected["coordinator_address"]
        num_processes = detected["num_processes"]
        process_id = detected["process_id"]
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_main_process() -> bool:
    """Rank-0 check (the reference's ``is_main`` context flag,
    ``comm_interface.py:30-41``)."""
    return jax.process_index() == 0
