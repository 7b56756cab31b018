"""DeviceFarm: per-device candidate-evaluation workers.

TPU-native rebuild of the reference's MPI job farm
(``tneq_qc/distributed/mpi_overlord.py`` dispatch loop +
``mpi_agent.py`` worker processes): instead of one OS process per MPI
rank, a single JAX controller drives every local accelerator device.
Each device gets one worker thread with its own
:class:`~tneq_tpu.genetic.evaluator.CandidateEvaluator` clone (own
jit-compile cache, goal weights committed to that device).  Jobs are
submitted to the least-loaded worker; the thread pins placement with
``jax.default_device`` (thread-local in JAX) so concurrent candidates
train on different chips simultaneously while the host only does
bookkeeping.

Why threads are enough: the hot loop is ``n_iter`` optimization steps
inside one compiled XLA program — the GIL is released for the device
compute, so N devices genuinely overlap.  Different candidates have
different graph topologies (different compiled programs), which is
exactly the case vmap cannot batch and the reference needed MPI for.

Cost model (measured): every topology is traced once (workers share the
evaluator's jit cache) but XLA compiles one executable per device it
runs on, so the farm only wins when per-candidate fit time dominates
compile time — large circuits / long budgets on real multi-chip
hardware.  On the CPU-mesh test rig the virtual devices share host
cores, so the farm is validated for correctness/determinism there, not
speed.  Determinism: PRNG keys are split in submission order on the
driver thread, so a farmed search reproduces the serial search exactly.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import List, Optional, Sequence

import jax

from .evaluator import CandidateEvaluator

__all__ = ["DeviceFarm"]


class DeviceFarm:
    """A pool of device-pinned evaluation workers.

    Args:
        evaluator: the template evaluator; each worker gets a
            :meth:`CandidateEvaluator.clone` with goal weights committed
            to its device.
        devices: devices to farm over (default: all ``jax.local_devices()``).
    """

    def __init__(
        self,
        evaluator: CandidateEvaluator,
        devices: Optional[Sequence] = None,
    ):
        self.devices = list(devices if devices is not None else jax.local_devices())
        if not self.devices:
            raise ValueError("DeviceFarm needs at least one device")
        self.evaluators = [evaluator.clone(device=d) for d in self.devices]
        # One single-thread executor per device: each worker is a serial
        # agent queue (an MPI rank), not a shared pool — two jobs must not
        # interleave host-side state on one evaluator.
        self._executors: List[ThreadPoolExecutor] = [
            ThreadPoolExecutor(max_workers=1, thread_name_prefix=f"tneq-agent{i}")
            for i in range(len(self.devices))
        ]
        self._outstanding = [0] * len(self.devices)
        self._lock = threading.Lock()

    @property
    def n_workers(self) -> int:
        return len(self.devices)

    def submit(self, graph_string: str, key, repeats: int = 1) -> Future:
        """Queue one candidate evaluation on the least-loaded device.

        Returns a future resolving to the evaluator's
        ``(losses, iterations, reason)`` tuple.
        """
        with self._lock:
            i = min(range(len(self.devices)), key=lambda j: self._outstanding[j])
            self._outstanding[i] += 1
        fut = self._executors[i].submit(self._run, i, graph_string, key, repeats)
        fut.add_done_callback(lambda _f, i=i: self._done(i))
        return fut

    def _done(self, i: int) -> None:
        with self._lock:
            self._outstanding[i] -= 1

    def _run(self, i: int, graph_string: str, key, repeats: int):
        with jax.default_device(self.devices[i]):
            return self.evaluators[i].evaluate(graph_string, key, repeats)

    def shutdown(self, wait: bool = True) -> None:
        for ex in self._executors:
            ex.shutdown(wait=wait)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False
