"""Profiling and step-timing utilities.

The reference has only ad-hoc ``time.time()`` prints
(``distributed_engine.py:936-954``) and offline micro-benchmarks; the TPU
equivalents here are ``jax.profiler`` trace capture (xplane, viewable in
TensorBoard/XProf) plus a lightweight span timer for train loops.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

__all__ = ["trace", "StepTimer", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines
    (``jax.profiler.TraceAnnotation``)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-time spans by name; ``summary()`` reports
    count/total/mean per span."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "count": self.counts[name],
                "total_s": round(self.totals[name], 4),
                "mean_ms": round(
                    1e3 * self.totals[name] / max(1, self.counts[name]), 3
                ),
            }
            for name in self.totals
        }

    def __str__(self) -> str:
        return "\n".join(
            f"{k}: {v['count']}x mean {v['mean_ms']}ms total {v['total_s']}s"
            for k, v in self.summary().items()
        )
