"""Cooperative mid-run yield hook for host-driven loops.

Round-4 postmortem (VERDICT r4 missing-#1): the driver's round-end
``bench.py`` waited >90 min behind ONE in-flight flagship restart child
(7-55 min each) and timed out — the bench-priority flag pauses lane
drivers only *between* children.  This module closes the gap: long
children poll :func:`poll` at their chunk boundaries (the host loops in
``train/_fit_driver.py`` dispatch one jitted K-step chunk per iteration,
seconds each), and a lane child that sees a live bench-priority flag
raises :class:`YieldInterrupt` to checkpoint-exit cleanly.  Expected
bench acquisition latency drops from "one whole restart" to "one chunk
dispatch + process teardown".

The hook is process-global and OFF by default: nothing yields unless an
entry point installs a checker (``bench/_tpulock.install_lane_yield``).
``bench.py``'s own measurement children set ``TNEQ_TPU_PRIORITY_OK=1``,
under which ``priority_requested()`` already returns None — so the bench
can never preempt itself.

No reference analogue: the reference's Fugaku stages own their nodes
exclusively (``tools/run_all_fugaku_tests.sh``); a single shared
serialized channel is this environment's constraint.
"""

from __future__ import annotations

from typing import Callable, Optional

__all__ = ["YieldInterrupt", "install_poll_hook", "clear_poll_hook", "poll"]

_hook: Optional[Callable[[], None]] = None


class YieldInterrupt(Exception):
    """Raised at a chunk boundary when the run should yield the channel.

    Carries the priority requester's info dict (pid/tag/ts) when known.
    Handlers must exit the process cleanly (rc 5 by convention — see
    ``bench/flagship.attempt``) so the lock's atexit release runs and the
    bench's next child finds a free channel.
    """

    def __init__(self, info: dict | None = None):
        self.info = info or {}
        super().__init__(
            f"bench priority posted (pid={self.info.get('pid')} "
            f"tag={self.info.get('tag')!r}); yielding the TPU channel"
        )


def install_poll_hook(fn: Callable[[], None]) -> None:
    """Install ``fn`` as the process-wide chunk-boundary poll (replaces
    any previous hook).  ``fn`` raises :class:`YieldInterrupt` to yield;
    returning normally continues the loop."""
    global _hook
    _hook = fn


def clear_poll_hook() -> None:
    global _hook
    _hook = None


def poll() -> None:
    """Called by host fit loops once per chunk dispatch.  No-op unless a
    hook is installed."""
    if _hook is not None:
        _hook()
