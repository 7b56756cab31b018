"""Accelerator-channel protocol helpers (axon-tunnel containers).

The measured protocol (CLAUDE.md): the FIRST device op of a fresh process
either blocks (observed 2–282 s) and then succeeds — the process is healthy
thereafter — or fails fast, after which the PJRT client is POISONED and
every later op fails.  These helpers make the protocol a one-liner for
user scripts; `bench.py` / `tneq_tpu.bench.window_bench` are the reference
implementations of the full measure-on-a-flaky-channel recipe
(fresh-subprocess retries, AOT compile + single execution + scalar-fetch
barrier).
"""

from __future__ import annotations

import signal
import time

__all__ = ["ChannelPoisoned", "patient_first_fetch", "tpu_ready"]


class ChannelPoisoned(RuntimeError):
    """The first device op failed: this process's client is unusable.

    Do not retry in-process — exit and retry from a fresh process."""


class _FetchTimeout(Exception):
    pass


def patient_first_fetch(budget_s: int = 330) -> float:
    """Issue the warm-up fetch; returns the seconds it blocked.

    Call once, as the first device interaction of the process.  Raises
    :class:`ChannelPoisoned` if the fetch errors or exceeds ``budget_s``
    (uses SIGALRM: main thread only; any prior alarm is restored).
    """
    import jax.numpy as jnp

    def handler(signum, frame):
        raise _FetchTimeout()

    old_handler = signal.signal(signal.SIGALRM, handler)
    prev = signal.alarm(budget_s)
    t0 = time.time()
    try:
        float(jnp.ones((4,)).sum())
        return time.time() - t0
    except _FetchTimeout:
        raise ChannelPoisoned(
            f"first fetch exceeded {budget_s}s — exit this process; "
            "retry from a fresh one"
        ) from None
    except Exception as e:
        raise ChannelPoisoned(
            f"first fetch failed ({type(e).__name__}) — this client is "
            "poisoned; exit and retry from a fresh process"
        ) from e
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old_handler)
        if prev:
            signal.alarm(prev)


def tpu_ready(budget_s: int = 330) -> bool:
    """True when the accelerator channel answered the warm-up fetch."""
    try:
        patient_first_fetch(budget_s)
        return True
    except ChannelPoisoned:
        return False
