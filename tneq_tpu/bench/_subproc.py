"""TERM-only bounded subprocess runner for TPU-touching children.

``subprocess.run(timeout=...)`` sends **SIGKILL** when the timeout expires
— and a SIGKILLed axon-tunnel client wedges the channel for subsequent
processes (CLAUDE.md protocol).  The children already guard themselves
with internal ``signal.alarm`` clean exits, but an alarm CANNOT interrupt
a *blocked backend init* (the tunnel's gRPC connect retries through EINTR
without returning to Python — observed hanging >15 min during a terminal
restart), so the parent-side bound is the only one that always fires.

:func:`run_term_bounded` bounds the child with plain SIGTERM (default
disposition: kernel-level terminate, works even while blocked in C) and
NEVER escalates to SIGKILL; if a child survives two TERMs it is abandoned
(reported as rc ``-15``) rather than killed.
"""

from __future__ import annotations

import subprocess
from types import SimpleNamespace

__all__ = ["run_term_bounded"]


def run_term_bounded(cmd, timeout, env=None, capture_stderr=False):
    """Run ``cmd`` capturing stdout, bounded by SIGTERM (never SIGKILL).

    Returns an object with ``returncode`` / ``stdout`` / ``stderr``
    (mirroring ``subprocess.run``).  ``capture_stderr=False`` streams the
    child's stderr live to the parent's (long TPU runs stay visible).
    On timeout the child gets SIGTERM, then one more after a grace wait;
    a child that survives both is left running and ``returncode`` is -15.
    """
    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE if capture_stderr else None,
        text=True,
        env=env,
    )
    try:
        out, err = proc.communicate(timeout=timeout)
        return SimpleNamespace(
            returncode=proc.returncode, stdout=out or "", stderr=err or ""
        )
    except subprocess.TimeoutExpired:
        pass
    proc.terminate()
    for grace in (60, 120):
        try:
            out, err = proc.communicate(timeout=grace)
            return SimpleNamespace(
                returncode=proc.returncode, stdout=out or "", stderr=err or ""
            )
        except subprocess.TimeoutExpired:
            proc.terminate()
    # Still alive after two TERMs: abandon, never SIGKILL a tunnel client.
    return SimpleNamespace(returncode=-15, stdout="", stderr="")
