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
NEVER escalates to SIGKILL; a child that survives two TERMs is abandoned
(``abandoned=True``, rc ``-15``) rather than killed.
"""

from __future__ import annotations

import subprocess
from types import SimpleNamespace

__all__ = ["run_term_bounded"]


def run_term_bounded(cmd, timeout, env=None, capture_stderr=False):
    """Run ``cmd`` capturing stdout, bounded by SIGTERM (never SIGKILL).

    Returns an object with ``returncode`` / ``stdout`` / ``stderr`` /
    ``abandoned`` (mirroring ``subprocess.run`` plus the abandonment
    flag).  ``capture_stderr=False`` streams the child's stderr live to
    the parent's (long TPU runs stay visible).  On timeout the child gets
    SIGTERM, then one more after a grace wait; a child that survives both
    is **left running** with ``abandoned=True`` and ``returncode`` -15.
    ``abandoned=False`` with rc -15 means the child died to the TERM —
    callers that must serialize TPU access (one client at a time) should
    stop spawning further children only when ``abandoned`` is set.
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
            returncode=proc.returncode, stdout=out or "", stderr=err or "",
            abandoned=False,
        )
    except subprocess.TimeoutExpired:
        pass
    proc.terminate()
    for grace, re_term in ((60, True), (120, False)):
        try:
            out, err = proc.communicate(timeout=grace)
            return SimpleNamespace(
                returncode=proc.returncode, stdout=out or "", stderr=err or "",
                abandoned=False,
            )
        except subprocess.TimeoutExpired:
            if re_term:
                proc.terminate()
    # Still alive after two TERMs: abandon, never SIGKILL a tunnel client.
    # Close our ends of its pipes: if the child ever unwedges and writes,
    # it gets EPIPE and dies on its first print instead of lingering as a
    # second live tunnel client (serialize-TPU-access rule) — and the
    # parent does not leak the FDs.
    for pipe in (proc.stdout, proc.stderr):
        if pipe is not None:
            try:
                pipe.close()
            except OSError:
                pass
    return SimpleNamespace(returncode=-15, stdout="", stderr="",
                           abandoned=True)
