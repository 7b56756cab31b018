"""Advisory single-client lockfile for the axon TPU channel.

The tunnel supports ONE client process at a time (CLAUDE.md:
serialize-TPU-access).  Round 3 logged a false ``channel DOWN`` verdict
from ``axon_probe`` while another client was live — the probe could not
distinguish *down* from *busy*.  Every TPU-touching CLI now registers
itself here so the probe (and any other entry point) can detect a live
client and report BUSY instead of probing into a held channel.

This is an **advisory** lock for a single cooperating operator, not a
race-proof mutex: the holder file records ``{pid, tag, started}``; a
holder whose pid is no longer alive is stale and silently removed.
``TNEQ_TPU_LOCK_PATH`` overrides the path (tests); ``TNEQ_TPU_LOCK=0``
disables the mechanism entirely.
"""

from __future__ import annotations

import contextlib
import errno
import json
import os
import time

__all__ = ["TpuBusy", "holder", "acquire", "guard", "register_cli",
           "LOCK_PATH", "PRIORITY_PATH", "request_priority",
           "clear_priority", "priority_requested", "install_lane_yield",
           "YIELDED_RC"]

# exit code for "yielded the channel mid-run to a bench-priority flag":
# like the busy-exit 4, it means NO measurement failed — but unlike 4,
# work DID start and was discarded, so callers wait for the flag to clear
# and then re-run the same unit (see flagship_protocol, run_all).
YIELDED_RC = 5

LOCK_PATH = "/tmp/tneq_tpu_client.lock"
PRIORITY_PATH = "/tmp/tneq_tpu_bench_priority.flag"

# a live requester refreshes the flag every poll (~60s) while WAITING,
# but goes silent for one whole measurement-child window while blocked in
# run_term_bounded — bench.py's bound is CHILD_BUDGET_S+120 = 1220s plus
# the TERM grace (~180s), so the staleness bound must exceed ~1400s or
# lane drivers delete the flag mid-measurement and spawn TPU children
# straight into the bench's client.  Anything older than this is a
# crashed/hung requester and must not stall the lanes.
PRIORITY_MAX_AGE_S = 2100


def _path() -> str:
    return os.environ.get("TNEQ_TPU_LOCK_PATH", LOCK_PATH)


def _prio_path() -> str:
    return os.environ.get("TNEQ_TPU_PRIORITY_PATH", PRIORITY_PATH)


def _enabled() -> bool:
    return os.environ.get("TNEQ_TPU_LOCK", "1") != "0"


class TpuBusy(RuntimeError):
    """A live TPU client already holds the channel."""

    def __init__(self, info: dict):
        self.info = info
        age = time.time() - info.get("started", time.time())
        super().__init__(
            f"live TPU client pid={info.get('pid')} "
            f"tag={info.get('tag')!r} (age {age:.0f}s)"
        )


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # exists, owned by someone else
        return True
    return True


def holder() -> dict | None:
    """Info dict of a LIVE lock holder, else None.

    A stale file (dead pid, unparseable) is removed as a side effect.
    """
    if not _enabled():
        return None
    path = _path()
    try:
        with open(path) as f:
            info = json.load(f)
        pid = int(info["pid"])
    except (OSError, ValueError, KeyError, TypeError):
        with contextlib.suppress(OSError):
            if os.path.exists(path):
                os.unlink(path)
        return None
    if pid == os.getpid() or not _pid_alive(pid):
        if not _pid_alive(pid):
            with contextlib.suppress(OSError):
                os.unlink(path)
        return None
    return info


def acquire(tag: str):
    """Register this process as the TPU client; returns a release callable.

    Raises :class:`TpuBusy` if a live holder exists.  Disabled
    (``TNEQ_TPU_LOCK=0``) → no-op release.
    """
    if not _enabled():
        return lambda: None
    path = _path()
    for _ in range(2):  # one retry after clearing a stale file
        live = holder()
        if live is not None:
            raise TpuBusy(live)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except OSError as e:
            if e.errno == errno.EEXIST:
                continue  # raced or stale; holder() above will clean it
            raise
        with os.fdopen(fd, "w") as f:
            json.dump({"pid": os.getpid(), "tag": tag,
                       "started": time.time()}, f)
        break
    else:
        live = holder()
        if live is not None:
            raise TpuBusy(live)
        raise OSError(f"could not create TPU lockfile {path}")

    def release():
        try:
            with open(path) as f:
                info = json.load(f)
            if int(info.get("pid", -1)) == os.getpid():
                os.unlink(path)
        except (OSError, ValueError):
            pass

    return release


def request_priority(tag: str) -> None:
    """Post (or refresh) the bench-priority flag.

    The round-end driver runs ``bench.py`` while background lanes
    (protocol drivers, the isolated suite) may hold the channel
    back-to-back for hours; without a yield signal the bench would wait
    out its deadline and record a CPU fallback as the round's number.
    A fresh flag tells cooperating lane drivers: finish the in-flight
    child, then PAUSE before spawning the next one.  Call again every
    poll to keep the flag fresh (staleness bound ``PRIORITY_MAX_AGE_S``).
    """
    tmp = f"{_prio_path()}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump({"pid": os.getpid(), "tag": tag, "ts": time.time()}, f)
    os.replace(tmp, _prio_path())


def clear_priority() -> None:
    """Remove the bench-priority flag if this process posted it."""
    path = _prio_path()
    try:
        with open(path) as f:
            info = json.load(f)
        if int(info.get("pid", -1)) == os.getpid():
            os.unlink(path)
    except (OSError, ValueError, TypeError):
        pass


def priority_requested() -> dict | None:
    """Info dict of a LIVE, FRESH bench-priority request, else None.

    Stale flags (dead requester pid, or not refreshed within
    ``PRIORITY_MAX_AGE_S``) are removed as a side effect — a crashed
    bench must not stall the lanes.  The requester's own process (and
    children it marks with ``TNEQ_TPU_PRIORITY_OK=1``) see None so the
    bench's measurement children are never blocked by their own flag.
    """
    path = _prio_path()
    if os.environ.get("TNEQ_TPU_PRIORITY_OK", "") == "1":
        return None
    try:
        with open(path) as f:
            info = json.load(f)
        pid = int(info["pid"])
        ts = float(info["ts"])
    except (OSError, ValueError, KeyError, TypeError):
        with contextlib.suppress(OSError):
            if os.path.exists(path):
                os.unlink(path)
        return None
    if pid == os.getpid():
        return None
    if not _pid_alive(pid) or time.time() - ts > PRIORITY_MAX_AGE_S:
        with contextlib.suppress(OSError):
            os.unlink(path)
        return None
    return info


def install_lane_yield(min_interval_s: float = 5.0) -> None:
    """Make this lane child's fit loops yield to a live bench-priority flag.

    VERDICT r4 missing-#1: the round-end ``bench.py`` starved >90 min
    behind ONE in-flight flagship restart because the priority flag was
    only consulted *between* children.  This installs a rate-limited
    checker into the chunk-boundary hook (``utils/coop``) that the host
    fit loops poll once per jitted chunk dispatch: when a live, fresh
    priority flag appears, the next boundary raises
    ``coop.YieldInterrupt`` and the entry point exits with
    :data:`YIELDED_RC` so the channel frees within ~one chunk.

    No-op installs nothing when the process is CPU-forced
    (``TNEQ_PLATFORM=cpu``) or is one of the bench's own children
    (``TNEQ_TPU_PRIORITY_OK=1`` — ``priority_requested`` is already None
    there, but skipping the install keeps the hot loop hook-free), or
    when ``TNEQ_TPU_LANE_YIELD=0`` explicitly opts out.
    """
    if os.environ.get("TNEQ_PLATFORM", "").lower() == "cpu":
        return
    if os.environ.get("TNEQ_TPU_PRIORITY_OK", "") == "1":
        return
    if os.environ.get("TNEQ_TPU_LANE_YIELD", "1") == "0":
        return
    from ..utils.coop import YieldInterrupt, install_poll_hook

    state = {"t": 0.0}

    def check() -> None:
        now = time.time()
        if now - state["t"] < min_interval_s:
            return
        state["t"] = now
        prio = priority_requested()
        if prio is not None:
            raise YieldInterrupt(prio)

    install_poll_hook(check)


@contextlib.contextmanager
def guard(tag: str):
    """Context manager around :func:`acquire`."""
    release = acquire(tag)
    try:
        yield
    finally:
        release()


def register_cli(tag: str):
    """Register a TPU-touching CLI process for its whole lifetime.

    No-op when the process is forced onto CPU (``TNEQ_PLATFORM=cpu``) — a
    CPU run must not serialize against (or block) the real channel.  On a
    live holder, prints a BUSY notice and exits with code 4 (the shared
    busy-channel convention, see ``bench.py``): two clients on the tunnel
    wedge it (CLAUDE.md serialize-TPU-access), so refusing is the only
    safe behavior for an unattended lane item.  Release is atexit-hooked;
    returns the release callable for early release.
    """
    import atexit
    import sys

    if os.environ.get("TNEQ_PLATFORM", "").lower() == "cpu":
        return lambda: None
    prio = priority_requested()
    if prio is not None:
        print(f"TPU channel YIELDED: bench priority requested by "
              f"pid={prio.get('pid')} tag={prio.get('tag')!r} — "
              f"refusing to start new TPU work", file=sys.stderr, flush=True)
        raise SystemExit(4)
    try:
        release = acquire(tag)
    except TpuBusy as e:
        print(f"TPU channel BUSY: {e} — refusing a second client",
              file=sys.stderr, flush=True)
        raise SystemExit(4)
    atexit.register(release)
    return release
