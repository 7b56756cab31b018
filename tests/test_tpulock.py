"""Advisory TPU-client lockfile (`bench/_tpulock.py`) + axon_probe BUSY.

Round 3 logged a false ``channel DOWN`` verdict from ``axon_probe`` while
another TPU client was live; the lockfile lets the probe (and every other
TPU entry point) distinguish BUSY from DOWN.
"""

import json
import os
import subprocess
import sys

import pytest

from tneq_tpu.bench import _tpulock


@pytest.fixture
def lockpath(tmp_path, monkeypatch):
    path = str(tmp_path / "tpu.lock")
    monkeypatch.setenv("TNEQ_TPU_LOCK_PATH", path)
    monkeypatch.delenv("TNEQ_TPU_LOCK", raising=False)
    return path


def test_acquire_release_roundtrip(lockpath):
    assert _tpulock.holder() is None
    release = _tpulock.acquire("test-client")
    info = json.load(open(lockpath))
    assert info["pid"] == os.getpid()
    assert info["tag"] == "test-client"
    # our own pid is never reported as a (foreign) holder
    assert _tpulock.holder() is None
    release()
    assert not os.path.exists(lockpath)


def test_second_live_client_is_busy(lockpath):
    # a genuinely-live foreign pid: a sleeping child process
    child = subprocess.Popen([sys.executable, "-c",
                              "import time; time.sleep(60)"])
    try:
        with open(lockpath, "w") as f:
            json.dump({"pid": child.pid, "tag": "other", "started": 0}, f)
        live = _tpulock.holder()
        assert live is not None and live["pid"] == child.pid
        with pytest.raises(_tpulock.TpuBusy) as exc:
            _tpulock.acquire("me")
        assert "other" in str(exc.value)
    finally:
        child.terminate()
        child.wait()


def test_stale_holder_is_cleaned_and_acquirable(lockpath):
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()  # pid is now dead
    with open(lockpath, "w") as f:
        json.dump({"pid": child.pid, "tag": "dead", "started": 0}, f)
    assert _tpulock.holder() is None  # stale → cleaned
    release = _tpulock.acquire("me")
    assert json.load(open(lockpath))["tag"] == "me"
    release()


def test_corrupt_lockfile_is_cleaned(lockpath):
    with open(lockpath, "w") as f:
        f.write("{not json")
    assert _tpulock.holder() is None
    assert not os.path.exists(lockpath)


def test_disabled_via_env(lockpath, monkeypatch):
    monkeypatch.setenv("TNEQ_TPU_LOCK", "0")
    release = _tpulock.acquire("anything")
    assert not os.path.exists(lockpath)
    assert _tpulock.holder() is None
    release()


def test_guard_context_manager(lockpath):
    with _tpulock.guard("ctx"):
        assert os.path.exists(lockpath)
    assert not os.path.exists(lockpath)


def test_axon_probe_reports_busy(lockpath):
    """With a live foreign holder, the probe exits 2 and says BUSY —
    never DOWN (it must not touch the backend at all)."""
    child = subprocess.Popen([sys.executable, "-c",
                              "import time; time.sleep(120)"])
    try:
        with open(lockpath, "w") as f:
            json.dump({"pid": child.pid, "tag": "proto-child",
                       "started": 0}, f)
        env = dict(os.environ)
        env["TNEQ_TPU_LOCK_PATH"] = lockpath
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [sys.executable, "-m", "tneq_tpu.bench.axon_probe"],
            capture_output=True, text=True, timeout=120, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 2, r.stdout + r.stderr
        assert "BUSY" in r.stdout
        assert "proto-child" in r.stdout
        assert "DOWN" not in r.stdout
    finally:
        child.terminate()
        child.wait()


def test_register_cli_noop_on_cpu(lockpath, monkeypatch):
    """A CPU-forced process must not serialize against the real channel."""
    monkeypatch.setenv("TNEQ_PLATFORM", "cpu")
    release = _tpulock.register_cli("cpu-run")
    assert not os.path.exists(lockpath)
    release()


def test_register_cli_busy_exits_4(lockpath, monkeypatch):
    """BUSY refusal uses the shared exit-code-4 convention (bench.py
    treats 4 as 'busy, wait — not a failed attempt')."""
    monkeypatch.delenv("TNEQ_PLATFORM", raising=False)
    child = subprocess.Popen([sys.executable, "-c",
                              "import time; time.sleep(60)"])
    try:
        with open(lockpath, "w") as f:
            json.dump({"pid": child.pid, "tag": "other", "started": 0}, f)
        with pytest.raises(SystemExit) as exc:
            _tpulock.register_cli("me")
        assert exc.value.code == 4
    finally:
        child.terminate()
        child.wait()


def test_register_cli_acquires_and_releases(lockpath, monkeypatch):
    monkeypatch.delenv("TNEQ_PLATFORM", raising=False)
    release = _tpulock.register_cli("suite")
    assert json.load(open(lockpath))["tag"] == "suite"
    release()
    assert not os.path.exists(lockpath)


def test_run_all_subset_merges_into_existing_summary(tmp_path, monkeypatch):
    """A --stages subset run updates matching rows of summary.json and
    keeps the rest of the full-suite record (needed to re-run individual
    stages that timed out)."""
    from tneq_tpu.bench import run_all

    monkeypatch.setenv("TNEQ_PLATFORM", "cpu")  # register_cli no-op
    monkeypatch.setattr(run_all, "ALL_STAGES", {
        "1_fake": lambda: {"ok": True},
        "6_fake": lambda: {"ok": True},
    })
    out = tmp_path / "results"
    out.mkdir()
    (out / "summary.json").write_text(json.dumps([
        {"stage": "1_fake", "ok": False},
        {"stage": "6_fake", "ok": True},
    ]))
    rc = run_all.main(["--stages", "1", "--out", str(out), "--timeout", "30"])
    assert rc == 0
    rows = {r["stage"]: r for r in json.loads((out / "summary.json").read_text())}
    assert rows["1_fake"]["ok"] is True   # re-run row updated
    assert "6_fake" in rows               # untouched row preserved


def test_run_all_isolated_merges_and_stops_on_abandoned(tmp_path, monkeypatch):
    """--isolate spawns one child per stage; a busy child (rc 4) is retried,
    a wedged-but-dead child gets a failure row, and an ABANDONED child (still
    alive after TERMs, i.e. still owning the channel) stops the loop so TPU
    access stays serialized."""
    from types import SimpleNamespace

    from tneq_tpu.bench import run_all
    from tneq_tpu.bench import _subproc

    monkeypatch.setattr(run_all, "ALL_STAGES", {
        "1_fake": None, "2_fake": None, "3_fake": None,
    })

    out = tmp_path / "results"
    out.mkdir()
    calls = []

    def fake_run(cmd, timeout, **kw):
        stage = cmd[cmd.index("--stages") + 1]
        calls.append(stage)
        if stage == "1_fake":
            # child does its own subset-merge, as the real child would
            run_all._merge_summary_row(out, {"stage": "1_fake", "ok": True})
            return SimpleNamespace(returncode=0, stdout="", abandoned=False)
        # 2_fake: survives both TERMs -> abandoned, still owns the channel
        return SimpleNamespace(returncode=-15, stdout="", abandoned=True)

    monkeypatch.setattr(_subproc, "run_term_bounded", fake_run)
    monkeypatch.setattr(run_all, "time", SimpleNamespace(sleep=lambda s: None))

    rc = run_all.main(["--stages", "1,2,3", "--out", str(out),
                       "--timeout", "30", "--isolate"])
    assert rc == 2
    assert calls == ["1_fake", "2_fake"]  # 3_fake never spawned
    rows = {r["stage"]: r for r in json.loads((out / "summary.json").read_text())}
    assert rows["1_fake"]["ok"] is True
    assert rows["2_fake"]["ok"] is False
    assert "3_fake" not in rows


@pytest.fixture
def priopath(tmp_path, monkeypatch):
    path = str(tmp_path / "bench_priority.flag")
    monkeypatch.setenv("TNEQ_TPU_PRIORITY_PATH", path)
    monkeypatch.delenv("TNEQ_TPU_PRIORITY_OK", raising=False)
    return path


def _post_foreign_priority(path, pid, age_s=0.0):
    import time as _time
    with open(path, "w") as f:
        json.dump({"pid": pid, "tag": "bench.py driver run",
                   "ts": _time.time() - age_s}, f)


def test_priority_roundtrip_and_own_pid_invisible(priopath):
    assert _tpulock.priority_requested() is None
    _tpulock.request_priority("bench")
    # the requester itself (and its measurement children) must not block
    assert _tpulock.priority_requested() is None
    _tpulock.clear_priority()
    assert not os.path.exists(priopath)


def test_priority_visible_to_other_process_and_ok_env(priopath, monkeypatch):
    child = subprocess.Popen([sys.executable, "-c",
                              "import time; time.sleep(60)"])
    try:
        _post_foreign_priority(priopath, child.pid)
        prio = _tpulock.priority_requested()
        assert prio is not None and prio["pid"] == child.pid
        # bench.py marks its own children: they bypass the flag
        monkeypatch.setenv("TNEQ_TPU_PRIORITY_OK", "1")
        assert _tpulock.priority_requested() is None
    finally:
        child.terminate()
        child.wait()


def test_priority_stale_flags_are_cleared(priopath):
    # dead requester pid
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    _post_foreign_priority(priopath, child.pid)
    assert _tpulock.priority_requested() is None
    assert not os.path.exists(priopath)
    # live pid but unrefreshed flag (crashed mid-poll)
    child2 = subprocess.Popen([sys.executable, "-c",
                               "import time; time.sleep(60)"])
    try:
        _post_foreign_priority(priopath, child2.pid,
                               age_s=_tpulock.PRIORITY_MAX_AGE_S + 10)
        assert _tpulock.priority_requested() is None
        assert not os.path.exists(priopath)
    finally:
        child2.terminate()
        child2.wait()


def test_register_cli_yields_to_bench_priority(lockpath, priopath, monkeypatch):
    """A one-shot lane item (mps_flagship, large_n_probe, a suite stage)
    must refuse to START new TPU work while bench.py holds priority —
    exit 4, the shared busy convention."""
    monkeypatch.delenv("TNEQ_PLATFORM", raising=False)
    child = subprocess.Popen([sys.executable, "-c",
                              "import time; time.sleep(60)"])
    try:
        _post_foreign_priority(priopath, child.pid)
        with pytest.raises(SystemExit) as exc:
            _tpulock.register_cli("lane-item")
        assert exc.value.code == 4
        assert not os.path.exists(lockpath)  # never acquired
    finally:
        child.terminate()
        child.wait()


def test_protocol_driver_yields_to_bench_priority(priopath, monkeypatch):
    """flagship_protocol pauses BETWEEN children while the flag is fresh
    and resumes when it clears; a deadline expiry while waiting stops the
    run as wall-budget-exhausted."""
    from types import SimpleNamespace

    from tneq_tpu.bench import flagship_protocol as fp

    child = subprocess.Popen([sys.executable, "-c",
                              "import time; time.sleep(60)"])
    try:
        _post_foreign_priority(priopath, child.pid)
        args = SimpleNamespace(cpu=False)
        # flag clears after the first wait tick -> resume (returns False)
        monkeypatch.setattr(fp.time, "sleep", lambda s: os.unlink(priopath))
        assert fp._yield_to_bench(args, deadline=None) is False
        # fresh flag + expired deadline -> True (stop the run)
        _post_foreign_priority(priopath, child.pid)
        import time as _time
        assert fp._yield_to_bench(args, _time.time() - 1) is True
        # CPU protocols never pause
        assert fp._yield_to_bench(SimpleNamespace(cpu=True), None) is False
    finally:
        child.terminate()
        child.wait()


def test_priority_staleness_covers_bench_child_window():
    """The staleness bound must outlive one whole bench.py measurement
    child: while blocked in run_term_bounded the bench cannot refresh the
    flag, and a bound shorter than the child window makes lane drivers
    delete the flag MID-MEASUREMENT and spawn TPU children into the
    bench's client (observed failure mode, fixed 2026-08-19).  Worst
    case: CHILD_BUDGET_S + 120 (parent bound) + ~180 s TERM grace."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_root", os.path.join(os.path.dirname(__file__), "..",
                                   "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    worst_child_window = bench.CHILD_BUDGET_S + 120 + 180
    assert _tpulock.PRIORITY_MAX_AGE_S > worst_child_window + 120
