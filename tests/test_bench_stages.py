"""Benchmark-suite smoke tests (small sizes; correctness of records)."""

import json

from tneq_tpu.bench import (
    stage_checkpoint_io,
    stage_collectives,
    stage_env_audit,
    stage_matmul_peak,
    stage_memory_bandwidth,
    stage_tn_workload,
    stage_transpose_cost,
)


def test_env_audit():
    rec = stage_env_audit()
    assert rec["platform"] == "cpu" and rec["n_devices"] == 8


def test_matmul_peak_small():
    rec = stage_matmul_peak(sizes=(128,), dtypes=("float32",))
    assert rec["results"][0]["gflops"] > 0


def test_memory_bandwidth_small():
    rec = stage_memory_bandwidth(sizes_mb=(4,))
    assert rec["results"][0]["gbps"] > 0


def test_transpose_cost_small():
    rec = stage_transpose_cost(n=256)
    assert rec["transpose_ms"] > 0


def test_collectives_small():
    rec = stage_collectives(size_mb=1)
    assert rec["results"]["psum"]["ms"] > 0


def test_checkpoint_io_small(tmp_path):
    rec = stage_checkpoint_io(tmpdir=str(tmp_path), size_mb=2)
    assert rec["save_mbps"] > 0 and rec["load_mbps"] > 0


def test_tn_workload_small():
    rec = stage_tn_workload(n_qubits=4, n_cells=2, batch=8)
    assert rec["grad_steps_per_sec"] > 0


def test_run_all_cli(tmp_path, capsys, monkeypatch):
    from tneq_tpu.bench.run_all import main

    # hermetic lock path: never collide with any other holder, real or test
    monkeypatch.setenv("TNEQ_TPU_LOCK_PATH", str(tmp_path / "tpu.lock"))
    rc = main(["--stages", "1", "--out", str(tmp_path), "--timeout", "60"])
    assert rc == 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary and summary[0]["ok"]


def test_window_bench_cli_cpu(tmp_path):
    """window_bench end-to-end as a subprocess, forced onto the CPU
    backend via the TNEQ_PLATFORM override (never touches the TPU from
    tests)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, TNEQ_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "tneq_tpu.bench.window_bench", "--steps", "50"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["unit"] == "steps/s" and d["value"] > 0
    assert d["device"] == "cpu"


def test_remeasure_rule():
    from tneq_tpu.bench._measure import remeasure_steps

    assert remeasure_steps(200, 5.0) is None          # slow enough already
    assert remeasure_steps(200, 0.1) == 16000          # 200*8/0.1
    assert remeasure_steps(200, 0.001) == 20000        # capped
    assert remeasure_steps(10, 1.9) == 1000            # floored


def _run_probe_cpu(module, argv, timeout=420):
    import os
    import subprocess
    import sys

    env = dict(os.environ, TNEQ_PLATFORM="cpu")
    return subprocess.run(
        [sys.executable, "-m", module, *argv],
        capture_output=True, text=True, timeout=timeout, env=env,
    )


def test_large_n_probe_cli_cpu(tmp_path):
    """large_n_probe end-to-end on the CPU backend at tiny scale."""
    out = tmp_path / "ln.json"
    r = _run_probe_cpu(
        "tneq_tpu.bench.large_n_probe",
        ["--qubits", "8", "--dim", "4", "--steps", "5",
         "--samples", "4", "--out", str(out)],
    )
    assert r.returncode == 0, r.stderr[-500:]
    d = json.loads(out.read_text())
    assert d["device"] == "cpu" and d["value"] > 0 and d["sample_finite"]


def test_sample_probe_cli_cpu(tmp_path):
    """sample_probe end-to-end on the CPU backend at tiny scale."""
    out = tmp_path / "sp.json"
    r = _run_probe_cpu(
        "tneq_tpu.bench.sample_probe",
        ["--qubits", "8", "--samples", "4", "--grid", "50",
         "--out", str(out)],
    )
    assert r.returncode == 0, r.stderr[-500:]
    d = json.loads(out.read_text())
    assert d["device"] == "cpu" and d["finite"]


class TestRunTermBounded:
    """TERM-only child bounding (bench/_subproc.py): the tunnel protocol
    forbids SIGKILLing TPU clients, and signal.alarm cannot interrupt a
    child blocked in backend init — the parent-side TERM is the only
    always-effective bound."""

    def test_normal_exit_captures_stdout(self):
        import sys

        from tneq_tpu.bench._subproc import run_term_bounded

        r = run_term_bounded([sys.executable, "-c", "print('RESULT 42')"],
                             timeout=60)
        assert r.returncode == 0
        assert "RESULT 42" in r.stdout

    def test_timeout_terms_not_kills(self):
        import sys
        import time

        from tneq_tpu.bench._subproc import run_term_bounded

        t0 = time.time()
        r = run_term_bounded(
            [sys.executable, "-c", "import time; time.sleep(600)"],
            timeout=2,
        )
        # child died to SIGTERM (rc -15), well before the sleep ends
        assert r.returncode == -15
        assert time.time() - t0 < 120

    def test_captures_stderr_when_asked(self):
        import sys

        from tneq_tpu.bench._subproc import run_term_bounded

        r = run_term_bounded(
            [sys.executable, "-c", "import sys; sys.stderr.write('oops')"],
            timeout=60, capture_stderr=True,
        )
        assert r.stderr == "oops"


class TestBatchedCompare:
    def _args(self, **over):
        import argparse

        base = dict(mode="pair", seed=0, validate_steps=3, prune_steps=2,
                    lane_chunk=2, max_outer=1, sync_every=2,
                    jit_scope="chunk", budget=60, target_cache=None,
                    cpu=True, out=None)
        base.update(over)
        return argparse.Namespace(**base)

    def test_run_flagship_uses_child_cmd(self, monkeypatch):
        """The child command comes from flagship.child_cmd (single source
        of truth) and a RESULT line is parsed into the record."""
        from types import SimpleNamespace

        import tneq_tpu.bench.batched_compare as bc

        seen = {}

        def fake_run(cmd, timeout, env):
            seen["cmd"] = cmd
            return SimpleNamespace(
                returncode=0,
                stdout='RESULT {"pruned_list": [1, 2], "device": "cpu"}\n')

        monkeypatch.setattr("tneq_tpu.bench._subproc.run_term_bounded",
                            fake_run)
        rec = bc._run_flagship(self._args(), batched=True)
        assert rec["pruned_list"] == [1, 2] and "_wall_s" in rec
        assert "--attempt" in seen["cmd"] and "--batched" in seen["cmd"]
        assert "--restarts" in seen["cmd"]
        assert seen["cmd"][seen["cmd"].index("--restarts") + 1] == "1"

    def test_run_flagship_rejects_failure_record(self, monkeypatch):
        """A child failure JSON (no pruned_list) raises instead of
        propagating a KeyError later in the comparison."""
        import pytest
        from types import SimpleNamespace

        import tneq_tpu.bench.batched_compare as bc

        monkeypatch.setattr(
            "tneq_tpu.bench._subproc.run_term_bounded",
            lambda cmd, timeout, env: SimpleNamespace(
                returncode=1, stdout='RESULT {"ok": false, "rc": 1}\n'))
        with pytest.raises(RuntimeError, match="without a pruned_list"):
            bc._run_flagship(self._args(), batched=False)

    def test_run_flagship_no_result(self, monkeypatch):
        import pytest
        from types import SimpleNamespace

        import tneq_tpu.bench.batched_compare as bc

        monkeypatch.setattr(
            "tneq_tpu.bench._subproc.run_term_bounded",
            lambda cmd, timeout, env: SimpleNamespace(
                returncode=-15, stdout=""))
        with pytest.raises(RuntimeError, match="produced no result"):
            bc._run_flagship(self._args(), batched=False)


def test_run_stage_respects_explicit_verdict():
    """A stage that returns its child's failure record must stay red —
    _run_stage stamping ok=True turned a refused flagship child (rc=4)
    into a green suite row."""
    from tneq_tpu.bench.run_all import _run_stage

    rec = _run_stage("x", lambda: {"stage": "x", "ok": False, "rc": 4}, 30)
    assert rec["ok"] is False and rec["rc"] == 4
    rec = _run_stage("y", lambda: {"stage": "y"}, 30)
    assert rec["ok"] is True
