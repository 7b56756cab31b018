"""Mid-child bench-priority yield (VERDICT r4 missing-#1).

Round 4's round-end ``bench.py`` starved >90 min behind ONE in-flight
flagship restart: the priority flag was only consulted *between* lane
children.  These tests pin the fix: a lane child polls the flag at every
fit-chunk boundary (``utils/coop`` hook installed by
``_tpulock.install_lane_yield``), raises ``YieldInterrupt`` within one
chunk, and the protocol driver treats the resulting rc=5 as a
non-measurement — retrying the same seed without consuming an attempt.
"""

import json
import os
import subprocess
import sys
from types import SimpleNamespace

import jax.numpy as jnp
import pytest

from tneq_tpu.bench import _tpulock
from tneq_tpu.utils import coop


@pytest.fixture
def priopath(tmp_path, monkeypatch):
    path = str(tmp_path / "prio.flag")
    monkeypatch.setenv("TNEQ_TPU_PRIORITY_PATH", path)
    monkeypatch.delenv("TNEQ_TPU_PRIORITY_OK", raising=False)
    monkeypatch.delenv("TNEQ_PLATFORM", raising=False)
    monkeypatch.delenv("TNEQ_TPU_LANE_YIELD", raising=False)
    yield path
    coop.clear_poll_hook()


def _post_foreign_priority(path, pid):
    import time

    with open(path, "w") as f:
        json.dump({"pid": pid, "tag": "bench.py driver run",
                   "ts": time.time()}, f)


@pytest.fixture
def live_flag(priopath):
    """A fresh priority flag owned by a live foreign process."""
    child = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(120)"]
    )
    try:
        _post_foreign_priority(priopath, child.pid)
        yield priopath
    finally:
        child.terminate()
        child.wait()


class TestInstallLaneYield:
    def test_poll_raises_on_live_flag(self, live_flag):
        _tpulock.install_lane_yield(min_interval_s=0.0)
        with pytest.raises(coop.YieldInterrupt) as exc:
            coop.poll()
        assert exc.value.info.get("tag") == "bench.py driver run"

    def test_poll_passes_without_flag(self, priopath):
        _tpulock.install_lane_yield(min_interval_s=0.0)
        coop.poll()  # no flag -> no raise

    def test_noop_for_cpu_and_bench_children(self, live_flag, monkeypatch):
        # CPU-forced child: nothing installed
        coop.clear_poll_hook()
        monkeypatch.setenv("TNEQ_PLATFORM", "cpu")
        _tpulock.install_lane_yield(min_interval_s=0.0)
        coop.poll()
        # bench.py's own measurement child: nothing installed
        monkeypatch.delenv("TNEQ_PLATFORM")
        monkeypatch.setenv("TNEQ_TPU_PRIORITY_OK", "1")
        _tpulock.install_lane_yield(min_interval_s=0.0)
        coop.poll()
        # explicit opt-out
        monkeypatch.delenv("TNEQ_TPU_PRIORITY_OK")
        monkeypatch.setenv("TNEQ_TPU_LANE_YIELD", "0")
        _tpulock.install_lane_yield(min_interval_s=0.0)
        coop.poll()

    def test_fit_loop_yields_within_one_chunk(self, live_flag):
        """The real host fit loop (fit_chunked) must stop at its first
        chunk boundary once the flag is up — this is the latency bound
        that frees the channel for the round-end bench."""
        from tneq_tpu.train._fit_driver import FitDrivers

        calls = {"n": 0}

        def step(params, opt_state, mask):
            calls["n"] += 1
            return params + 1.0, opt_state, jnp.float32(1.0)

        drivers = FitDrivers(
            step=step,
            optimizer=SimpleNamespace(init=lambda p: jnp.zeros(())),
            max_steps=1000,
            sync_every=4,
            running=lambda m: m > 0,  # never converges
            init_metric=1.0,
        )
        _tpulock.install_lane_yield(min_interval_s=0.0)
        with pytest.raises(coop.YieldInterrupt):
            drivers.fit_chunked(jnp.zeros(()), jnp.zeros(()))
        # the poll fires BEFORE the first dispatch: zero chunks wasted
        # when the flag precedes the fit; at most one chunk when posted
        # mid-fit (trace happens under the first dispatch)
        assert calls["n"] == 0


class TestProtocolRc5:
    def _args(self, tmp_path, **over):
        defaults = dict(
            mode="pair", restarts=1, start_seed=0,
            out=str(tmp_path / "state.json"), cpu=True, batched=False,
            validate_steps=10, prune_steps=10, lane_chunk=8, max_outer=1,
            sync_every=8, jit_scope="chunk", budget=60, retries=0,
            retry_wait=0, wall_budget=0, regen_target=False,
            after_abandon=False, target_cache=None,
        )
        defaults.update(over)
        return SimpleNamespace(**defaults)

    def _result(self, seed):
        rec = {"config": "pair-8q5c-pair", "validated": True,
               "pruned": 2, "pruned_list": [1, 2],
               "planted_mask": [1, 2, 3], "seed": seed, "wall_s": 1.0}
        return SimpleNamespace(
            returncode=0, stdout="RESULT " + json.dumps(rec) + "\n",
            stderr="", abandoned=False)

    def test_rc5_retries_same_seed_without_consuming_attempt(
        self, tmp_path, monkeypatch
    ):
        """retries=0 (single measurement attempt) and the first child
        yields mid-run: the seed must STILL land on the re-drive, with no
        failure recorded — rc=5 is not a measurement."""
        from tneq_tpu.bench import flagship_protocol as fp

        monkeypatch.setattr(fp.time, "sleep", lambda s: None)
        seq = [SimpleNamespace(returncode=5, stdout="", stderr="",
                               abandoned=False),
               self._result(0)]

        def runner(cmd, timeout, env=None):
            return seq.pop(0)

        state = fp.run_protocol(self._args(tmp_path), runner=runner)
        assert [r["seed"] for r in state["runs"]] == [0]
        assert state["failures"] == []
        assert state["complete"] is True

    def test_rc4_also_not_a_measurement(self, tmp_path, monkeypatch):
        from tneq_tpu.bench import flagship_protocol as fp

        monkeypatch.setattr(fp.time, "sleep", lambda s: None)
        seq = [SimpleNamespace(returncode=4, stdout="", stderr="",
                               abandoned=False),
               self._result(0)]
        state = fp.run_protocol(self._args(tmp_path),
                                runner=lambda c, timeout, env=None:
                                seq.pop(0))
        assert [r["seed"] for r in state["runs"]] == [0]
        assert state["failures"] == []

    def test_perpetual_yield_is_bounded(self, tmp_path, monkeypatch):
        """A stuck flag cannot spin a wall-unbounded protocol forever:
        the per-seed yield cap ends the seed without recording failures."""
        from tneq_tpu.bench import flagship_protocol as fp

        monkeypatch.setattr(fp.time, "sleep", lambda s: None)
        calls = {"n": 0}

        def runner(cmd, timeout, env=None):
            calls["n"] += 1
            return SimpleNamespace(returncode=5, stdout="", stderr="",
                                   abandoned=False)

        state = fp.run_protocol(self._args(tmp_path), runner=runner)
        assert calls["n"] == 20  # max_yields
        assert state["runs"] == []
        assert state["failures"] == []
        assert state["complete"] is False

    def test_real_failure_still_consumes_attempts(self, tmp_path,
                                                  monkeypatch):
        from tneq_tpu.bench import flagship_protocol as fp

        monkeypatch.setattr(fp.time, "sleep", lambda s: None)
        calls = {"n": 0}

        def runner(cmd, timeout, env=None):
            calls["n"] += 1
            return SimpleNamespace(returncode=1, stdout="", stderr="",
                                   abandoned=False)

        state = fp.run_protocol(
            self._args(tmp_path, retries=1), runner=runner
        )
        assert calls["n"] == 2  # 1 + retries, unchanged semantics
        assert len(state["failures"]) == 2
