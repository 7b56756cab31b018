"""Unit tests for the resumable flagship protocol driver
(tneq_tpu/bench/flagship_protocol.py) with an injected fake child runner
— no TPU, no real fits."""

import json
from types import SimpleNamespace

import pytest

from tneq_tpu.bench.flagship_protocol import (
    main,
    protocol_analysis,
    run_protocol,
)


def _args(tmp_path, **over):
    defaults = dict(
        mode="pair", restarts=3, start_seed=0,
        out=str(tmp_path / "state.json"), cpu=True, batched=False,
        validate_steps=10, prune_steps=10, lane_chunk=8, max_outer=1,
        sync_every=8, jit_scope="chunk", budget=60, retries=1,
        retry_wait=0, wall_budget=0,
    )
    defaults.update(over)
    return SimpleNamespace(**defaults)


def _result(seed, pruned, planted=(0, 1, 2)):
    rec = {
        "config": "pair-8q5c-pair", "validated": True,
        "pruned": len(pruned), "pruned_list": sorted(pruned),
        "planted_mask": sorted(planted), "seed": seed, "wall_s": 1.0,
    }
    return SimpleNamespace(
        returncode=0, stdout="RESULT " + json.dumps(rec) + "\n",
        stderr="", abandoned=False,
    )


class TestProtocolAnalysis:
    def test_intersection_union_planted(self):
        runs = [
            {"seed": 0, "pruned_list": [1, 2, 3], "planted_mask": [2, 3, 9]},
            {"seed": 1, "pruned_list": [2, 3, 4], "planted_mask": [2, 3, 9]},
        ]
        a = protocol_analysis(runs)
        assert a["n_restarts"] == 2
        assert a["intersection"] == [2, 3]
        assert a["union_size"] == 4
        assert a["always_pruned_and_planted"] == [2, 3]
        assert a["planted_recovered_per_run"] == [2, 2]
        assert a["best_pruned_size"] == 3

    def test_empty_runs(self):
        assert protocol_analysis([]) == {"n_restarts": 0}


class TestRunProtocol:
    def test_all_seeds_land_and_persist(self, tmp_path):
        args = _args(tmp_path)
        seeds_run = []

        def runner(cmd, timeout, env):
            seed = int(cmd[cmd.index("--seed") + 1])
            seeds_run.append(seed)
            return _result(seed, [seed, 10])

        state = run_protocol(args, runner=runner)
        assert seeds_run == [0, 1, 2]
        assert [r["seed"] for r in state["runs"]] == [0, 1, 2]
        on_disk = json.loads((tmp_path / "state.json").read_text())
        assert on_disk["analysis"]["n_restarts"] == 3
        assert on_disk["analysis"]["intersection"] == [10]

    def test_resume_skips_completed_seeds(self, tmp_path):
        args = _args(tmp_path)
        run_protocol(args, runner=lambda c, timeout, env: _result(
            int(c[c.index("--seed") + 1]), [7]))
        seeds_run = []

        def runner(cmd, timeout, env):
            seed = int(cmd[cmd.index("--seed") + 1])
            seeds_run.append(seed)
            return _result(seed, [8])

        args2 = _args(tmp_path, restarts=5)
        state = run_protocol(args2, runner=runner)
        assert seeds_run == [3, 4]      # 0-2 already recorded
        assert len(state["runs"]) == 5

    def test_retry_then_land(self, tmp_path):
        args = _args(tmp_path, restarts=1, retries=2)
        calls = []

        def runner(cmd, timeout, env):
            calls.append(1)
            if len(calls) < 3:
                return SimpleNamespace(returncode=1, stdout="", stderr="",
                                       abandoned=False)
            return _result(0, [1])

        state = run_protocol(args, runner=runner)
        assert len(calls) == 3
        assert len(state["runs"]) == 1
        assert len(state["failures"]) == 2

    def test_abandoned_child_stops_everything(self, tmp_path):
        args = _args(tmp_path, restarts=3, retries=5)
        calls = []

        def runner(cmd, timeout, env):
            calls.append(1)
            return SimpleNamespace(returncode=-15, stdout="", stderr="",
                                   abandoned=True)

        state = run_protocol(args, runner=runner)
        assert len(calls) == 1          # no retry, no later seeds
        assert state["stopped_on_abandoned_child"] is True
        assert state["runs"] == []

    def test_mode_mismatch_refuses(self, tmp_path):
        args = _args(tmp_path, restarts=1)
        run_protocol(args, runner=lambda c, timeout, env: _result(0, [1]))
        with pytest.raises(SystemExit):
            run_protocol(_args(tmp_path, mode="8q"),
                         runner=lambda c, timeout, env: _result(0, [1]))

    def test_wall_budget_stops_between_restarts(self, tmp_path):
        args = _args(tmp_path, restarts=3, wall_budget=-1)

        def runner(cmd, timeout, env):   # should never be called
            raise AssertionError("runner called past the wall budget")

        state = run_protocol(args, runner=runner)
        assert state["runs"] == []

    def test_cpu_env_propagates(self, tmp_path):
        args = _args(tmp_path, restarts=1, cpu=True)
        seen = {}

        def runner(cmd, timeout, env):
            seen["env"] = env
            seen["cmd"] = cmd
            return _result(0, [1])

        run_protocol(args, runner=runner)
        assert seen["env"]["TNEQ_PLATFORM"] == "cpu"
        assert "--cpu" in seen["cmd"]
        assert "--attempt" in seen["cmd"]


def test_cli_smoke(tmp_path, capsys, monkeypatch):
    import tneq_tpu.bench.flagship_protocol as fp

    monkeypatch.setattr(
        fp, "run_term_bounded",
        lambda cmd, timeout, env: _result(
            int(cmd[cmd.index("--seed") + 1]), [3, 4]),
    )
    rc = main(["--mode", "pair", "--restarts", "2", "--cpu",
               "--out", str(tmp_path / "p.json"), "--retry-wait", "0"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["value"] == 2 and d["unit"] == "restarts"
