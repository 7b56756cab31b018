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
        retry_wait=0, wall_budget=0, regen_target=False,
        after_abandon=False,
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

    def test_deterministic_validation_failure_not_retried(self, tmp_path):
        # a --regen-target child whose every validation failed is
        # deterministic per (seed, restart): one failure record, no
        # retries, later seeds still run
        args = _args(tmp_path, restarts=2, retries=3, regen_target=True)
        calls = []

        def runner(cmd, timeout, env):
            calls.append(cmd)
            if len(calls) == 1:
                rec = {"config": "pair-8q5c-pair", "validated": False,
                       "restarts_run": 0, "pruned": 0, "pruned_list": [],
                       "planted_mask": [0, 1, 2], "wall_s": 1.0}
                return SimpleNamespace(
                    returncode=0, stdout="RESULT " + json.dumps(rec) + "\n",
                    stderr="", abandoned=False)
            return _result(1, [1])

        state = run_protocol(args, runner=runner)
        assert len(calls) == 2          # seed 0 once (no retry), seed 1 once
        assert len(state["failures"]) == 1
        assert state["failures"][0]["outcome"].startswith("no restart ran")
        assert [r["seed"] for r in state["runs"]] == [1]

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

    def test_settings_mismatch_refuses(self, tmp_path):
        args = _args(tmp_path, restarts=1)
        run_protocol(args, runner=lambda c, timeout, env: _result(0, [1]))
        with pytest.raises(SystemExit, match="settings"):
            run_protocol(_args(tmp_path, restarts=2, prune_steps=99),
                         runner=lambda c, timeout, env: _result(1, [1]))

    def test_legacy_state_without_settings_adopts(self, tmp_path):
        args = _args(tmp_path, restarts=1)
        run_protocol(args, runner=lambda c, timeout, env: _result(0, [1]))
        # simulate a state file from before settings were recorded
        p = tmp_path / "state.json"
        legacy = json.loads(p.read_text())
        legacy.pop("settings")
        p.write_text(json.dumps(legacy))
        state = run_protocol(_args(tmp_path, restarts=2),
                             runner=lambda c, timeout, env: _result(1, [1]))
        assert "settings" in state and len(state["runs"]) == 2

    def test_malformed_result_line_is_a_failed_attempt(self, tmp_path):
        args = _args(tmp_path, restarts=1, retries=1)
        calls = []

        def runner(cmd, timeout, env):
            calls.append(1)
            if len(calls) == 1:  # TERMed child truncated its RESULT line
                return SimpleNamespace(returncode=-15,
                                       stdout='RESULT {"pruned": 1',
                                       stderr="", abandoned=False)
            return _result(0, [1])

        state = run_protocol(args, runner=runner)
        assert len(calls) == 2
        assert len(state["runs"]) == 1
        assert "malformed RESULT" in state["failures"][0]["outcome"]

    def test_abandoned_resume_requires_override(self, tmp_path):
        args = _args(tmp_path, restarts=2, retries=0)
        calls = []

        def wedged_then_ok(cmd, timeout, env):
            calls.append(1)
            if len(calls) == 1:
                return SimpleNamespace(returncode=-15, stdout="", stderr="",
                                       abandoned=True)
            return _result(int(cmd[cmd.index("--seed") + 1]), [2])

        state = run_protocol(args, runner=wedged_then_ok)
        assert state["stopped_on_abandoned_child"] is True
        # plain resume refuses (a second client could hit the tunnel)
        with pytest.raises(SystemExit, match="abandon"):
            run_protocol(_args(tmp_path, restarts=2),
                         runner=wedged_then_ok)
        # explicit override resumes and clears the flag
        state = run_protocol(_args(tmp_path, restarts=2,
                                   after_abandon=True),
                             runner=wedged_then_ok)
        assert "stopped_on_abandoned_child" not in state
        assert len(state["runs"]) == 2 and state["complete"] is True

    def test_no_sleep_after_final_attempt(self, tmp_path, monkeypatch):
        import tneq_tpu.bench.flagship_protocol as fp

        sleeps = []
        monkeypatch.setattr(fp.time, "sleep", lambda s: sleeps.append(s))
        args = _args(tmp_path, restarts=1, retries=2, retry_wait=60)
        run_protocol(args, runner=lambda c, timeout, env: SimpleNamespace(
            returncode=1, stdout="", stderr="", abandoned=False))
        # 3 attempts, all fail: pause only BEFORE a follow-up spawn
        assert sleeps == [60, 60]

    def test_recovery_pause_crosses_seeds(self, tmp_path, monkeypatch):
        import tneq_tpu.bench.flagship_protocol as fp

        sleeps = []
        monkeypatch.setattr(fp.time, "sleep", lambda s: sleeps.append(s))
        calls = []

        def runner(cmd, timeout, env):
            calls.append(int(cmd[cmd.index("--seed") + 1]))
            if len(calls) == 1:  # seed 0's only attempt fails
                return SimpleNamespace(returncode=1, stdout="", stderr="",
                                       abandoned=False)
            return _result(calls[-1], [1])

        run_protocol(_args(tmp_path, restarts=2, retries=0, retry_wait=45),
                     runner=runner)
        # seed 1's first child spawns into a possibly-degraded channel:
        # the pause applies ACROSS seeds after a failure
        assert calls == [0, 1] and sleeps == [45]

    def test_empty_run_result_is_a_failed_attempt(self, tmp_path):
        """A --regen-target child whose every validation failed reports
        restarts_run=0 — recording it would poison the intersection."""
        args = _args(tmp_path, restarts=1, retries=0, regen_target=True)

        def runner(cmd, timeout, env):
            rec = {"config": "pair-8q5c-pair", "validated": False,
                   "restarts_run": 0, "pruned": 0, "pruned_list": [],
                   "planted_mask": [0], "wall_s": 1.0}
            return SimpleNamespace(
                returncode=0, stdout="RESULT " + json.dumps(rec) + "\n",
                stderr="", abandoned=False)

        state = run_protocol(args, runner=runner)
        assert state["runs"] == []
        assert "no restart ran" in state["failures"][0]["outcome"]
        assert state["complete"] is False

    def test_complete_tracks_requested_seed_range(self, tmp_path):
        args = _args(tmp_path, restarts=2)
        run_protocol(args, runner=lambda c, timeout, env: _result(
            int(c[c.index("--seed") + 1]), [1]))
        # continuation range where every child fails: NOT complete even
        # though len(runs) >= restarts
        state = run_protocol(
            _args(tmp_path, restarts=2, start_seed=2, retries=0),
            runner=lambda c, timeout, env: SimpleNamespace(
                returncode=1, stdout="", stderr="", abandoned=False))
        assert len(state["runs"]) == 2
        assert state["complete"] is False

    def test_backend_mismatch_refuses_via_device_inference(self, tmp_path):
        """A pre-'cpu'-setting state file holds device fields; resuming
        with the other backend must refuse, not adopt."""
        args = _args(tmp_path, restarts=1, cpu=True)

        def runner(cmd, timeout, env):
            r = _result(0, [1])
            rec = json.loads(r.stdout[len("RESULT "):])
            rec["device"] = "cpu"
            return SimpleNamespace(
                returncode=0, stdout="RESULT " + json.dumps(rec) + "\n",
                stderr="", abandoned=False)

        run_protocol(args, runner=runner)
        # simulate a state file written before "cpu" joined the settings
        p = tmp_path / "state.json"
        st = json.loads(p.read_text())
        st["settings"].pop("cpu")
        p.write_text(json.dumps(st))
        with pytest.raises(SystemExit, match="device"):
            run_protocol(_args(tmp_path, restarts=2, cpu=False),
                         runner=runner)

    def test_cpu_env_propagates(self, tmp_path):
        args = _args(tmp_path, restarts=1, cpu=True,
                     target_cache="/tmp/tc.pkl")
        seen = {}

        def runner(cmd, timeout, env):
            seen["env"] = env
            seen["cmd"] = cmd
            return _result(0, [1])

        run_protocol(args, runner=runner)
        assert seen["env"]["TNEQ_PLATFORM"] == "cpu"
        assert "--cpu" in seen["cmd"]
        assert "--attempt" in seen["cmd"]
        i = seen["cmd"].index("--target-cache")
        assert seen["cmd"][i + 1] == "/tmp/tc.pkl"


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
    assert d["complete"] is True and d["n_failures"] == 0


def test_cli_rc3_on_abandoned(tmp_path, capsys, monkeypatch):
    import tneq_tpu.bench.flagship_protocol as fp

    monkeypatch.setattr(
        fp, "run_term_bounded",
        lambda cmd, timeout, env: SimpleNamespace(
            returncode=-15, stdout="", stderr="", abandoned=True),
    )
    rc = main(["--mode", "pair", "--restarts", "2", "--cpu",
               "--out", str(tmp_path / "p.json"), "--retry-wait", "0"])
    assert rc == 3
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["stopped_on_abandoned_child"] is True
    assert d["complete"] is False


class TestProtocolCompare:
    def _state(self, rows, planted=(0, 1, 2, 9)):
        return {"runs": [
            {"seed": s, "pruned_list": sorted(lst),
             "planted_mask": sorted(planted)} for s, lst in rows
        ]}

    def test_per_seed_and_pooled(self):
        from tneq_tpu.bench.protocol_compare import compare_protocols
        a = self._state([(0, [1, 2, 3]), (1, [2, 3, 4]), (5, [0, 1])])
        b = self._state([(0, [1, 2, 3]), (1, [2, 3, 9])])
        rep = compare_protocols(a, b, "tpu", "cpu")
        assert rep["shared_seeds"] == [0, 1]
        assert rep["seeds_identical_set"] == 1
        assert rep["seeds_equal_size"] == 2
        r0, r1 = rep["per_seed"]
        assert r0["jaccard"] == 1.0 and r0["only_tpu"] == []
        assert r1["only_tpu"] == [4] and r1["only_cpu"] == [9]
        # planted = {0,1,2,9}: seed-1 tpu recovers {2}, cpu recovers {2,9}
        assert r1["planted_recovered_tpu"] == 1
        assert r1["planted_recovered_cpu"] == 2
        pooled = rep["pooled_family"]
        assert pooled["n_runs"] == 5  # 3 + 2, including tpu-only seed 5
        assert pooled["intersection_size"] == 0
        assert pooled["union_size"] == 6
        assert pooled["best_pruned_size"] == 3
        assert rep["mean_jaccard"] == round((1.0 + 2 / 4) / 2, 4)

    def test_no_shared_seeds(self):
        from tneq_tpu.bench.protocol_compare import compare_protocols
        rep = compare_protocols(self._state([(0, [1])]),
                                self._state([(1, [2])]))
        assert rep["n_shared"] == 0 and rep["mean_jaccard"] is None
        assert rep["pooled_family"]["n_runs"] == 2

    def test_equal_labels_rejected(self):
        from tneq_tpu.bench.protocol_compare import compare_protocols
        with pytest.raises(ValueError, match="collide"):
            compare_protocols(self._state([(0, [1])]),
                              self._state([(0, [2])]), "cpu", "cpu")

    def test_per_row_planted_masks(self, capsys):
        # regen-target runs may carry DIFFERENT masks: recovery counts
        # must use each run's own mask (ADVICE r3)
        from tneq_tpu.bench.protocol_compare import compare_protocols
        a = {"runs": [{"seed": 0, "pruned_list": [1, 2],
                       "planted_mask": [1, 5]}]}
        b = {"runs": [{"seed": 0, "pruned_list": [1, 2],
                       "planted_mask": [2, 7]}]}
        rep = compare_protocols(a, b, "tpu", "cpu")
        row = rep["per_seed"][0]
        assert row["planted_recovered_tpu"] == 1  # {1,2} ∩ {1,5}
        assert row["planted_recovered_cpu"] == 1  # {1,2} ∩ {2,7}
        assert rep["planted_masks_consistent"] is False
        assert "distinct planted_mask" in capsys.readouterr().err

    def test_inputs_snapshot_recorded(self):
        from tneq_tpu.bench.protocol_compare import compare_protocols
        a = self._state([(0, [1]), (3, [2])])
        a["mode"], a["date"] = "pair", "2026-08-19"
        rep = compare_protocols(a, self._state([(0, [1])]), "tpu", "cpu")
        snap = rep["inputs"]["tpu"]
        assert snap["n_runs"] == 2 and snap["seeds"] == [0, 3]
        assert snap["mode"] == "pair" and snap["date"] == "2026-08-19"
        assert rep["inputs"]["cpu"]["n_runs"] == 1

    def test_cli_rejects_equal_labels(self, tmp_path):
        from tneq_tpu.bench import protocol_compare
        pa = tmp_path / "a.json"
        pa.write_text(json.dumps(self._state([(0, [1])])))
        with pytest.raises(SystemExit):
            protocol_compare.main(["--a", str(pa), "--b", str(pa),
                                   "--label-a", "x", "--label-b", "x"])

    def test_cli_writes_artifact(self, tmp_path, capsys):
        from tneq_tpu.bench import protocol_compare
        pa, pb = tmp_path / "a.json", tmp_path / "b.json"
        pa.write_text(json.dumps(self._state([(0, [1, 2])])))
        pb.write_text(json.dumps(self._state([(0, [1, 3])])))
        out = tmp_path / "cmp.json"
        rc = protocol_compare.main([
            "--a", str(pa), "--b", str(pb), "--out", str(out)])
        assert rc == 0
        line = json.loads(capsys.readouterr().out.strip())
        assert line["metric"] == "protocol_backend_mean_jaccard"
        assert json.loads(out.read_text())["n_shared"] == 1
