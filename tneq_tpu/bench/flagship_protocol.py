"""Full-budget flagship protocol driver: N independent symmetry-breaking
restarts, one fresh child process per restart, RESUMABLE across channel
outages.

The reference protocol (``/root/reference/train.py:62-76``) runs 20
symmetry-breaking restarts against one validated planted target and keeps
the best pruned set.  A single-process 20-restart run is infeasible under
the axon channel protocol (CLAUDE.md): one child must stay under its alarm
budget, and an outage mid-run would lose every completed restart.  This
driver therefore runs ONE ``flagship --attempt`` child per restart seed
(fresh subprocess, TERM-only bound, never SIGKILL), appends each child's
RESULT record to the state JSON **as it lands**, and on startup skips
seeds already recorded — so an interrupted protocol run resumes where it
stopped and a channel outage costs at most the in-flight restart.

The merged output is the FLAGSHIP artifact format (``runs`` +
solution-family ``analysis``: intersection / union / planted overlap of
the per-restart pruned sets).

Usage::

    python -m tneq_tpu.bench.flagship_protocol --mode pair --restarts 20 \
        --out FLAGSHIP_protocol.json [--batched] [--cpu]

Prints ONE JSON line (the analysis summary) when it stops.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from ._subproc import run_term_bounded

CHILD_BUDGET_S = 5400  # per-restart child (FLAGSHIP_r03 walls: 2267-4478 s)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _yield_to_bench(args, deadline) -> bool:
    """Pause while a live bench-priority request is posted.

    The round-end driver's ``bench.py`` run must not starve behind this
    driver's back-to-back restarts (each can hold the channel ~an hour);
    ``bench.py`` posts the flag, we finish the in-flight child and wait
    here before spawning the next one.  CPU-forced protocols never touch
    the channel and never pause.  Returns True if the wall deadline
    expired while waiting.
    """
    if args.cpu:
        return False
    from ._tpulock import priority_requested

    notified = False
    while True:
        prio = priority_requested()
        if prio is None:
            return False
        if deadline and time.time() > deadline:
            return True
        if not notified:
            log(f"bench priority posted (pid={prio.get('pid')} "
                f"tag={prio.get('tag')!r}); pausing before the next child")
            notified = True
        time.sleep(30)


def protocol_analysis(runs: list, planted=None) -> dict:
    """Solution-family analysis over per-restart RESULT records.

    Mirrors the FLAGSHIP_r03 analysis block: sizes, per-run planted
    overlap, intersection (the restart-stable core), union, and the
    always-pruned-and-planted set.  ``planted`` defaults to the mask
    recorded in the runs themselves.
    """
    ok_runs = [r for r in runs if r.get("pruned_list") is not None]
    if not ok_runs:
        return {"n_restarts": 0}
    if planted is None:
        planted = ok_runs[0].get("planted_mask") or []
    sets = [set(r["pruned_list"]) for r in ok_runs]
    inter = set.intersection(*sets) if sets else set()
    union = set.union(*sets) if sets else set()
    best = max(ok_runs, key=lambda r: len(r["pruned_list"]))
    return {
        "n_restarts": len(ok_runs),
        "pruned_sizes": [len(s) for s in sets],
        "best_pruned_size": len(best["pruned_list"]),
        "best_pruned_list": sorted(best["pruned_list"]),
        "best_seed": best.get("seed"),
        "planted_size": len(planted),
        "planted_recovered_per_run": [
            len(s & set(planted)) for s in sets
        ],
        "intersection_size": len(inter),
        "intersection": sorted(inter),
        "union_size": len(union),
        "always_pruned_and_planted": sorted(inter & set(planted)),
    }


def _child_cmd(args, seed: int) -> list:
    from .flagship import child_cmd

    return child_cmd(args, seed=seed, restarts=1)


# result-affecting knobs: a resume mixing different values of any of these
# would merge incomparable restarts into one solution-family analysis.
# "cpu" is result-affecting too: backend numerics alone flip pruning
# trajectories (CPU seed 0 reached 20/35 where three TPU restarts got 19).
RESULT_SETTINGS = ("validate_steps", "prune_steps", "lane_chunk",
                   "max_outer", "sync_every", "jit_scope", "regen_target",
                   "cpu")


def _settings(args) -> dict:
    return {k: bool(getattr(args, k)) if k in ("regen_target", "cpu")
            else getattr(args, k) for k in RESULT_SETTINGS}


def _load_state(path: str, args) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            state = json.load(f)
        if state.get("mode") != args.mode or state.get(
            "batched"
        ) != bool(args.batched):
            raise SystemExit(
                f"state file {path} records mode={state.get('mode')} "
                f"batched={state.get('batched')}; refusing to mix with "
                f"--mode {args.mode} batched={bool(args.batched)} "
                f"(use a different --out)"
            )
        if "settings" in state:
            cur = _settings(args)
            rec = dict(state["settings"])
            # keys added to RESULT_SETTINGS after a state file was
            # created are adopted (warn); keys present must match exactly
            missing = [k for k in cur if k not in rec]
            if missing:
                # "cpu" can be inferred from the recorded runs' device
                # fields — never adopt a backend that contradicts them
                if "cpu" in missing:
                    devices = {r.get("device") for r in state.get("runs", [])
                               if r.get("device")}
                    if devices:
                        was_cpu = all(
                            str(d).startswith("cpu") for d in devices
                        )
                        if was_cpu != cur["cpu"]:
                            raise SystemExit(
                                f"state file {path} holds restarts from "
                                f"device(s) {sorted(devices)}; refusing to "
                                f"mix with cpu={cur['cpu']} (use a "
                                f"different --out)"
                            )
                log(f"warning: {path} settings predate "
                    f"{missing}; adopting current value(s) "
                    f"{ {k: cur[k] for k in missing} }")
                for k in missing:
                    rec[k] = cur[k]
                state["settings"] = rec
            if rec != cur:
                raise SystemExit(
                    f"state file {path} records settings {rec}; refusing "
                    f"to mix with {cur} — restarts under different "
                    f"protocols are not comparable (use a different --out)"
                )
        else:  # legacy state file from before settings were recorded
            log(f"warning: {path} predates settings recording; adopting "
                f"the current flags {_settings(args)} as its settings")
            state["settings"] = _settings(args)
        if state.get("stopped_on_abandoned_child"):
            if not args.after_abandon:
                raise SystemExit(
                    f"state file {path} records a previous run stopped on "
                    f"an ABANDONED (still-alive, TERM-proof) child — a "
                    f"second client on the tunnel violates the "
                    f"serialize-TPU-access rule. Verify that child is gone "
                    f"(or the terminal restarted), then re-run with "
                    f"--after-abandon."
                )
            log("resuming past a previous abandoned child "
                "(--after-abandon); clearing the stop flag")
            state.pop("stopped_on_abandoned_child", None)
        log(f"resuming from {path}: {len(state.get('runs', []))} "
            f"restart(s) already recorded")
        return state
    return {
        "experiment": (
            f"symmetry_breaking {args.mode} flagship protocol "
            f"(8q x 5c, per-restart child processes)"
        ),
        "protocol": (
            "reference train.py protocol at full restart budget: one "
            "validated planted target (seed-0 keyed, identical across "
            "children), independent restarts via --seed, one fresh child "
            "process per restart (resumable; channel outage costs at most "
            "the in-flight restart). Reference runs 20 restarts "
            "(train.py:62-76)."
        ),
        "mode": args.mode,
        "batched": bool(args.batched),
        "settings": _settings(args),
        "date": time.strftime("%Y-%m-%d"),
        "runs": [],
        "failures": [],
    }


def _save_state(path: str, state: dict) -> None:
    state["analysis"] = protocol_analysis(state["runs"])
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, path)


def run_protocol(args, runner=None) -> dict:
    """Drive up to ``args.restarts`` per-seed children, persisting state
    after every completed restart.  ``runner`` is injectable for tests."""
    if runner is None:
        runner = run_term_bounded
    state = _load_state(args.out, args)
    state.pop("wall_budget_exhausted", None)
    state.pop("complete", None)
    done = {r["seed"] for r in state["runs"]}
    deadline = (
        time.time() + args.wall_budget if args.wall_budget else None
    )
    prev_failed = False
    for seed in range(args.start_seed, args.start_seed + args.restarts):
        if seed in done:
            continue
        if deadline and time.time() > deadline:
            log(f"wall budget exhausted before seed {seed}; stopping "
                f"(resume with the same --out)")
            state["wall_budget_exhausted"] = True
            break
        landed = False
        attempt = 0
        yields = 0
        # rc 4/5 children are non-measurements (busy / yielded to bench
        # priority): they must not consume the per-seed retry budget, or
        # one long bench run would burn every attempt and skip the seed —
        # but they ARE bounded (deadline + this cap) so a stuck flag
        # cannot spin forever on a wall-unbounded invocation
        max_yields = 20
        while attempt < 1 + args.retries and yields < max_yields:
            if deadline and time.time() > deadline:
                state["wall_budget_exhausted"] = True
                break
            if prev_failed and args.retry_wait:
                # recovery pause before ANY child that follows a failed
                # one (including across seeds — a degraded channel takes
                # minutes to come back; CLAUDE.md)
                log(f"waiting {args.retry_wait}s before the next attempt")
                time.sleep(args.retry_wait)
                prev_failed = False
            if _yield_to_bench(args, deadline):
                state["wall_budget_exhausted"] = True
                break
            log(f"--- restart seed={seed} attempt {attempt + 1}/"
                f"{1 + args.retries} ---")
            env = dict(os.environ)
            if args.cpu:
                env["TNEQ_PLATFORM"] = "cpu"
            r = runner(_child_cmd(args, seed), timeout=args.budget + 120,
                       env=env)
            if getattr(r, "abandoned", False):
                # the child survived both TERMs and is still alive on the
                # tunnel — spawning another would put two clients on the
                # channel (CLAUDE.md: serialize TPU access)
                log("child wedged and abandoned (still alive); stopping "
                    "the protocol run")
                state["failures"].append(
                    {"seed": seed, "outcome": "abandoned"}
                )
                state["stopped_on_abandoned_child"] = True
                _save_state(args.out, state)
                return state
            if r.returncode in (4, 5):
                # 4: the child refused to start (channel busy, or a
                #    priority flag posted after our top-of-loop check);
                # 5: the child YIELDED mid-run to a bench-priority flag
                #    (partial restart discarded, channel freed within one
                #    chunk — VERDICT r4 #1).
                # Neither is a failed measurement; wait (the top-of-loop
                # _yield_to_bench absorbs a live flag) and retry the SAME
                # seed without consuming a measurement attempt.
                yields += 1
                log("child "
                    + ("yielded mid-run to bench priority"
                       if r.returncode == 5
                       else "refused to start (channel busy/yielded)")
                    + "; not recording a failure")
                time.sleep(30)
                continue
            attempt += 1
            rec = None
            outcome = f"rc={r.returncode}"
            for line in r.stdout.splitlines():
                if line.startswith("RESULT "):
                    try:
                        rec = json.loads(line[len("RESULT "):])
                    except json.JSONDecodeError:
                        # a TERMed child can leave a truncated RESULT
                        # line; record it as a failed attempt instead of
                        # crashing the unattended multi-hour run
                        rec = None
                        outcome = f"rc={r.returncode} (malformed RESULT)"
            deterministic_failure = False
            if rec is not None and rec.get("restarts_run") == 0:
                # a --regen-target child whose every validation failed
                # produced no restart: marking the seed done would poison
                # the intersection analysis with an empty pruned set.
                # The regen key stream is per-(seed, restart)
                # deterministic, so retrying re-runs the identical failing
                # computation — record once and move on
                rec = None
                outcome = "no restart ran (all target validations failed)"
                deterministic_failure = True
            if rec is not None:
                rec["seed"] = seed
                state["runs"].append(rec)
                _save_state(args.out, state)
                log(f"restart seed={seed}: pruned {rec.get('pruned')} "
                    f"cores in {rec.get('wall_s')}s "
                    f"({len(state['runs'])} restart(s) recorded)")
                landed = True
                prev_failed = False
                break
            log(f"restart seed={seed} attempt failed ({outcome})")
            state["failures"].append({"seed": seed, "outcome": outcome})
            _save_state(args.out, state)
            if deterministic_failure:
                log(f"restart seed={seed}: validation failure is "
                    f"deterministic; not retrying")
                prev_failed = False
                break
            prev_failed = True
        if not landed:
            log(f"restart seed={seed}: no attempt landed; moving on")
    done = {r["seed"] for r in state["runs"]}
    state["complete"] = all(
        s in done
        for s in range(args.start_seed, args.start_seed + args.restarts)
    )
    _save_state(args.out, state)
    return state


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--mode", choices=["8q", "pair"], default="pair")
    p.add_argument("--restarts", type=int, default=20,
                   help="total restart seeds (reference budget: 20)")
    p.add_argument("--start-seed", type=int, default=0)
    p.add_argument("--out", default="FLAGSHIP_protocol.json",
                   help="state/artifact JSON (resume source)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batched", action="store_true",
                   help="greedy-best vmapped candidate scoring instead of "
                        "the reference's first-success order")
    p.add_argument("--regen-target", action="store_true",
                   help="each restart child generates + validates its own "
                        "planted target (full reference train.py protocol) "
                        "instead of the shared seed-0 target")
    p.add_argument("--after-abandon", action="store_true",
                   help="resume a state file whose previous run stopped on "
                        "an abandoned (still-alive) child — only after "
                        "verifying that child is gone")
    p.add_argument("--target-cache", type=str, default=None,
                   help="shared validated-target memo file for the "
                        "children (deterministic replay; the first child "
                        "writes it, later children skip re-validation)")
    p.add_argument("--validate-steps", type=int, default=3000)
    p.add_argument("--prune-steps", type=int, default=2000)
    p.add_argument("--lane-chunk", type=int, default=8)
    p.add_argument("--max-outer", type=int, default=3)
    p.add_argument("--sync-every", type=int, default=8)
    p.add_argument("--jit-scope", choices=["fit", "step", "chunk"],
                   default="chunk")
    p.add_argument("--budget", type=int, default=CHILD_BUDGET_S,
                   help="per-child wall budget (seconds)")
    p.add_argument("--retries", type=int, default=2,
                   help="extra attempts per seed after a failed child")
    p.add_argument("--retry-wait", type=int, default=600,
                   help="seconds between attempts (channel recovery time)")
    p.add_argument("--wall-budget", type=int, default=0,
                   help="overall wall budget in seconds (0 = unlimited); "
                        "stops cleanly between restarts when exceeded")
    args = p.parse_args(argv)

    state = run_protocol(args)
    summary = dict(state.get("analysis", {}))
    summary["metric"] = f"flagship_protocol_{args.mode}_restarts"
    summary["value"] = summary.get("n_restarts", 0)
    summary["unit"] = "restarts"
    # make a halted run distinguishable from a completed one (callers and
    # watcher loops key off these + the return code)
    summary["complete"] = bool(state.get("complete"))
    summary["n_failures"] = len(state.get("failures", []))
    if state.get("stopped_on_abandoned_child"):
        summary["stopped_on_abandoned_child"] = True
    if state.get("wall_budget_exhausted"):
        summary["wall_budget_exhausted"] = True
    print(json.dumps(summary))
    return 3 if state.get("stopped_on_abandoned_child") else 0


if __name__ == "__main__":
    sys.exit(main())
