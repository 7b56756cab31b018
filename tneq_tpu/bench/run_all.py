"""Benchmark driver: run stages, write JSON, print a verdict table.

Analogue of ``tools/run_all_fugaku_tests.sh`` (interactive stage selection +
JSON summary): ``python -m tneq_tpu.bench.run_all --stages 1,2 --out results``.
Each stage is wrapped in a self-terminating alarm so a wedged accelerator
tunnel cannot hang the driver.

``--isolate`` runs each stage in a FRESH subprocess instead of in-process.
On this container's axon tunnel one ``UNIMPLEMENTED`` poisons the whole
PJRT client (CLAUDE.md), so a single bad stage dooms every stage after it
in an in-process run; isolation confines the damage to the one stage at
the cost of a first-fetch per stage.  Children merge their rows into
``summary.json`` one at a time (subset-merge semantics), so an isolated
run can also re-drive just the failed stages of an earlier run.
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
import time
from pathlib import Path

from .microbench import ALL_STAGES


class StageTimeout(Exception):
    pass


def _run_stage(name, fn, timeout_s: int):
    def handler(signum, frame):
        raise StageTimeout(name)

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(timeout_s)
    t0 = time.time()
    try:
        rec = fn()
        rec["wall_time_s"] = round(time.time() - t0, 2)
        # respect an explicit verdict from the stage (e.g. a subprocess
        # stage propagating its child's failure record) — stamping True
        # here turned a refused flagship child (rc=4) into a green row
        rec["ok"] = rec.get("ok", True)
        # the suite stage id is authoritative: a stage fn's internal key
        # (e.g. 'flagship_32q') must not leak into the '9_flagship_32q'
        # artifact/summary namespace (ADVICE r4)
        rec["stage"] = name
        return rec
    except StageTimeout:
        return {"stage": name, "ok": False, "error": f"timeout after {timeout_s}s"}
    except Exception as e:
        return {"stage": name, "ok": False, "error": f"{type(e).__name__}: {e}"}
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _run_isolated(selected, out_dir: Path, timeout_s: int) -> int:
    """One fresh subprocess per stage; each child does a subset run that
    merges its row into summary.json.  The parent holds no lock (children
    register) and TERM-bounds each child — never SIGKILL, a killed client
    wedges the tunnel.  A child that finds the channel busy (exit 4) gets
    one retry after a minute."""
    from ._subproc import run_term_bounded
    from ._tpulock import priority_requested

    # budget must cover a patient first fetch (has blocked ~900s and then
    # succeeded) on top of the stage's own alarm
    child_timeout = timeout_s + 1000
    for name in selected:
        notified = False
        while priority_requested() is not None:
            # the round-end bench.py run posted its priority flag: let it
            # have the channel before we spawn the next stage child
            if not notified:
                print("  bench priority posted; pausing between stages",
                      flush=True)
                notified = True
            time.sleep(30)
        print(f"=== {name} (isolated) ===", flush=True)
        for attempt in range(4):
            r = run_term_bounded(
                [sys.executable, "-m", "tneq_tpu.bench.run_all",
                 "--stages", name, "--out", str(out_dir),
                 "--timeout", str(timeout_s)],
                timeout=child_timeout,
            )
            if r.returncode == 4:
                print("  channel busy; retrying in 60s", flush=True)
                time.sleep(60)
                continue
            # a stage whose measurement child YIELDED mid-run to a
            # bench-priority flag records rc=5 in its row (flagship main
            # propagates it); that is not a failure — wait for the flag
            # to clear, then re-drive the stage
            try:
                row = json.loads((out_dir / f"{name}.json").read_text())
            except (OSError, ValueError):
                row = {}
            if row.get("rc") == 5 and not row.get("ok"):
                print("  stage yielded to bench priority; waiting for "
                      "the flag to clear", flush=True)
                while priority_requested() is not None:
                    time.sleep(30)
                continue
            break
        rec_path = out_dir / f"{name}.json"
        if r.returncode == -15 or getattr(r, "abandoned", False):
            # the child died to the parent's TERM (wedged in backend init,
            # which no alarm can interrupt) — record the failure ourselves
            rec = {"stage": name, "ok": False,
                   "error": f"isolated child wedged (>{child_timeout}s)"}
            rec_path.write_text(json.dumps(rec, indent=2))
            _merge_summary_row(out_dir, {"stage": name, "ok": False})
            print("  FAILED: child wedged/TERMed", flush=True)
            if getattr(r, "abandoned", False):
                # the child is STILL RUNNING (survived both TERMs, e.g.
                # blocked in backend init) and still owns the channel —
                # spawning more children would violate one-client-at-a-time
                print("  child abandoned but alive; stopping the isolated "
                      "run to keep TPU access serialized", flush=True)
                break
        else:
            tail = (r.stdout or "").strip().splitlines()
            print(f"  child rc={r.returncode}"
                  + (f": {tail[-2]}" if len(tail) >= 2 else ""), flush=True)
    try:
        summary = json.loads((out_dir / "summary.json").read_text())
    except (OSError, ValueError):
        summary = []
    rows = {s.get("stage"): s for s in summary}
    n_ok = sum(1 for n in selected if rows.get(n, {}).get("ok"))
    print(f"{n_ok}/{len(selected)} stages ok; results in {out_dir}/")
    return 0 if n_ok == len(selected) else 2


def _merge_summary_row(out_dir: Path, row: dict) -> None:
    """Insert/update one stage row in summary.json (ALL_STAGES order)."""
    path = out_dir / "summary.json"
    try:
        prior = {s["stage"]: s for s in json.loads(path.read_text())}
    except (OSError, ValueError, KeyError, TypeError):
        prior = {}
    prior[row["stage"]] = row
    path.write_text(json.dumps(
        [prior[k] for k in ALL_STAGES if k in prior], indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(description="tneq_tpu benchmark stages")
    p.add_argument(
        "--stages",
        default="all",
        help="comma-separated stage-name prefixes (e.g. '1,2,6') or 'all'",
    )
    p.add_argument("--out", default="bench_results")
    p.add_argument("--timeout", type=int, default=300, help="per-stage seconds")
    p.add_argument("--isolate", action="store_true",
                   help="one fresh subprocess per stage (poison containment)")
    args = p.parse_args(argv)

    if args.stages == "all":
        selected = dict(ALL_STAGES)
    else:
        prefixes = [s.strip() for s in args.stages.split(",")]
        selected = {
            k: v
            for k, v in ALL_STAGES.items()
            if any(k.startswith(pfx) for pfx in prefixes)
        }
    if not selected:
        print(f"no stages match {args.stages!r}; have {list(ALL_STAGES)}")
        return 1

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.isolate:
        return _run_isolated(selected, out_dir, args.timeout)

    # the suite's stages drive the real accelerator in-process: register
    # on the channel lockfile so probes/bench report BUSY, not DOWN
    from ._tpulock import register_cli

    register_cli(f"bench-suite stages={args.stages}")

    summary = []
    for name, fn in selected.items():
        print(f"=== {name} ===", flush=True)
        rec = _run_stage(name, fn, args.timeout)
        (out_dir / f"{name}.json").write_text(json.dumps(rec, indent=2))
        if rec.get("skipped"):
            # say loudly when a stage could not actually measure anything
            # (e.g. collectives on a 1-chip bench host) — perf claims for
            # the skipped path rest on the virtual-mesh tests, not this run
            status = f"SKIPPED (not measured here): {rec['skipped']}"
        elif rec.get("ok"):
            status = "ok"
        else:
            status = f"FAILED: {rec.get('error')}"
        print(f"  {status} ({rec.get('wall_time_s', '-')}s)", flush=True)
        summary.append({
            "stage": name,
            "ok": rec.get("ok", False),
            **({"skipped": rec["skipped"]} if rec.get("skipped") else {}),
        })
    # a subset run (--stages 6) merges into an existing summary rather than
    # clobbering the full-suite record: update matching rows, keep the rest
    summary_path = out_dir / "summary.json"
    if args.stages != "all" and summary_path.exists():
        try:
            prior = {s["stage"]: s for s in json.loads(summary_path.read_text())}
        except (ValueError, KeyError, TypeError):
            prior = {}
        prior.update({s["stage"]: s for s in summary})
        summary = [prior[k] for k in ALL_STAGES if k in prior]
    summary_path.write_text(json.dumps(summary, indent=2))
    n_ok = sum(s["ok"] for s in summary)
    print(f"{n_ok}/{len(summary)} stages ok; results in {out_dir}/")
    return 0 if n_ok == len(summary) else 2


if __name__ == "__main__":
    sys.exit(main())
