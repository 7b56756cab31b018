"""Benchmark driver: run stages, write JSON, print a verdict table.

Analogue of ``tools/run_all_fugaku_tests.sh`` (interactive stage selection +
JSON summary): ``python -m tneq_tpu.bench.run_all --stages 1,2 --out results``.
Each stage is wrapped in a self-terminating alarm so a wedged accelerator
tunnel cannot hang the driver.
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
        rec["ok"] = True
        return rec
    except StageTimeout:
        return {"stage": name, "ok": False, "error": f"timeout after {timeout_s}s"}
    except Exception as e:
        return {"stage": name, "ok": False, "error": f"{type(e).__name__}: {e}"}
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main(argv=None):
    p = argparse.ArgumentParser(description="tneq_tpu benchmark stages")
    p.add_argument(
        "--stages",
        default="all",
        help="comma-separated stage-name prefixes (e.g. '1,2,6') or 'all'",
    )
    p.add_argument("--out", default="bench_results")
    p.add_argument("--timeout", type=int, default=300, help="per-stage seconds")
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

    # the suite's stages drive the real accelerator in-process: register
    # on the channel lockfile so probes/bench report BUSY, not DOWN
    from ._tpulock import register_cli

    register_cli(f"bench-suite stages={args.stages}")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
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
