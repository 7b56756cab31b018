"""Sequential vs batched pruning-sweep comparison (VERDICT r3 item 5).

The protocol's sequential sweep (``symmetry_breaking``) accepts the FIRST
candidate that refits under tol, in a seed-shuffled order — the reference's
accept-on-success semantics (``symmetry_breaking_quantum.py:189-241``).
The TPU-first batched sweep (``symmetry_breaking_batched``) scores ALL
remaining candidates in vmapped lockstep lanes and accepts the BEST
success per round.  Those acceptance orders differ BY CONSTRUCTION, so
trajectory equivalence is impossible; what this driver measures is
whether they land in the same SOLUTION FAMILY (pruned-set size + overlap)
and what the batched sweep buys in wall clock — the evidence needed to
either flip the protocol drivers to ``--batched`` or document why the
protocol must stay sequential.

Runs two ``bench.flagship`` children (same seed, same cached validated
target) back to back — TPU access stays serialized, each child holds the
tunnel lock for its lifetime.  Prints ONE JSON line; ``--out`` writes it.

Usage::

    python -m tneq_tpu.bench.batched_compare --mode pair \
        --target-cache /tmp/tneq_target_tpu.pkl [--seed 0] [--cpu] \
        [--out BATCHED_COMPARE_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _run_flagship(args, batched: bool) -> dict:
    # build the child command via flagship.child_cmd — the declared single
    # source of truth — so new result-affecting flagship flags cannot
    # silently drift between the protocol drivers and this comparison
    from .flagship import child_cmd

    child_args = argparse.Namespace(
        **vars(args), batched=batched, regen_target=False)
    cmd = child_cmd(child_args, restarts=1)
    env = dict(os.environ)
    if args.cpu:
        env["TNEQ_PLATFORM"] = "cpu"
    from ._subproc import run_term_bounded

    label = "batched" if batched else "sequential"
    t0 = time.time()
    r = run_term_bounded(cmd, timeout=args.budget + 180, env=env)
    wall = time.time() - t0
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("RESULT "):
            rec = json.loads(line[len("RESULT "):])
            if "pruned_list" not in rec:
                raise RuntimeError(
                    f"flagship ({label}) returned a result without a "
                    f"pruned_list (rc={r.returncode}): {rec}")
            rec["_wall_s"] = round(wall, 1)
            return rec
    raise RuntimeError(
        f"flagship ({label}) produced no result (rc={r.returncode})"
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--mode", choices=["8q", "pair"], default="pair")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--validate-steps", type=int, default=3000)
    p.add_argument("--prune-steps", type=int, default=2000)
    p.add_argument("--lane-chunk", type=int, default=8)
    p.add_argument("--max-outer", type=int, default=3)
    p.add_argument("--sync-every", type=int, default=8)
    p.add_argument("--jit-scope", default="chunk",
                   choices=["fit", "step", "chunk"])
    p.add_argument("--budget", type=int, default=5400)
    p.add_argument("--target-cache", type=str, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    seq = _run_flagship(args, batched=False)
    bat = _run_flagship(args, batched=True)

    s_set, b_set = set(seq["pruned_list"]), set(bat["pruned_list"])
    union = s_set | b_set
    planted = set(seq.get("planted_mask") or [])
    rec = {
        "metric": "batched_vs_sequential_prune",
        "value": round(seq["_wall_s"] / bat["_wall_s"], 3)
        if bat["_wall_s"] else None,
        "unit": "sequential/batched wall ratio (>1 = batched faster)",
        "mode": args.mode,
        "seed": args.seed,
        "device": bat.get("device"),
        "sequential": {
            "pruned": sorted(s_set), "n": len(s_set),
            "attempts": seq.get("prune_attempts"),
            "prune_s": seq.get("prune_s"), "wall_s": seq["_wall_s"],
        },
        "batched": {
            "pruned": sorted(b_set), "n": len(b_set),
            "attempts": bat.get("prune_attempts"),
            "prune_s": bat.get("prune_s"), "wall_s": bat["_wall_s"],
        },
        "jaccard": round(len(s_set & b_set) / len(union), 4)
        if union else 1.0,
        "equal_size": len(s_set) == len(b_set),
        "identical_set": s_set == b_set,
        "planted_recovered_sequential": len(s_set & planted),
        "planted_recovered_batched": len(b_set & planted),
        "settings": {
            "validate_steps": args.validate_steps,
            "prune_steps": args.prune_steps,
            "lane_chunk": args.lane_chunk,
            "max_outer": args.max_outer,
            "sync_every": args.sync_every,
            "jit_scope": args.jit_scope,
            "target_cache": bool(args.target_cache),
        },
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
