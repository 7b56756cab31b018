"""Cross-backend comparison of flagship protocol runs.

The full-budget symmetry-breaking protocol (``flagship_protocol.py``) is
run once per backend (TPU pair-lowering vs CPU complex64) with the SAME
restart seed stream and the same validated planted target.  Backend
numerics alone flip pruning trajectories (CPU seed 0 reached 20/35 where
the TPU restart at the same seed got 19), so the per-seed comparison is
direct evidence for the solution-family reading of the experiment: the
acceptance rule (1-F < 1e-3 after refit, reference
``symmetry_breaking_quantum.py:184-242``) certifies a whole family of
maximal prunable sets, and which family member a restart lands on depends
on rounding as much as on the seed.

Usage::

    python -m tneq_tpu.bench.protocol_compare \
        --a FLAGSHIP_protocol_pair.json --b FLAGSHIP_protocol_pair_cpu.json \
        [--out FLAGSHIP_protocol_compare.json]

Prints ONE JSON summary line; ``--out`` writes the full artifact.
"""

from __future__ import annotations

import argparse
import json
import sys


def _runs_by_seed(state: dict) -> dict:
    return {r["seed"]: r for r in state.get("runs", [])
            if r.get("pruned_list") is not None}


def _jaccard(a: set, b: set) -> float:
    u = a | b
    return len(a & b) / len(u) if u else 1.0


def _input_snapshot(state: dict, runs: dict) -> dict:
    """Provenance of one input state file, embedded in the artifact so a
    reader can tell when the comparison is stale relative to the inputs
    (ADVICE r3: the compare artifact drifted from a protocol file that
    grew more seeds after the comparison ran)."""
    return {
        "n_runs": len(runs),
        "seeds": sorted(runs),
        "mode": state.get("mode"),
        "batched": state.get("batched"),
        "date": state.get("date"),
    }


def compare_protocols(state_a: dict, state_b: dict,
                      label_a: str = "a", label_b: str = "b") -> dict:
    """Per-seed and pooled comparison of two protocol state dicts.

    Only seeds present (landed) in BOTH states enter the per-seed rows;
    the pooled family analysis uses every landed run of both.  Planted
    recovery is computed against each RUN'S OWN recorded planted_mask
    (runs under regen-target protocols may carry different masks); a
    mask mismatch across runs is surfaced in ``planted_masks_consistent``.
    """
    if label_a == label_b:
        raise ValueError(
            f"label_a and label_b are both {label_a!r}: per-seed keys "
            f"would silently collide (pass distinct --label-a/--label-b)"
        )
    runs_a, runs_b = _runs_by_seed(state_a), _runs_by_seed(state_b)
    shared = sorted(set(runs_a) & set(runs_b))

    def _mask(run: dict) -> set:
        return set(run.get("planted_mask") or [])

    all_runs = list(runs_a.values()) + list(runs_b.values())
    masks = {tuple(sorted(_mask(r))) for r in all_runs}
    masks_consistent = len(masks) <= 1
    if not masks_consistent:
        print(f"warning: {len(masks)} distinct planted_mask values across "
              f"runs; planted-recovery counts are per-run, pooled "
              f"stable-core uses the first run's mask", file=sys.stderr)
    per_seed = []
    for s in shared:
        ra, rb = runs_a[s], runs_b[s]
        sa, sb = set(ra["pruned_list"]), set(rb["pruned_list"])
        per_seed.append({
            "seed": s,
            f"pruned_{label_a}": len(sa),
            f"pruned_{label_b}": len(sb),
            "jaccard": round(_jaccard(sa, sb), 4),
            "common": len(sa & sb),
            f"only_{label_a}": sorted(sa - sb),
            f"only_{label_b}": sorted(sb - sa),
            f"planted_recovered_{label_a}": len(sa & _mask(ra)),
            f"planted_recovered_{label_b}": len(sb & _mask(rb)),
        })
    all_sets = [set(r["pruned_list"]) for r in all_runs]
    planted = _mask(all_runs[0]) if all_runs else None
    pooled = {}
    if all_sets:
        inter = set.intersection(*all_sets)
        union = set.union(*all_sets)
        pooled = {
            "n_runs": len(all_sets),
            "intersection_size": len(inter),
            "intersection": sorted(inter),
            "union_size": len(union),
            "union_planted_recovered": len(union & planted),
            "stable_core_planted": sorted(inter & planted),
            "best_pruned_size": max(len(s) for s in all_sets),
        }
    return {
        "experiment": "flagship protocol backend comparison",
        "labels": [label_a, label_b],
        "inputs": {label_a: _input_snapshot(state_a, runs_a),
                   label_b: _input_snapshot(state_b, runs_b)},
        "planted_masks_consistent": masks_consistent,
        "shared_seeds": shared,
        "n_shared": len(shared),
        "per_seed": per_seed,
        "mean_jaccard": (round(sum(r["jaccard"] for r in per_seed)
                               / len(per_seed), 4) if per_seed else None),
        "seeds_equal_size": sum(
            1 for r in per_seed
            if r[f"pruned_{label_a}"] == r[f"pruned_{label_b}"]),
        "seeds_identical_set": sum(
            1 for r in per_seed if r["jaccard"] == 1.0),
        "pooled_family": pooled,
        "planted_size": len(planted) if planted is not None else None,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--a", required=True, help="first protocol state JSON")
    p.add_argument("--b", required=True, help="second protocol state JSON")
    p.add_argument("--label-a", default="tpu")
    p.add_argument("--label-b", default="cpu")
    p.add_argument("--out", default=None, help="write full artifact here")
    args = p.parse_args(argv)
    if args.label_a == args.label_b:
        p.error(f"--label-a and --label-b must differ (both {args.label_a!r})")
    with open(args.a) as f:
        state_a = json.load(f)
    with open(args.b) as f:
        state_b = json.load(f)
    rep = compare_protocols(state_a, state_b, args.label_a, args.label_b)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)
    print(json.dumps({
        "metric": "protocol_backend_mean_jaccard",
        "value": rep["mean_jaccard"],
        "unit": "jaccard",
        "n_shared_seeds": rep["n_shared"],
        "seeds_identical_set": rep["seeds_identical_set"],
        "pooled_intersection_size": rep["pooled_family"].get(
            "intersection_size"),
        "pooled_union_size": rep["pooled_family"].get("union_size"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
