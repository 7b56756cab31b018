"""Fitness-landscape calibration for the 30q structure-RECOVERY search.

GA_recover_r03 improved monotonically (−log F 7.82 → 6.89 over 20
generations, 5/29 bonds grown) but never recovered the planted bond-4
topology.  Before extending the search (VERDICT r3 item 6), measure the
landscape it is climbing: evaluate hand-built intermediate topologies with
k of the 29 interior bonds grown to the goal rank, at the search's own
evaluator budget, and the matched topology at a larger budget.

This answers, with numbers instead of guesses:
- the matched-topology floor (is fitness limited by the train budget?);
- the per-bond marginal fitness gain (does the GA have a monotone slope
  all the way to recovery, or does the signal vanish below evaluation
  noise at some k — a STRUCTURAL plateau?);
- the expected best-achievable fitness, so a recovery run has a defined
  success criterion.

Reference anchor: fitness = sparsity + 50·best_loss (``evolve.py:5-8``);
the reference never demonstrates recovery (its crossover is a stub).

Prints ONE JSON line; ``--out`` writes it.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def custom_bond_mps(n: int, bonds, phys: int = 2) -> str:
    """MPS DSL over ``n`` qubits with per-bond dims ``bonds[n-2]``
    (same layout as ``graph.generators.mps_graph``, non-uniform bonds)."""
    from tneq_tpu.graph.dsl import get_symbol

    if len(bonds) != n - 2:
        raise ValueError(f"need {n - 2} interior bond dims, got {len(bonds)}")
    lines = []
    for q in range(n):
        if q == 0:
            lines.append(f"-{phys}-{get_symbol(0)}-{phys}-")
        elif q == n - 1:
            lines.append(f"-{phys}-{get_symbol(n - 2)}-{phys}-")
        else:
            lines.append(
                f"-{phys}-{get_symbol(q - 1)}-{bonds[q - 1]}-"
                f"{get_symbol(q)}-{phys}-"
            )
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--qubits", type=int, default=30)
    ap.add_argument("--goal-rank", type=int, default=4)
    ap.add_argument("--base-rank", type=int, default=2)
    ap.add_argument("--train-steps", type=int, default=300,
                    help="the search's per-evaluation budget")
    ap.add_argument("--deep-steps", type=int, default=1500,
                    help="matched-topology floor at a generous budget")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--grown", type=str, default=None,
                    help="comma list: bonds grown to goal rank per probe "
                         "(default: 8 evenly spaced points 0..n-2 "
                         "inclusive; an n-qubit MPS has n-2 interior bonds)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    import os

    os.environ.setdefault("TNEQ_PLATFORM", "cpu")
    import numpy as np

    import tneq_tpu  # noqa: F401
    import jax

    jax.config.update("jax_platforms", os.environ["TNEQ_PLATFORM"])
    import jax.numpy as jnp

    from tneq_tpu.genetic import CandidateEvaluator, Individual
    from tneq_tpu.graph.dsl import parse_graph
    from tneq_tpu.model.qctn import init_params

    n, G, B = args.qubits, args.goal_rank, args.base_rank
    n_bonds = n - 2
    goal_src = custom_bond_mps(n, [G] * n_bonds)
    goal = parse_graph(goal_src)
    goal_params = init_params(goal, jax.random.PRNGKey(args.seed),
                              jnp.float32)

    evaluator = CandidateEvaluator(
        goal, goal_params,
        max_iterations=args.train_steps,
        method="adam", learning_rate=args.lr, loss="log_fidelity",
    )
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed + 1)

    if args.grown:
        grown_list = [int(x) for x in args.grown.split(",")]
    else:
        grown_list = sorted({round(i * n_bonds / 7) for i in range(8)})
    bad = [k for k in grown_list if not 0 <= k <= n_bonds]
    if bad:
        ap.error(f"--grown values {bad} outside [0, {n_bonds}]")
    rows = []
    for k in grown_list:
        grown_idx = sorted(rng.choice(n_bonds, size=k, replace=False))
        bonds = [B] * n_bonds
        for i in grown_idx:
            bonds[i] = G
        src = custom_bond_mps(n, bonds)
        ind = Individual(f"probe_k{k}", src, tn_rank=G)
        key, sub = jax.random.split(key)
        t0 = time.time()
        losses, iters, reason = evaluator.evaluate(
            src, sub, repeats=args.repeats
        )
        best = float(np.min(losses))
        fitness = ind.sparsity + 50.0 * best
        rows.append({
            "bonds_grown": k,
            "best_neg_logF": round(best, 5),
            "sparsity": round(ind.sparsity, 5),
            "fitness": round(fitness, 5),
            "iterations": iters,
            "wall_s": round(time.time() - t0, 1),
        })
        print(f"k={k}: -logF={best:.4f} sparsity={ind.sparsity:.3f} "
              f"fitness={fitness:.3f} ({rows[-1]['wall_s']}s)",
              file=sys.stderr, flush=True)

    # matched topology at a generous budget: the true floor
    deep = CandidateEvaluator(
        goal, goal_params, max_iterations=args.deep_steps,
        method="adam", learning_rate=args.lr, loss="log_fidelity",
    )
    key, sub = jax.random.split(key)
    t0 = time.time()
    losses, iters, _ = deep.evaluate(goal_src, sub, repeats=args.repeats)
    deep_floor = float(np.min(losses))
    print(f"matched deep ({args.deep_steps} steps): -logF={deep_floor:.4f} "
          f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    gains = [rows[i]["fitness"] - rows[i + 1]["fitness"]
             for i in range(len(rows) - 1)]
    rec = {
        "metric": f"ga_recovery_landscape_{n}q_rank{B}to{G}",
        "value": rows[-1]["fitness"],
        "unit": "matched-topology fitness at search budget",
        "goal_graph": goal_src,
        "seed": args.seed,
        "train_steps": args.train_steps,
        "repeats": args.repeats,
        "landscape": rows,
        "matched_deep_neg_logF": round(deep_floor, 5),
        "deep_steps": args.deep_steps,
        "monotone_decreasing": all(g > 0 for g in gains),
        "note": "fitness = sparsity + 50*(-logF), reference evolve.py:5-8; "
                "a monotone-decreasing landscape means the GA has signal "
                "all the way to recovery and the r03 plateau was "
                "pace-limited (1 mutation/child), not structural",
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
