"""Stiefel-stalls-on-chains: the receipts for the MPS optimizer deviation.

The reference protocol fits with Stiefel SGD-G
(``/root/reference/symmetry_breaking_quantum.py:156``); the MPS-topology
flagship (``bench/mps_flagship.py``) uses adam instead, resting on a
measured-but-undocumented claim (``apps/symmetry_breaking.py``
SymmetryBreakingConfig.optimizer): the Stiefel-constrained fidelity flow
on CHAIN cores stalls at F≈0.85 critical points, lr-independently, while
unconstrained adam converges to 1-F < tol in a few hundred steps.
VERDICT r4 weak-#4 / next-#7: a protocol deviation needs its own
artifact, not an assertion in a comment.

This driver plants a transparent-core MPS target and runs the SAME
validate fit (same init, same target, same step program) under Stiefel
SGD-G at several learning rates and under adam, recording the fidelity
trajectory of each (the chunked fit is deterministic per seed, so fits
truncated at increasing step counts are points ON one trajectory — no
instrumentation of the jitted loop needed).  Brick-wall topology with
the same protocol converges under SGD-G (the 8q flagship artifacts), so
the stall is specific to the chain manifold geometry, not to SGD-G.

CPU-sized by default (12q, D=8).  Prints ONE JSON line; ``--out`` writes
the artifact, ``--plot`` a fidelity-vs-steps PNG.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def trajectory(make_cfg, optimizer, lr, checkpoints, seed):
    """Final fidelity after each step count in ``checkpoints`` — cold
    fits from one deterministic (seed-keyed) init/target, which the
    chunked driver makes prefix-consistent."""
    import jax

    from tneq_tpu.apps.symmetry_breaking import (
        make_experiment,
        target_tensor_init,
    )

    fids = []
    for steps in checkpoints:
        exp = make_experiment(make_cfg(optimizer, lr, steps))
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        target = target_tensor_init(exp, [exp.candidate_indices()[0]], k1)
        res = exp.run_fit(
            exp.validate_fit, exp.init_params(k2), exp.mask_vector([]),
            target,
        )
        fids.append(1.0 - float(res.infidelity))
    return fids


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--qubits", type=int, default=12)
    ap.add_argument("--dim", type=int, default=8)
    ap.add_argument("--checkpoints", type=str, default="250,500,1000,2000,4000")
    ap.add_argument("--sgdg-lrs", type=str, default="0.1,0.03,0.01")
    ap.add_argument("--adam-lr", type=float, default=3e-2)
    ap.add_argument("--seeds", type=str, default="0,1")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--plot", type=str, default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from tneq_tpu.apps.symmetry_breaking import SymmetryBreakingConfig

    checkpoints = [int(s) for s in args.checkpoints.split(",")]
    sgdg_lrs = [float(s) for s in args.sgdg_lrs.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]

    def make_cfg(optimizer, lr, steps):
        return SymmetryBreakingConfig(
            n_qubits=args.qubits,
            rank=2,
            topology="mps",
            bond_dim=args.dim,
            fidelity_mode="network",
            dtype=jnp.float32,
            optimizer=optimizer,
            validate_lr=lr,
            validate_steps=steps,
            matmul_precision="highest",
            fit_jit_scope="chunk",
            fit_sync_every=8,
            tol=args.tol,
        )

    t0 = time.time()
    curves = []
    for seed in seeds:
        for lr in sgdg_lrs:
            fids = trajectory(make_cfg, "sgdg", lr, checkpoints, seed)
            curves.append({"optimizer": "sgdg", "lr": lr, "seed": seed,
                           "fidelities": fids})
            print(f"sgdg lr={lr} seed={seed}: {fids}", file=sys.stderr,
                  flush=True)
        fids = trajectory(make_cfg, "adam", args.adam_lr, checkpoints, seed)
        curves.append({"optimizer": "adam", "lr": args.adam_lr,
                       "seed": seed, "fidelities": fids})
        print(f"adam lr={args.adam_lr} seed={seed}: {fids}",
              file=sys.stderr, flush=True)

    sgdg_best = max(c["fidelities"][-1] for c in curves
                    if c["optimizer"] == "sgdg")
    adam_worst = min(c["fidelities"][-1] for c in curves
                     if c["optimizer"] == "adam")
    rec = {
        "metric": "stiefel_stall_gap",
        # the stall gap: best SGD-G final fidelity vs worst adam final
        "value": round(adam_worst - sgdg_best, 6),
        "unit": "fidelity_gap",
        "experiment": (
            f"{args.qubits}q D={args.dim} MPS network-fidelity validate "
            f"fit, planted transparent-core target, {checkpoints[-1]} "
            f"steps"
        ),
        "claim": (
            "Stiefel SGD-G stalls on chain cores lr-independently while "
            "unconstrained adam converges (the documented optimizer "
            "deviation of bench/mps_flagship from the reference "
            "protocol, symmetry_breaking_quantum.py:156)"
        ),
        "checkpoints": checkpoints,
        "curves": curves,
        "sgdg_best_final_fidelity": round(sgdg_best, 6),
        "adam_worst_final_fidelity": round(adam_worst, 6),
        "tol": args.tol,
        "stall_confirmed": bool(
            sgdg_best < 1.0 - args.tol <= adam_worst
        ),
        "wall_s": round(time.time() - t0, 1),
    }
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        for c in curves:
            style = "--" if c["optimizer"] == "sgdg" else "-"
            ax.plot(checkpoints, c["fidelities"], style, marker="o",
                    label=f"{c['optimizer']} lr={c['lr']} s{c['seed']}")
        ax.axhline(1.0 - args.tol, color="k", lw=0.5)
        ax.set_xlabel("steps")
        ax.set_ylabel("fidelity")
        ax.set_xscale("log")
        ax.set_title(f"{args.qubits}q D={args.dim} MPS validate fit: "
                     f"Stiefel vs adam")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        rec["plot"] = args.plot
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
