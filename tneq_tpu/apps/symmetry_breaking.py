"""Symmetry-breaking experiment: iterative core pruning on a brick-wall QCTN.

TPU-native rebuild of ``symmetry_breaking_quantum.py`` + ``train.py``:

1. build a brick-wall incidence matrix;
2. draw a random *target* network with a fixed set of cores masked out and
   contract it to a dense target tensor;
3. validate the target by refitting a fresh full network to fidelity
   1-F < 1e-3 with Stiefel SGD (lr=1, momentum=0.9, <=4000 steps);
4. repeatedly try to prune one more core: mask it, refit a fresh network
   (lr=1e-2, <=5000 steps) and keep the core pruned if fidelity recovers.

TPU-first difference: pruning is a *dynamic mask input* to one compiled
fidelity-fit program (see :mod:`tneq_tpu.train.fit`), so the candidate loop
never recompiles, where the reference rebuilds graph + einsum path + torch
training loop per candidate.  Masked-core == identity-gate equivalence makes
the two formulations numerically identical.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph, parse_graph
from ..graph.generators import build_brick_wall_incidence, incidence_to_graph
from ..model.qctn import init_params
from ..optim.stiefel import sgdg
from ..train.fit import make_masked_fidelity_fit

__all__ = [
    "SymmetryBreakingConfig",
    "make_experiment",
    "target_tensor_init",
    "validate_target_tensor",
    "symmetry_breaking",
    "symmetry_breaking_batched",
    "main",
]


@dataclass
class SymmetryBreakingConfig:
    n_qubits: int = 8
    n_cells: int = 5
    rank: int = 2
    # 'brick': the reference's brick-wall circuit (n_cells layers of
    # two-qubit gates, bond rank `rank`).  'mps': an MPS chain with
    # physical rank `rank` and internal bond `bond_dim` — the big-bond
    # topology whose network-mode overlap cost is polynomial in bond_dim
    # (a rank-64 brick wall's row-cut boundary grows as rank^cells and can
    # never reach the MXU knee).  MPS masking substitutes TRANSPARENT
    # cores (train.fit.transparent_cores): bond passes through, phys legs
    # identity — boundary cores have no transparent form and are never
    # candidates.  'mps' requires fidelity_mode='network'.
    topology: str = "brick"
    bond_dim: int = 64
    # fit optimizer: 'sgdg' (Stiefel SGD-G, the reference protocol) or any
    # optim.factory method ('adam', 'sgd', ...).  MPS-topology fits NEED an
    # unconstrained optimizer: the Stiefel-constrained fidelity flow on
    # chain cores stalls at lr-independent critical points (F≈0.70-0.74
    # over lrs 0.1/0.03/0.01 x 2 seeds at 12q D=8) where adam reaches
    # 1-F < 1e-3 — measured in STIEFEL_STALL_r05.json
    # (bench/stiefel_stall.py); brick-wall fits converge under SGD-G
    optimizer: str = "sgdg"
    # jax.default_matmul_precision for every fit program: 'highest'
    # (multi-pass full-f32, the small-core flagship default — bf16 noise
    # stalls Stiefel convergence there) or 'high'/'default' for big-bond
    # MPS experiments where 6-pass f32 idles the MXU (bench/mps_flagship
    # measures 'default' converging at D>=64 with tol 1e-3)
    matmul_precision: str = "highest"
    # 'dense': fidelity against a materialized 4^n target tensor (reference
    # semantics, feasible to ~14 qubits); 'network': fidelity from
    # network-network overlaps only (scales to 30+ qubits)
    fidelity_mode: str = "dense"
    dtype: object = jnp.complex64
    # run complex cores in stacked-real (pair) form: real-only ops, so the
    # complex experiment trains on the complex64-less axon TPU
    # (ops/complex_pair.py; parity with the complex path is unit-tested)
    complex_as_real: bool = False
    validate_lr: float = 1.0
    validate_steps: int = 4000
    # max vmap lanes per device call in the batched pruning sweep: a
    # 35-lane vmap of the masked while_loop fit crashed the TPU worker
    # ("kernel fault", docs/ROUND1.md); chunking keeps each call small and
    # pads the tail chunk so every call reuses ONE compiled program
    lane_chunk: int = 8
    # fits: 'fit' compiles the whole while_loop; 'step' compiles only the
    # per-step program and loops on the host (for compilers that cannot
    # hold the full fit program); 'chunk' compiles a K-step lax.scan and
    # loops on the host per chunk (bounded program AND K steps per device
    # round-trip — the TPU-tunnel sweet spot)
    fit_jit_scope: str = "fit"
    # jit_scope='step': async steps dispatched per early-exit fetch;
    # jit_scope='chunk': steps per jitted scan chunk
    fit_sync_every: int = 1
    # network-mode fits: a jax.sharding.Mesh turns every overlap into the
    # bond-sliced multi-chip contraction (parallel/mp.py; CLI
    # --slice-devices)
    mesh: object = None
    prune_lr: float = 1e-2
    prune_steps: int = 5000
    momentum: float = 0.9
    tol: float = 1e-3
    max_outer_iterations: int = 500
    seed: int = 0

    @property
    def n_cores(self) -> int:
        return (self.n_qubits - 1) * self.n_cells


class Experiment:
    """Compiled state for one brick-wall topology: graph + two fit programs."""

    def __init__(self, cfg: SymmetryBreakingConfig):
        self.cfg = cfg
        identities = None
        self.unmaskable: frozenset = frozenset()
        if cfg.topology == "mps":
            if cfg.fidelity_mode != "network":
                raise ValueError(
                    "topology='mps' requires fidelity_mode='network' (a "
                    "dense 4^n target defeats the point of the chain)"
                )
            if cfg.complex_as_real:
                raise ValueError("topology='mps' has no pair-form identities")
            from ..graph.generators import mps_graph
            from ..train.fit import transparent_cores

            self.incidence = None
            self.graph = parse_graph(
                mps_graph(cfg.n_qubits, cfg.bond_dim, phys=cfg.rank)
            )
            # pairing='kind' pins bond→bond ⊗ phys→phys (trivial-site)
            # semantics at EVERY bond_dim, including bond_dim == rank
            # where 'auto' would silently switch to bond→phys rewiring
            identities, unmask = transparent_cores(
                self.graph, cfg.dtype, pairing="kind")
            self.unmaskable = frozenset(unmask)
        elif cfg.topology == "brick":
            self.incidence = build_brick_wall_incidence(
                cfg.n_qubits, cfg.n_cells, cfg.rank
            )
            self.graph: CircuitGraph = parse_graph(
                incidence_to_graph(self.incidence)
            )
        else:
            raise ValueError(f"unknown topology {cfg.topology!r}")
        if cfg.fidelity_mode == "network":
            from functools import partial

            from ..train.network_fit import make_masked_network_fidelity_fit

            make_fit = partial(
                make_masked_network_fidelity_fit,
                jit_scope=cfg.fit_jit_scope,
                sync_every=cfg.fit_sync_every,
                mesh=cfg.mesh,
                identities=identities,
                matmul_precision=cfg.matmul_precision,
            )
        elif cfg.fidelity_mode == "dense":
            from functools import partial

            make_fit = partial(
                make_masked_fidelity_fit,
                jit_scope=cfg.fit_jit_scope,
                sync_every=cfg.fit_sync_every,
            )
        else:
            raise ValueError(f"unknown fidelity_mode {cfg.fidelity_mode!r}")
        if cfg.complex_as_real:
            from ..optim.pair_stiefel import pair_sgdg

            make_opt = pair_sgdg
        elif cfg.optimizer != "sgdg":
            from ..optim.factory import make_optimizer

            def make_opt(lr, momentum=0.9, stiefel=True):
                return make_optimizer(cfg.optimizer, lr=lr, momentum=momentum)
        else:
            make_opt = sgdg
        self.validate_fit = make_fit(
            self.graph,
            make_opt(cfg.validate_lr, momentum=cfg.momentum, stiefel=True),
            max_steps=cfg.validate_steps,
            tol=cfg.tol,
            dtype=cfg.dtype,
            complex_as_real=cfg.complex_as_real,
        )
        self.prune_fit = make_fit(
            self.graph,
            make_opt(cfg.prune_lr, momentum=cfg.momentum, stiefel=True),
            max_steps=cfg.prune_steps,
            tol=cfg.tol,
            dtype=cfg.dtype,
            complex_as_real=cfg.complex_as_real,
        )

    def init_params(self, key: jax.Array):
        """Fresh orthogonal cores in the experiment's representation.

        Pair mode draws the complex init on the CPU backend (the TPU plugin
        cannot create complex arrays) and converts to stacked-real pairs."""
        if not self.cfg.complex_as_real:
            return init_params(self.graph, key, self.cfg.dtype)
        from ..ops.complex_pair import pair_tree

        with jax.default_device(jax.devices("cpu")[0]):
            cx = init_params(self.graph, key, jnp.complex64)
            pairs = {k: np.asarray(jnp.stack([jnp.real(v), jnp.imag(v)]),
                                   np.float32)
                     for k, v in cx.items()}
        return {k: jnp.asarray(v) for k, v in pairs.items()}

    def run_fit(self, fit, params, mask, target):
        """Invoke a fit with the mode-appropriate target representation."""
        if self.cfg.fidelity_mode == "network":
            t_params, t_mask = target
            return fit(params, mask, t_params, t_mask)
        return fit(params, mask, target)

    def mask_vector(self, masked: Sequence[int]) -> jax.Array:
        m = np.ones(self.graph.ncores, np.float32)
        m[list(masked)] = 0.0
        return jnp.asarray(m)

    def row_would_empty(self, masked: Sequence[int]) -> bool:
        """True if this mask is structurally forbidden: a brick-wall qubit
        row left with no cores (the reference skips such candidates,
        ``symmetry_breaking_quantum.py:204-206``), or — MPS topology — a
        core with no transparent form (boundary cores; masking one zeroes
        the network, see ``train.fit.transparent_cores``)."""
        if self.unmaskable and not self.unmaskable.isdisjoint(masked):
            return True
        if self.incidence is None:
            return False
        inc = self.incidence.copy()
        inc[:, list(masked)] = 0
        return bool(((inc > 0).sum(axis=1) == 0).any())

    def candidate_indices(self) -> List[int]:
        """Core indices the pruning loops may try (excludes unmaskable)."""
        return [i for i in range(self.graph.ncores)
                if i not in self.unmaskable]


def make_experiment(cfg: Optional[SymmetryBreakingConfig] = None) -> Experiment:
    return Experiment(cfg or SymmetryBreakingConfig())


def target_tensor_init(
    exp: Experiment, target_mask_list: Sequence[int], key: jax.Array
):
    """Random masked network -> target (dense tensor, or the masked network
    itself in 'network' fidelity mode).
    (Reference ``symmetry_breaking_quantum.py:128-146``.)"""
    from ..ops.contract import make_core_only_fn
    from ..train.fit import identity_cores, pair_identity_cores

    params = exp.init_params(key)
    mask = exp.mask_vector(target_mask_list)
    if exp.cfg.fidelity_mode == "network":
        return params, mask
    if exp.cfg.complex_as_real:
        from ..ops.complex_pair import make_pair_core_only_fn

        idents = pair_identity_cores(exp.graph)
        cast, core_fn = jnp.float32, make_pair_core_only_fn(exp.graph)
    else:
        idents = identity_cores(exp.graph, exp.cfg.dtype)
        cast, core_fn = exp.cfg.dtype, make_core_only_fn(exp.graph)
    eff = {
        n: mask[i].astype(cast) * params[n]
        + (1 - mask[i]).astype(cast) * idents[n]
        for i, n in enumerate(exp.graph.core_names)
    }
    # full-precision target contraction: at the TPU default (bf16 matmul
    # passes) the dense target carries ~3e-3 error, which caps the
    # achievable fidelity ABOVE the 1e-3 validation tolerance — the fits
    # then never validate on TPU while converging fine on CPU
    with jax.default_matmul_precision("highest"):
        return core_fn(eff)


def validate_target_tensor(
    exp: Experiment, target, key: jax.Array, return_params: bool = False
):
    """Refit a fresh full network to the target; success at 1-F < tol
    (reference ``symmetry_breaking_quantum.py:150-177``).

    ``return_params=True`` additionally returns the fitted weights — the
    warm-start seed for the pruning loop."""
    params = exp.init_params(key)
    full_mask = exp.mask_vector([])
    res = exp.run_fit(exp.validate_fit, params, full_mask, target)
    infid = float(res.infidelity)
    if return_params:
        return infid < exp.cfg.tol, 1.0 - infid, int(res.steps), res.params
    return infid < exp.cfg.tol, 1.0 - infid, int(res.steps)


def symmetry_breaking(
    exp: Experiment,
    target,
    key: jax.Array,
    verbose: bool = True,
    warm_params=None,
) -> Tuple[List[int], int]:
    """Greedy pruning loop (reference ``symmetry_breaking_quantum.py:184-242``).

    ``warm_params``: weights to warm-start candidate fits from (typically the
    validated full-network fit).  The reference restarts every candidate from
    a fresh random init, which at 8 qubits leaves the raw-fidelity gradient
    at F ~ 0 where lr=1e-2 barely moves; warm-starting keeps F high so the
    same optimizer converges quickly.  ``None`` = reference cold-start.

    Returns ``(pruned_list, prune_count)`` — the indices successfully pruned
    and how many candidate fits were attempted.
    """
    cfg = exp.cfg
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key))[-1])
    pruned: List[int] = []
    prune_count = 0
    candidates = exp.candidate_indices()
    current = warm_params

    for outer in range(cfg.max_outer_iterations):
        pruned_any = False
        if len(pruned) == len(candidates):
            break
        rng.shuffle(candidates)
        for idx in candidates:
            if idx in pruned:
                continue
            prune_count += 1
            trial = pruned + [idx]
            if exp.row_would_empty(trial):
                if verbose:
                    print(f"  skip core {idx}: would empty a qubit row", flush=True)
                continue
            key, sub = jax.random.split(key)
            params = current if current is not None else exp.init_params(sub)
            res = exp.run_fit(
                exp.prune_fit, params, exp.mask_vector(trial), target
            )
            infid = float(res.infidelity)
            if infid < cfg.tol:
                pruned = trial
                pruned_any = True
                if warm_params is not None:
                    current = res.params
                if verbose:
                    print(
                        f"  pruned core {idx} (now {len(pruned)} pruned), "
                        f"fidelity={1 - infid:.6f}, steps={int(res.steps)}",
                        flush=True,
                    )
            elif verbose:
                print(f"  core {idx} not prunable (1-F={infid:.3e})", flush=True)
        if not pruned_any:
            break
    return pruned, prune_count


def symmetry_breaking_batched(
    exp: Experiment,
    target,
    key: jax.Array,
    warm_params,
    verbose: bool = True,
) -> Tuple[List[int], int]:
    """Batched pruning: score ALL remaining candidates in one vmapped fit
    per accepted core, then greedily accept the best success.

    TPU-first variant of the sequential sweep: the per-candidate fits share
    one program vmapped over the mask batch, so an accept-round costs one
    device call instead of ~ncores.  Lanes run in lockstep (vmapped K-step
    chunks, ``fit.batched``) until every lane converges or hits max_steps —
    the slowest candidate dominates, but lanes run in parallel.  Works for
    EVERY ``fit_jit_scope`` (the host-driven 'step'/'chunk' fits cannot be
    ``jax.vmap``-ed directly — ADVICE r2) and its bounded per-dispatch
    program avoids the whole-fit while_loop TPU worker crash.  The
    accepted-set semantics match the sequential greedy loop up to
    tie-breaking order.
    """
    cfg = exp.cfg
    batched_fit = exp.prune_fit.batched
    pruned: List[int] = []
    prune_count = 0
    current = warm_params
    chunk = max(1, int(cfg.lane_chunk))

    def run_chunked(masks_np):
        """Run the vmapped fit in <=lane_chunk pieces (tail padded by
        repeating its last mask so every call hits one compiled shape)."""
        n = masks_np.shape[0]
        infids, params_chunks = [], []
        for lo in range(0, n, chunk):
            part = masks_np[lo: lo + chunk]
            pad = chunk - part.shape[0]
            if pad:
                part = np.concatenate([part, np.repeat(part[-1:], pad, 0)])
            masks = jnp.asarray(part)
            # K steps per vmapped dispatch: amortizes the device round-trip
            # over K x lanes steps (convergence checked per chunk).  An
            # explicit fit_sync_every > 1 is honored; the scalar-path
            # default (1) maps to 16 here because per-step lockstep
            # dispatch would forfeit the amortization this path exists
            # for.  Clamped to the step budget so a small prune_steps is
            # not overshot by a full-k chunk.
            k = int(cfg.fit_sync_every) if int(cfg.fit_sync_every) > 1 else 16
            k = max(1, min(k, int(cfg.prune_steps)))
            if cfg.fidelity_mode == "network":
                t_params, t_mask = target
                res = batched_fit(current, masks, t_params, t_mask,
                                  chunk_steps=k)
            else:
                res = batched_fit(current, masks, target, chunk_steps=k)
            take = part.shape[0] - pad
            infids.append(np.asarray(res.infidelity)[:take])
            params_chunks.append(
                jax.tree.map(lambda a: a[:take], res.params)
            )
        all_params = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *params_chunks
        )
        return np.concatenate(infids), all_params

    while len(pruned) < exp.graph.ncores:
        candidates = [
            c
            for c in exp.candidate_indices()
            if c not in pruned and not exp.row_would_empty(pruned + [c])
        ]
        if not candidates:
            break
        masks_np = np.stack(
            [np.asarray(exp.mask_vector(pruned + [c])) for c in candidates]
        )
        prune_count += len(candidates)
        infids, res_params = run_chunked(masks_np)
        ok = infids < cfg.tol
        if not ok.any():
            if verbose:
                print(f"  no prunable core among {len(candidates)} "
                      f"(best 1-F={float(infids.min()):.3e})", flush=True)
            break
        best = int(np.argmin(np.where(ok, infids, np.inf)))
        idx = candidates[best]
        pruned = pruned + [idx]
        current = jax.tree.map(lambda a: a[best], res_params)
        if verbose:
            print(f"  pruned core {idx} (now {len(pruned)} pruned, "
                  f"1-F={float(infids[best]):.3e}; "
                  f"{int(ok.sum())}/{len(candidates)} candidates viable)",
                  flush=True)
    return pruned, prune_count


def main(argv: Optional[Sequence[str]] = None) -> dict:
    """CLI driver mirroring ``train.py``: generate + validate targets, then
    run repeated symmetry-breaking restarts keeping the best pruned set."""
    import argparse

    p = argparse.ArgumentParser(description="QCTN symmetry-breaking experiment")
    p.add_argument("--n-qubits", type=int, default=8)
    p.add_argument("--n-cells", type=int, default=5)
    p.add_argument("--rank", type=int, default=2)
    p.add_argument("--restarts", type=int, default=20)
    p.add_argument("--validate-steps", type=int, default=4000)
    p.add_argument("--prune-steps", type=int, default=5000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--target-mask", type=int, nargs="*", default=None)
    p.add_argument("--save", type=str, default=None, help="save best run JSON")
    p.add_argument("--batched", action="store_true",
                   help="score all pruning candidates per round in one "
                        "vmapped fit (TPU-first; implies warm start)")
    p.add_argument("--lane-chunk", type=int, default=8,
                   help="max vmap lanes per device call in --batched mode "
                        "(35-lane vmaps crashed the TPU worker in round 1)")
    p.add_argument("--cold-start", action="store_true",
                   help="fresh random init per pruning candidate "
                        "(reference behavior; default warm-starts from the "
                        "validated fit)")
    p.add_argument("--fidelity-mode", choices=["dense", "network"],
                   default="dense",
                   help="'network' computes fidelity from network overlaps "
                        "(no dense target; required beyond ~14 qubits)")
    p.add_argument("--dtype",
                   choices=["complex64", "float32", "complex64-pair"],
                   default="complex64",
                   help="core dtype; float32 runs the real-orthogonal "
                        "variant; complex64-pair lowers complex cores to "
                        "stacked-real pairs (real-only ops: the complex "
                        "experiment on accelerators without complex64)")
    p.add_argument("--jit-scope", choices=["fit", "step", "chunk"],
                   default="fit",
                   help="'fit': whole while_loop on device; 'step': host "
                        "loop, one step per dispatch; 'chunk': host loop, "
                        "sync-every steps per jitted scan dispatch")
    p.add_argument("--sync-every", type=int, default=1,
                   help="steps per dispatch for jit-scope step/chunk")
    p.add_argument("--slice-devices", type=int, default=1,
                   help="network-mode fits: shard bond-sliced overlaps "
                        "over this many devices (a 'model' mesh axis; "
                        "log-space partial combine — parallel/mp.py)")
    args = p.parse_args(argv)

    pair_mode = args.dtype == "complex64-pair"
    cfg = SymmetryBreakingConfig(
        n_qubits=args.n_qubits,
        n_cells=args.n_cells,
        rank=args.rank,
        fidelity_mode=args.fidelity_mode,
        validate_steps=args.validate_steps,
        prune_steps=args.prune_steps,
        seed=args.seed,
        dtype=jnp.complex64 if pair_mode else getattr(jnp, args.dtype),
        complex_as_real=pair_mode,
        lane_chunk=args.lane_chunk,
        fit_jit_scope=args.jit_scope,
        fit_sync_every=args.sync_every,
    )
    if args.slice_devices > 1:
        if args.fidelity_mode != "network":
            p.error("--slice-devices requires --fidelity-mode network")
        from ..parallel import make_mesh

        cfg.mesh = make_mesh({"model": args.slice_devices})
    exp = make_experiment(cfg)
    key = jax.random.PRNGKey(cfg.seed)

    if args.target_mask is None:
        # the reference 8-qubit experiment mask (train.py:30); fall back to a
        # random quarter of the cores for other sizes
        if cfg.n_qubits == 8 and cfg.n_cells == 5:
            target_mask = [2, 3, 5, 8, 9, 12, 13, 14, 15, 17, 18, 20, 21, 23,
                           25, 26, 29, 31, 32, 33]
        else:
            rng = np.random.default_rng(cfg.seed)
            target_mask = sorted(
                rng.choice(cfg.n_cores, size=max(1, cfg.n_cores // 4), replace=False)
                .tolist()
            )
    else:
        target_mask = args.target_mask

    print(f"brick wall: {cfg.n_qubits} qubits x {cfg.n_cells} cells "
          f"({exp.graph.ncores} cores); target mask: {target_mask}")

    # generate + validate target
    t0 = time.time()
    while True:
        key, k1, k2 = jax.random.split(key, 3)
        target = target_tensor_init(exp, target_mask, k1)
        ok, fid, steps, fitted = validate_target_tensor(
            exp, target, k2, return_params=True
        )
        print(f"target validation: fidelity={fid:.6f} in {steps} steps "
              f"({'ok' if ok else 'regenerating'})")
        if ok:
            break
    print(f"target ready in {time.time() - t0:.1f}s")

    best_pruned: List[int] = []
    total_attempts = 0
    for restart in range(args.restarts):
        key, sub = jax.random.split(key)
        print(f"=== restart {restart} ===")
        if args.batched:
            pruned, count = symmetry_breaking_batched(
                exp, target, sub, warm_params=fitted
            )
        else:
            pruned, count = symmetry_breaking(
                exp, target, sub,
                warm_params=None if args.cold_start else fitted,
            )
        total_attempts += count
        if len(pruned) > len(best_pruned):
            best_pruned = pruned

    print(incidence_to_graph(exp.incidence, mask_list=target_mask,
                             for_display=True, mask_char="#"))
    print(f"best: pruned {len(best_pruned)}/{exp.graph.ncores} cores "
          f"({total_attempts} attempts): {sorted(best_pruned)}")
    result = {
        "pruned": sorted(best_pruned),
        "attempts": total_attempts,
        "n_cores": exp.graph.ncores,
        "target_mask": list(target_mask),
    }
    if args.save:
        import json

        with open(args.save, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
