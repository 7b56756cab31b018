"""Jitted fit-to-convergence loops for fidelity training.

TPU-first design of the symmetry-breaking inner loop
(``symmetry_breaking_quantum.py:150-242``): instead of rebuilding a new
graph + einsum expression for every pruning candidate (the reference pays an
opt_einsum path search and a fresh Python training loop each time), the FULL
brick-wall network is compiled ONCE with a dynamic per-core mask input:

    effective_core_i = mask_i · params_i + (1 - mask_i) · identity_i

A pruned rank-preserving core replaced by the identity gate contracts to
exactly the same network value as removing it from the graph, so flipping a
mask bit reuses the same XLA executable — no recompilation storm, and the
whole N-thousand-step Stiefel fit runs on-device inside one
``lax.while_loop`` with early exit at the fidelity tolerance.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph
from ..ops.contract import make_core_only_fn
from ..optim.stiefel import GradientTransformation
from ._fit_driver import FitDrivers
from .losses import fidelity

__all__ = [
    "identity_cores",
    "transparent_cores",
    "make_masked_fidelity_fit",
    "FitResult",
]


def identity_cores(graph: CircuitGraph, dtype=jnp.complex64):
    """Per-core identity gates: I reshaped to the core's (in+out) shape.

    Requires input_dim == output_dim per core (true for all gate-style
    circuits; the brick wall has 4x4 cores).  Contracting a core chain with
    one of these is equivalent to deleting that core from the graph.
    """
    out = {}
    for core in graph.cores:
        if core.input_dim != core.output_dim:
            raise ValueError(
                f"core {core.name!r} has input_dim {core.input_dim} != "
                f"output_dim {core.output_dim}; identity masking undefined"
            )
        # host (numpy) constants: the axon TPU backend cannot host-copy
        # closure-captured *device* arrays during jit lowering
        eye = np.eye(core.input_dim, dtype=np.dtype(dtype))
        out[core.name] = eye.reshape(core.shape)
    return out


def _pair_by_kind(core) -> list:
    """Kind-preserving leg pairing: interior (bond, ``neighbor >= 0``) in
    legs pair only with interior out legs, boundary (``neighbor == -1``)
    only with boundary, equal rank required, same qubit preferred within a
    kind.  Returns ``[]`` when no complete pairing exists."""
    n_in, n_out = len(core.in_edges), len(core.out_edges)
    if n_in != n_out:
        return []
    pairs, used = [], set()
    for i, e_in in enumerate(core.in_edges):
        kind_in = e_in.neighbor >= 0
        candidates = [
            j for j, e_out in enumerate(core.out_edges)
            if j not in used and e_out.rank == e_in.rank
            and (e_out.neighbor >= 0) == kind_in
        ]
        if not candidates:
            return []
        j = min(candidates,
                key=lambda j: (core.out_edges[j].qubit != e_in.qubit, j))
        used.add(j)
        pairs.append((i, j))
    return pairs


def transparent_cores(graph: CircuitGraph, dtype=jnp.complex64, *,
                      pairing: str = "auto"):
    """Pass-through ("transparent") identity cores for GENERAL core shapes.

    A core is transparent-maskable when its input legs pair one-to-one with
    equal-rank output legs; the transparent core is the product of Kronecker
    deltas over those pairs.  ``pairing`` selects the leg-pairing semantics:

    - ``'auto'`` (default, gate-style graphs): prefer positional pairing
      (leg k in == leg k out — for every brick-wall core this reproduces
      :func:`identity_cores` exactly: each qubit line passes straight
      through), falling back to first-equal-rank matching.  CAUTION: on
      chain cores whose bond rank equals the physical rank, the positional
      branch pairs bond→phys (removal/rewire semantics), while at any
      other bond rank the fallback pairs bond→bond (trivial-site
      semantics) — a silent semantics switch across a D sweep.  Chain
      experiments must pass ``pairing='kind'``.
    - ``'kind'`` (chain/MPS graphs): interior legs (``neighbor >= 0``,
      i.e. core-core bonds) pair only with interior legs and boundary
      legs only with boundary legs, equal rank required, same qubit
      preferred.  For an MPS interior core ``[D, p, p, D]`` this is
      bond→bond ⊗ phys→phys at EVERY ``D`` (including ``D == p``): a
      masked core contracts away and the chain behaves as if the site
      were trivial.  MPS boundary cores (whose output carries a bond the
      input lacks) never pair — they are structurally unmaskable.

    Returns ``(idents, unmaskable)``: cores with no perfect pairing get
    ZERO tensors — masking one zeroes every overlap (fidelity → 0, never
    accepted by the pruning rule), a fail-safe — and their indices are
    listed in ``unmaskable``; experiment drivers must exclude them from
    candidate and planted masks.
    """
    if pairing not in ("auto", "kind"):
        raise ValueError(f"unknown pairing {pairing!r} "
                         "(expected 'auto' or 'kind')")
    idents, unmaskable = {}, []
    for core in graph.cores:
        n_in, n_out = len(core.in_edges), len(core.out_edges)
        pairs, used = [], set()
        if pairing == "kind":
            pairs = _pair_by_kind(core)
        elif n_in == n_out:
            # prefer positional pairing (gate semantics: leg k in == leg k
            # out on the same qubit line)
            if all(core.in_edges[k].rank == core.out_edges[k].rank
                   for k in range(n_in)):
                pairs = [(k, k) for k in range(n_in)]
            else:
                for i in range(n_in):
                    j = next(
                        (j for j in range(n_out)
                         if j not in used
                         and core.out_edges[j].rank == core.in_edges[i].rank),
                        None,
                    )
                    if j is None:
                        pairs = []
                        break
                    used.add(j)
                    pairs.append((i, j))
        if not pairs and (n_in or n_out):
            unmaskable.append(core.index)
            idents[core.name] = np.zeros(core.shape, np.dtype(dtype))
            continue
        terms, operands = [], []
        out_letters = [None] * n_out
        for i, j in pairs:
            a, b = chr(ord("a") + i), chr(ord("A") + j)
            out_letters[j] = b
            terms.append(a + b)
            operands.append(np.eye(core.in_edges[i].rank, dtype=np.float64))
        eq = (",".join(terms) + "->"
              + "".join(chr(ord("a") + i) for i in range(n_in))
              + "".join(out_letters))
        idents[core.name] = np.einsum(eq, *operands).astype(np.dtype(dtype))
    return idents, tuple(unmaskable)


class FitResult(NamedTuple):
    params: dict
    infidelity: jax.Array  # 1 - fidelity at exit
    steps: jax.Array  # steps actually taken
    opt_state: object


def pair_identity_cores(graph: CircuitGraph):
    """Pair-form identity gates (host numpy): real part = I, imag = 0.
    Used by the complex-as-real fits (``ops/complex_pair.py``)."""
    out = {}
    for core in graph.cores:
        if core.input_dim != core.output_dim:
            raise ValueError(
                f"core {core.name!r} has input_dim {core.input_dim} != "
                f"output_dim {core.output_dim}; identity masking undefined"
            )
        eye = np.eye(core.input_dim, dtype=np.float32).reshape(core.shape)
        out[core.name] = np.stack([eye, np.zeros_like(eye)])
    return out


def make_masked_fidelity_fit(
    graph: CircuitGraph,
    optimizer: GradientTransformation,
    max_steps: int,
    tol: float = 1e-3,
    dtype=jnp.complex64,
    order: str = "reference",
    loss_kind: str = "raw",
    complex_as_real: bool = False,
    jit_scope: str = "fit",
    sync_every: int = 1,
) -> Callable:
    """Build ``fit(params, mask, target) -> FitResult``, fully jitted.

    - ``mask``: float vector ``(ncores,)`` — 1 keeps the trained core, 0
      substitutes the identity gate (pruned).  Dynamic input: every pruning
      candidate reuses one compiled program.
    - ``target``: dense target tensor with the graph's boundary legs (in
      ``order`` axis convention).
    - The loop exits early once ``1 - fidelity < tol`` (reference threshold,
      ``symmetry_breaking_quantum.py:170,232``).
    - ``complex_as_real``: params/target are stacked-real PAIRS
      (``[2, *shape]``; ``ops/complex_pair.py``) and the whole fit lowers to
      real-only ops — complex circuits on backends without complex64 (the
      axon TPU).  Pass a pair optimizer (``optim.pair_stiefel.pair_sgdg``).
    """
    if complex_as_real:
        from ..ops.complex_pair import make_pair_core_only_fn, pair_fidelity

        core_fn = make_pair_core_only_fn(graph, order)
        fid_fn = pair_fidelity
        idents = pair_identity_cores(graph)
        cast = jnp.float32
    else:
        core_fn = make_core_only_fn(graph, order)
        fid_fn = fidelity
        idents = identity_cores(graph, dtype)
        cast = dtype
    names = graph.core_names

    def effective(params, mask):
        return {
            n: mask[i].astype(cast) * params[n]
            + (1.0 - mask[i]).astype(cast) * idents[n]
            for i, n in enumerate(names)
        }

    def loss_fn(params, mask, target):
        """Returns (loss, 1-F).  loss_kind='raw' is the reference objective
        1-F; 'log' uses -log F (scale-free gradient — useful when a cold
        random start sits at F ~ 2^-2n where the raw gradient ∝ F dies)."""
        out = core_fn(effective(params, mask))
        fid = fid_fn(out, target)
        if loss_kind == "log":
            return -jnp.log(fid + 1e-30), 1.0 - fid
        return 1.0 - fid, 1.0 - fid

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if jit_scope not in ("fit", "step", "chunk"):
        raise ValueError(
            f"jit_scope must be 'fit', 'step' or 'chunk', got {jit_scope!r}"
        )

    def _step(params, opt_state, mask, target):
        (_, infid), grads = grad_fn(params, mask, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, infid

    drivers = FitDrivers(
        _step, optimizer, max_steps, sync_every,
        running=lambda infid: infid >= tol, init_metric=1.0,
    )

    def batched(params, masks, target, chunk_steps: int = 0) -> FitResult:
        """Lockstep lanes over mask rows (see FitDrivers.batched)."""
        p_b, o_b, steps, infid_b = drivers.batched(
            params, masks, target, chunk_steps=chunk_steps
        )
        return FitResult(p_b, infid_b, jnp.asarray(steps), o_b)

    if jit_scope == "chunk":
        def fit_chunked(params, mask, target) -> FitResult:
            p, o, steps, infid = drivers.fit_chunked(params, mask, target)
            return FitResult(p, infid, jnp.asarray(steps), o)

        fit_chunked.batched = batched
        fit_chunked.scope = "chunk"
        return fit_chunked

    if jit_scope == "step":
        def fit_host(params, mask, target) -> FitResult:
            p, o, steps, infid = drivers.fit_host(params, mask, target)
            return FitResult(p, infid, jnp.asarray(steps), o)

        fit_host.batched = batched
        fit_host.scope = "step"
        return fit_host

    @jax.jit
    def fit_jitted(params, mask, target) -> FitResult:
        # fidelity convergence to 1e-3 needs full f32 matmuls: the TPU
        # default (fast bf16 passes) stalls the optimizer near bf16 noise
        with jax.default_matmul_precision("highest"):
            p, o, steps, infid = drivers.fit_while(params, mask, target)
            return FitResult(p, infid, steps, o)

    def fit(params, mask, target) -> FitResult:
        return fit_jitted(params, mask, target)

    fit.batched = batched
    fit.scope = "fit"
    return fit
