"""Network-space fidelity fitting: no dense target tensor, log-space math.

The reference's symmetry-breaking fits materialize the target as a DENSE
tensor of 4^n_qubits entries (``symmetry_breaking_quantum.py:128-146``) —
impossible beyond ~14 qubits.  Here the target stays a tensor network and
the fidelity

    F = |⟨t, o⟩|² / (⟨t, t⟩·⟨o, o⟩)

is computed from network-network overlaps (two copies glued at both
boundaries).  At 20+ qubits the raw quantities underflow/overflow float32
(⟨o,o⟩ ~ 2^n, |⟨t,o⟩|² ~ 2^-2n), so the loss is the LOG-fidelity

    log F = 2·log|⟨t,o⟩| − log⟨o,o⟩ − log⟨t,t⟩

evaluated on max-abs-normalized cores — the per-core log-scales cancel
exactly because F is scale-invariant, and the log gradient keeps signal even
when F starts at ~2^-n (the raw-fidelity gradient is ~F and dies).

The same dynamic identity-mask trick as :mod:`tneq_tpu.train.fit` makes
every pruning candidate reuse one compiled program; for multi-chip runs the
overlap contractions can be index-sliced over a mesh axis (``parallel/mp.py``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph
from ..ops.scaling import auto_scale
from ..optim.stiefel import GradientTransformation
from ._fit_driver import FitDrivers
from .fit import FitResult, identity_cores

__all__ = [
    "make_masked_network_fidelity_fit",
    "network_fidelity",
    "network_log_fidelity",
]

_TINY = 1e-30


def _normalize(params):
    return {n: auto_scale(v).data for n, v in params.items()}


def _chain_cores(graph: CircuitGraph, params):
    """Ordered (first, middles-stacked-or-None, last) cores for an MPS
    chain, or None when it cannot scan: middles must be shape-uniform AND
    every bond dim along the chain equal (the scan carry is [bond², ...])."""
    names = graph.core_names
    first, last = params[names[0]], params[names[-1]]
    mids = [params[n] for n in names[1:-1]]
    if mids and any(m.shape != mids[0].shape for m in mids):
        return None
    bonds = {first.shape[-1], last.shape[0]}
    if mids:
        bonds |= {mids[0].shape[0], mids[0].shape[-1]}
    if len(bonds) != 1:
        return None
    stacked = jnp.stack(mids) if mids else None
    return first, stacked, last


def _chain_log_overlap(a, b) -> jax.Array:
    """log |⟨A, B⟩| of two same-structure MPS-chain networks via a
    transfer-matrix ``lax.scan`` with per-step max-abs rescaling.

    The dense two-network einsum overflows float32 beyond ~24 qubits even
    on normalized cores (the running contraction grows multiplicatively);
    here every step renormalizes the carry and accumulates the log-scale.
    Scales go through ``stop_gradient``, which keeps gradients of the LOG
    overlap exact (the rescale cancels in mantissa/scale).

    Core axis convention (graph/dsl.py: in-edges then out-edges, ascending
    qubit): first ``[x0, x1, y0, c]``, middle ``[c, x, y, c']``, last
    ``[c, x, y, z]`` — x/y/z are circuit boundary legs, c bond legs.
    """
    (fa, ma, la), (fb, mb, lb) = a, b

    def rescale(v, logs):
        s = jax.lax.stop_gradient(jnp.max(jnp.abs(v)) + _TINY)
        return v / s, logs + jnp.log(s)

    v = jnp.einsum("xiyc,xiye->ce", fa, jnp.conj(fb))
    v, logs = rescale(v, jnp.zeros((), v.real.dtype))

    if ma is not None:

        def body(carry, ab):
            v, logs = carry
            A, B = ab
            v = jnp.einsum("ce,cxyf,exyg->fg", v, A, jnp.conj(B))
            v, logs = rescale(v, logs)
            return (v, logs), None

        (v, logs), _ = jax.lax.scan(body, (v, logs), (ma, mb))

    final = jnp.einsum("ce,cxyz,exyz->", v, la, jnp.conj(lb))
    return logs + jnp.log(jnp.abs(final) + _TINY)


def _chain_log_overlap_batched(pairs) -> jax.Array:
    """log |⟨A_k, B_k⟩| for several same-shape chain pairs in ONE batched
    transfer scan (returns ``[len(pairs)]``).

    Same math as :func:`_chain_log_overlap` with a leading batch axis:
    each site update is one batched einsum instead of ``len(pairs)``
    separate ones.  Measured SLOWER than separate scans on the real TPU
    (32q dim-16 gradient step: b2 276 / b3 226 vs 366 steps/s separate —
    the batched plans lower worse, same finding as the batched row scan;
    ``bench/chain_variants.py``, ``CHAIN_KERNEL_r03.json``), so the
    separate-call form stays the default; this helper serves callers that
    need many overlaps of independent pairs in one program.
    """
    fa = jnp.stack([a[0] for a, _ in pairs])
    fb = jnp.stack([b[0] for _, b in pairs])
    la = jnp.stack([a[2] for a, _ in pairs])
    lb = jnp.stack([b[2] for _, b in pairs])

    def rescale(v, logs):
        s = jax.lax.stop_gradient(
            jnp.max(jnp.abs(v), axis=(1, 2), keepdims=True) + _TINY
        )
        return v / s, logs + jnp.log(s[:, 0, 0])

    v = jnp.einsum("bxiyc,bxiye->bce", fa, jnp.conj(fb))
    v, logs = rescale(v, jnp.zeros((len(pairs),), v.real.dtype))

    if pairs[0][0][1] is not None:
        ma = jnp.stack([a[1] for a, _ in pairs], axis=1)  # [n, b, ...]
        mb = jnp.stack([b[1] for _, b in pairs], axis=1)

        def body(carry, ab):
            v, logs = carry
            A, B = ab
            v = jnp.einsum("bce,bcxyf,bexyg->bfg", v, A, jnp.conj(B))
            v, logs = rescale(v, logs)
            return (v, logs), None

        (v, logs), _ = jax.lax.scan(body, (v, logs), (ma, mb))

    final = jnp.einsum("bce,bcxyz,bexyz->b", v, la, jnp.conj(lb))
    return logs + jnp.log(jnp.abs(final) + _TINY)


def _overlap_fn(graph: CircuitGraph):
    """log|⟨A,B⟩| function for non-chain graphs: the row-sweep scan for
    layered 2-local circuits (O(1)-size compiled program; ``ops/row_scan``),
    the generic rescaled pairwise executor otherwise."""
    from ..ops.pairwise import make_log_abs_overlap_fn
    from ..ops.row_scan import make_row_scan_log_overlap_fn, supports_row_scan

    if supports_row_scan(graph):
        return make_row_scan_log_overlap_fn(graph)
    return make_log_abs_overlap_fn(graph)


def network_log_fidelity(
    graph: CircuitGraph, params, target_params
) -> jax.Array:
    """log F between two same-graph networks, float32-safe at large n.

    MPS chains contract via the rescaled transfer scan (stable at ANY
    depth, and scan-compiled); layered 2-local circuits — the flagship
    brick wall above all — via the row-sweep scan (``ops/row_scan.py``,
    per-row rescaling, program size independent of qubit count); anything
    else via the generic rescaled pairwise executor (``ops/pairwise.py``).
    All three renormalize per step and keep LOG gradients exact.
    """
    from ..ops.mps_sweep import is_mps_chain

    p = _normalize(params)
    t = _normalize(target_params)
    if graph.ncores >= 2 and is_mps_chain(graph):
        pc, tc = _chain_cores(graph, p), _chain_cores(graph, t)
        if pc is not None and tc is not None:
            from ..ops.chain_overlap import (
                fused_chain_log_overlap,
                fused_chain_supported,
            )

            if fused_chain_supported(pc) and fused_chain_supported(tc):
                # opt-in (TNEQ_CHAIN_PALLAS=1): whole-sweep Pallas kernel
                # over the M-form transfer matrices; measured at parity
                # with the default XLA scan (see ops/chain_overlap.py)
                log_ov = fused_chain_log_overlap(pc, tc)
                log_oo = fused_chain_log_overlap(pc, pc)
                log_tt = fused_chain_log_overlap(tc, tc)
            else:
                log_ov = _chain_log_overlap(pc, tc)
                log_oo = _chain_log_overlap(pc, pc)
                log_tt = _chain_log_overlap(tc, tc)
            return 2.0 * log_ov - log_oo - log_tt
    # note: a batched sweep (one batch=3 call for ov/oo/tt) was measured
    # SLOWER than three separate sweeps on both CPU (2.7x) and the tunnel
    # TPU (1.8x) — the batched pairwise plans lower worse than the plain
    # ones — so the separate-call form stays (batch support remains in
    # ops/row_scan for future use)
    log_abs_overlap = _overlap_fn(graph)
    log_ov = log_abs_overlap(p, t)
    log_oo = log_abs_overlap(p, p)
    log_tt = log_abs_overlap(t, t)
    return 2.0 * log_ov - log_oo - log_tt


def network_fidelity(
    graph: CircuitGraph, params, target_params, target_norm=None
) -> jax.Array:
    """Fidelity between two same-graph networks via overlaps only."""
    return jnp.exp(network_log_fidelity(graph, params, target_params))


def make_masked_network_fidelity_fit(
    graph: CircuitGraph,
    optimizer: GradientTransformation,
    max_steps: int,
    tol: float = 1e-3,
    dtype=jnp.complex64,
    complex_as_real: bool = False,
    jit_scope: str = "fit",
    sync_every: int = 1,
    mesh=None,
    model_axis: str = "model",
    slice_bonds=None,
    identities=None,
    matmul_precision: str = "highest",
) -> Callable:
    """Build ``fit(params, mask, target_params, target_mask) -> FitResult``.

    Both the candidate and the target are masked full-graph networks
    (identity-gate substitution); the loss is −log F; the whole fit runs in
    one jitted ``lax.while_loop`` with early exit at ``1 − F < tol``.

    For MPS-chain graphs the overlaps contract via the rescaled
    transfer-matrix scan (float32-safe at any depth); every other topology
    — the flagship brick wall included — via the generic rescaled pairwise
    executor (``ops/pairwise.py``), float32-safe at any qubit count.

    ``complex_as_real``: params/target are stacked-real pairs and the fit
    lowers to real-only ops (pair overlap executor + pair optimizer) —
    complex network fits on the complex64-less TPU.

    ``mesh``: a ``jax.sharding.Mesh`` turns every overlap into the
    bond-sliced multi-chip contraction (``parallel.mp.make_sliced_log_overlap_fn``):
    slice partials sharded over ``model_axis``, combined in log-space over
    ICI — the 30+-qubit multi-chip path (reference:
    ``distributed_engine.py:1384-1499``).  ``slice_bonds`` overrides the
    automatic bond choice.

    ``identities``: override the masked-core substitution tensors (default:
    gate-style ``identity_cores``; MPS topologies pass
    ``train.fit.transparent_cores`` output, whose unmaskable cores carry
    zeros — see that docstring).  ``matmul_precision``: the
    ``jax.default_matmul_precision`` every fit program runs under —
    'highest' (full-f32, the flagship default) or 'high'/'default' for
    big-bond MPS experiments where multi-pass f32 would idle the MXU.
    """
    from ..ops.mps_sweep import is_mps_chain
    from ..ops.pairwise import make_log_abs_overlap_fn

    use_mesh = mesh is not None and mesh.shape[model_axis] > 1
    mid_shapes = {c.shape for c in graph.cores[1:-1]}
    bonds = {graph.cores[0].shape[-1], graph.cores[-1].shape[0]}
    for s in mid_shapes:
        bonds |= {s[0], s[-1]}
    use_chain = (
        not complex_as_real
        and not use_mesh
        and graph.ncores >= 2
        and is_mps_chain(graph)
        and len(mid_shapes) <= 1
        and len(bonds) == 1
    )
    if use_mesh:
        from ..parallel.mp import make_sliced_log_overlap_fn

        generic_overlap = make_sliced_log_overlap_fn(
            graph, mesh, slice_bonds, model_axis, pair=complex_as_real
        )
    elif complex_as_real:
        from ..ops.complex_pair import make_pair_log_abs_overlap_fn

        generic_overlap = make_pair_log_abs_overlap_fn(graph)
    elif not use_chain:
        generic_overlap = _overlap_fn(graph)

    def log_abs_overlap(a, b):
        """log |⟨A, B⟩| on already-normalized core dicts."""
        if use_chain:
            return _chain_log_overlap(_chain_cores(graph, a),
                                      _chain_cores(graph, b))
        return generic_overlap(a, b)

    if identities is not None:
        idents = identities
        cast = jnp.float32 if complex_as_real else dtype
    elif complex_as_real:
        from .fit import pair_identity_cores

        idents = pair_identity_cores(graph)
        cast = jnp.float32
    else:
        idents = identity_cores(graph, dtype)
        cast = dtype
    names = graph.core_names
    # exit when log F > log(1 - tol)
    log_tol = float(np.log1p(-tol))

    def effective(params, mask):
        return {
            n: mask[i].astype(cast) * params[n]
            + (1.0 - mask[i]).astype(cast) * idents[n]
            for i, n in enumerate(names)
        }

    def neg_log_f(params, mask, target_eff_n, log_tt):
        eff = _normalize(effective(params, mask))
        return -(2.0 * log_abs_overlap(eff, target_eff_n)
                 - log_abs_overlap(eff, eff) - log_tt)

    grad_fn = jax.value_and_grad(neg_log_f)

    if jit_scope not in ("fit", "step", "chunk"):
        raise ValueError(
            f"jit_scope must be 'fit', 'step' or 'chunk', got {jit_scope!r}"
        )

    @jax.jit
    def prepare(target_params, target_mask):
        """Loop-invariant target quantities, computed once per fit."""
        with jax.default_matmul_precision(matmul_precision):
            target_eff_n = _normalize(effective(target_params, target_mask))
            return target_eff_n, log_abs_overlap(target_eff_n, target_eff_n)

    def _step(params, opt_state, mask, target_eff_n, log_tt):
        nlf, grads = grad_fn(params, mask, target_eff_n, log_tt)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, nlf

    drivers = FitDrivers(
        _step, optimizer, max_steps, sync_every,
        running=lambda nlf: nlf > -log_tol, init_metric=1e9,
        matmul_precision=matmul_precision,
    )

    def batched(
        params, masks, target_params, target_mask, chunk_steps: int = 0
    ) -> FitResult:
        """Lockstep lanes over mask rows (see FitDrivers.batched); the
        target is prepared once and shared across lanes."""
        target_eff_n, log_tt = prepare(target_params, target_mask)
        p_b, o_b, steps, nlf_b = drivers.batched(
            params, masks, target_eff_n, log_tt, chunk_steps=chunk_steps
        )
        return FitResult(p_b, -jnp.expm1(-nlf_b), jnp.asarray(steps), o_b)

    if jit_scope == "chunk":
        def fit_chunked(params, mask, target_params, target_mask) -> FitResult:
            target_eff_n, log_tt = prepare(target_params, target_mask)
            p, o, steps, nlf = drivers.fit_chunked(
                params, mask, target_eff_n, log_tt
            )
            return FitResult(p, -jnp.expm1(-nlf), jnp.asarray(steps), o)

        fit_chunked.batched = batched
        fit_chunked.scope = "chunk"
        # introspection hooks for timing probes (bench/chunk_probe.py):
        # share one prepared target across chunk sizes
        fit_chunked.chunk = drivers.chunk
        fit_chunked.prepare = prepare
        fit_chunked.make_opt_state = optimizer.init
        return fit_chunked

    if jit_scope == "step":
        # host-driven loop: only the per-step program is compiled — used
        # when the whole-fit while_loop program is too large for the
        # compiler (the axon tunnel's remote compile helper has been
        # OOM-killed on full 32q5c fit programs)
        def fit_host(params, mask, target_params, target_mask) -> FitResult:
            target_eff_n, log_tt = prepare(target_params, target_mask)
            p, o, steps, nlf = drivers.fit_host(
                params, mask, target_eff_n, log_tt
            )
            return FitResult(p, -jnp.expm1(-nlf), jnp.asarray(steps), o)

        fit_host.batched = batched
        fit_host.scope = "step"
        return fit_host

    @jax.jit
    def fit_jitted(params, mask, target_params, target_mask) -> FitResult:
        # full-precision matmuls by default (see train/fit.py)
        with jax.default_matmul_precision(matmul_precision):
            target_eff_n = _normalize(effective(target_params, target_mask))
            log_tt = log_abs_overlap(target_eff_n, target_eff_n)
            p, o, steps, nlf = drivers.fit_while(
                params, mask, target_eff_n, log_tt
            )
            # report 1 - F from the exit-triggering -log F (pre-final-step,
            # same convention as train/fit.py and the reference)
            return FitResult(p, -jnp.expm1(-nlf), steps, o)

    def fit(params, mask, target_params, target_mask) -> FitResult:
        return fit_jitted(params, mask, target_params, target_mask)

    fit.batched = batched
    fit.scope = "fit"
    return fit
