"""Model parallelism: index-sliced contraction sharded over a mesh axis.

TPU-native replacement for the reference's model-parallel stack
(``DistributedEngineSiamese`` + ``DistributedHierarchicalContractor``,
``tneq_qc/distributed/``): where the reference partitions cores across MPI
ranks, exchanges boundary tensors P2P and K-shards a bmm across a
process group (``distributed_engine.py:1108-1664``), here chosen internal
bonds become an explicit slice axis that is sharded over the mesh's
``model`` axis inside ``shard_map``; each device contracts its slice
combinations and the partials are ``psum``-reduced over ICI.  The log₂-stage
hierarchical reduction tree (``distributed_engine.py:459-513``) is subsumed
by XLA's collective schedule, and gradients flow through ``psum``
automatically (no hand-written autograd collectives).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.dsl import CircuitGraph
from ..ops.contract import abs_square
from ..ops.einsum_spec import siamese_spec_sliced
from ..train.losses import nll_loss

__all__ = [
    "choose_slice_bonds",
    "make_sliced_siamese_fn",
    "make_sliced_log_overlap_fn",
    "sliced_nll_loss",
]

BondKey = Tuple[int, int, int]  # (min_core_idx, max_core_idx, qubit)

_NEG = -1e30  # "log of zero" for masked slice partials (finite: -inf-(-inf)
#               in the running max-normalization would produce NaNs)
_TINY = 1e-30  # log(|x| + _TINY): keeps exact zeros finite


def _internal_bonds(graph: CircuitGraph) -> List[Tuple[BondKey, int]]:
    seen = {}
    for core in graph.cores:
        for e in core.out_edges:
            if e.neighbor >= 0:
                key = (min(core.index, e.neighbor), max(core.index, e.neighbor), e.qubit)
                seen.setdefault(key, e.rank)
    return sorted(seen.items())


def choose_slice_bonds(
    graph: CircuitGraph, n_slices: int, prefer_early_rows: bool = False
) -> Tuple[BondKey, ...]:
    """Greedily pick internal bonds whose rank product covers ``n_slices``
    (slice-count per device = ceil(product / n_slices); a non-divisible
    product is padded and masked).

    The reference instead shards the cut-index product of its fixed core
    partition (``distributed_engine.py:1384-1435``); choosing max-rank bonds
    keeps per-slice work MXU-shaped.

    ``prefer_early_rows``: pick lowest-qubit bonds first (max rank as the
    tie-break) — slicing then touches only the first row steps of the
    row-sweep overlap executor, keeping its periodic bulk ``lax.scan``
    intact (``ops/row_scan.py``).
    """
    if n_slices == 1:
        return ()
    if prefer_early_rows:
        bonds = sorted(_internal_bonds(graph), key=lambda kv: (kv[0][2], -kv[1]))
    else:
        bonds = sorted(_internal_bonds(graph), key=lambda kv: -kv[1])
    if not bonds:
        raise ValueError("graph has no internal bonds to slice")
    chosen: List[BondKey] = []
    prod = 1
    for key, rank in bonds:
        if prod % n_slices == 0:
            break
        chosen.append(key)
        prod *= rank
    if prod % n_slices != 0 and prod < n_slices:
        raise ValueError(
            f"cannot reach {n_slices} slices from bond ranks "
            f"{[r for _, r in bonds]} (product {prod})"
        )
    # a non-divisible product is fine: the slice space is padded and the
    # out-of-range slice indices masked out (some devices idle on the tail)
    return tuple(chosen)


def make_sliced_siamese_fn(
    graph: CircuitGraph,
    mesh: Mesh,
    bonds: Optional[Sequence[BondKey]] = None,
    model_axis: str = "model",
    data_axis: Optional[str] = "data",
    states_batched: bool = False,
    measure_extra_dims: int = 1,
):
    """Siamese contraction with sliced bonds sharded over ``model_axis``.

    Returns ``fn(params, states, measures) -> raw siamese values`` with the
    same semantics as :func:`tneq_tpu.ops.make_siamese_fn`, but evaluated as
    a ``shard_map`` program: slice combinations are distributed over
    ``model_axis`` (partials psum-reduced) and the measurement batch over
    ``data_axis`` (if given).  Differentiable end-to-end.
    """
    n_model = mesh.shape[model_axis]
    if bonds is None:
        bonds = choose_slice_bonds(graph, n_model)
    bonds = tuple(bonds)
    spec, slice_axes, ranks = siamese_spec_sliced(
        graph, bonds, True, states_batched, measure_extra_dims
    )
    total = int(np.prod(ranks)) if ranks else 1
    local = -(-total // n_model)  # ceil: pad, mask the tail

    def slice_params(params, flat_idx):
        """Take the slice of each affected core for one flat slice index."""
        idxs = []
        rem = flat_idx
        for r in reversed(ranks):
            idxs.append(rem % r)
            rem = rem // r
        idxs = idxs[::-1]  # per-bond indices
        out = dict(params)
        for name, axes in slice_axes.items():
            arr = out[name]
            # slice higher axes first so positions stay valid
            for b_i, axis in sorted(axes, key=lambda t: -t[1]):
                arr = jax.lax.dynamic_index_in_dim(
                    arr, idxs[b_i], axis, keepdims=False
                )
            out[name] = arr
        return out

    def contract_slices(params, states, measures):
        shard = jax.lax.axis_index(model_axis)
        base = shard * local

        def one(off, acc):
            # ket-side cores are sliced; the bra (conjugate) side keeps the
            # full tensors — only the ket bond is being summed explicitly
            p = slice_params(params, base + off)
            ops = []
            for kind, key in spec.operands:
                if kind == "core":
                    ops.append(p[key])
                elif kind == "core_conj":
                    ops.append(jnp.conj(params[key]))
                elif kind == "state":
                    ops.append(states[key])
                elif kind == "state_conj":
                    ops.append(jnp.conj(states[key]))
                elif kind == "measure":
                    ops.append(measures[key])
            val = jnp.einsum(spec.equation, *ops, optimize="auto")
            val = jnp.where(base + off < total, val, jnp.zeros_like(val))
            return acc + val

        acc0 = jnp.zeros(
            tuple(measures[0].shape[:measure_extra_dims]),
            dtype=jax.tree.leaves(params)[0].dtype,
        )
        # the loop body output varies over the mesh axes (it reads
        # axis_index); the initial carry must carry the same varying type
        acc0 = jax.lax.pcast(acc0, tuple(mesh.axis_names), to="varying")
        acc = jax.lax.fori_loop(0, local, one, acc0) if local > 1 else one(0, acc0)
        return jax.lax.psum(acc, model_axis)

    if data_axis is None:
        in_specs = (P(), P(), P())
        out_specs = P()
    else:
        in_specs = (P(), P(), P(data_axis))
        out_specs = P(data_axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    def sharded(params, states, measures):
        return contract_slices(params, states, list(measures))

    def fn(params, states, measures):
        return sharded(params, tuple(states), tuple(measures))

    return fn


def make_sliced_two_network_fn(
    graph1: CircuitGraph,
    graph2: CircuitGraph,
    mesh: Mesh,
    bonds: Optional[Sequence[BondKey]] = None,
    model_axis: str = "model",
    conj_target: bool = True,
):
    """Two-network overlap sharded over ``model_axis`` by bond slicing.

    ``fn(params1, params2) -> scalar``, semantics of
    :func:`tneq_tpu.ops.make_two_network_fn` — the multi-chip path for the
    30+-qubit network-fidelity experiment (``train/network_fit.py``).
    Differentiable end-to-end.
    """
    from ..ops.einsum_spec import two_network_spec_sliced

    n_model = mesh.shape[model_axis]
    if bonds is None:
        bonds = choose_slice_bonds(graph1, n_model)
    bonds = tuple(bonds)
    spec, slice_axes, ranks = two_network_spec_sliced(graph1, graph2, bonds)
    total = int(np.prod(ranks)) if ranks else 1
    local = -(-total // n_model)  # ceil: pad, mask the tail

    def slice_params(params, flat_idx):
        idxs = []
        rem = flat_idx
        for r in reversed(ranks):
            idxs.append(rem % r)
            rem = rem // r
        idxs = idxs[::-1]
        out = dict(params)
        for name, axes in slice_axes.items():
            arr = out[name]
            for b_i, axis in sorted(axes, key=lambda t: -t[1]):
                arr = jax.lax.dynamic_index_in_dim(
                    arr, idxs[b_i], axis, keepdims=False
                )
            out[name] = arr
        return out

    def contract(params1, params2):
        shard = jax.lax.axis_index(model_axis)
        base = shard * local
        p2 = (
            {k: jnp.conj(v) for k, v in params2.items()}
            if conj_target
            else dict(params2)
        )

        def one(off, acc):
            p1 = slice_params(params1, base + off)
            ops = []
            for kind, key in spec.operands:
                ops.append(p1[key] if kind == "core" else p2[key])
            val = jnp.einsum(spec.equation, *ops, optimize="auto")
            val = jnp.where(base + off < total, val, jnp.zeros_like(val))
            return acc + val

        acc0 = jnp.zeros((), dtype=jax.tree.leaves(params1)[0].dtype)
        # vary only over the model axis: the psum removes it again and the
        # scalar output stays replicated over every other axis
        acc0 = jax.lax.pcast(acc0, (model_axis,), to="varying")
        acc = jax.lax.fori_loop(0, local, one, acc0) if local > 1 else one(0, acc0)
        return jax.lax.psum(acc, model_axis)

    # all other mesh axes: replicated compute (specify them as unmapped)
    in_specs = (P(), P())

    @partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=P()
    )
    def sharded(params1, params2):
        return contract(params1, params2)

    return sharded


def make_sliced_log_overlap_fn(
    graph: CircuitGraph,
    mesh: Mesh,
    bonds: Optional[Sequence[BondKey]] = None,
    model_axis: str = "model",
    pair: bool = False,
):
    """``fn(params_a, params_b) -> log|⟨A, B⟩|``, bond-sliced over
    ``model_axis`` and float32-safe at ANY qubit count.

    This is the multi-chip path of the 30+-qubit network-fidelity
    experiment.  The raw-valued sliced overlap
    (:func:`make_sliced_two_network_fn`) under/overflows float32 beyond
    ~24 qubits — exactly where slicing is needed — so here each slice
    partial is computed by a RESCALED executor (the row sweep for layered
    circuits, the pairwise executor otherwise) in ``(mantissa, log_scale)``
    form, partials are accumulated per device in running-max-normalized
    form, and devices combine via a group max of the log-scales followed by
    a ``psum`` of renormalized mantissas — the direct analogue of the
    reference's cross-rank TNTensor log-scale max-exchange
    (``tneq_qc/distributed/engine/distributed_engine.py:1437-1472``).
    Scales are stop-gradiented throughout, so gradients of the LOG overlap
    are exact and flow through the ``psum`` (differentiable collectives).

    Only the A side is sliced (⟨A,B⟩ sums over A's bond indices; B keeps
    full tensors), so the same ``fn`` serves ⟨p,t⟩ and ⟨p,p⟩ in the
    fidelity.

    ``pair=True``: params are stacked-real pairs (``[2, *shape]``,
    ``ops/complex_pair.py``) and slice partials contract in pair
    arithmetic — the complex flagship's multi-chip path on backends
    without complex64.
    """
    from ..graph.surgery import with_bond_ranks
    from ..ops.pairwise import make_log_abs_two_network_fn
    from ..ops.row_scan import make_row_scan_log_overlap_fn, supports_row_scan

    n_model = mesh.shape[model_axis]
    if bonds is None:
        bonds = choose_slice_bonds(graph, n_model, prefer_early_rows=True)
    bonds = tuple(bonds)
    ranks = []
    slice_axes: dict = {}
    for b_i, (i, j, q) in enumerate(bonds):
        edge = next(
            e
            for e in graph.cores[i].in_edges + graph.cores[i].out_edges
            if e.qubit == q and e.neighbor == j
        )
        ranks.append(edge.rank)
        for ci, other in ((i, j), (j, i)):
            core = graph.cores[ci]
            edges = core.in_edges + core.out_edges
            axis = next(
                k
                for k, e in enumerate(edges)
                if e.qubit == q and e.neighbor == other
            )
            slice_axes.setdefault(core.name, []).append((b_i, axis))
    ranks = tuple(ranks)
    total = int(np.prod(ranks)) if ranks else 1
    local = -(-total // n_model)  # ceil: pad, mask the tail

    graph_sliced = with_bond_ranks(graph, {b: 1 for b in bonds})
    if pair:
        from ..ops.complex_pair import make_pair_log_abs_two_network_fn

        overlap_slice = make_pair_log_abs_two_network_fn(
            graph_sliced, graph, signed=True
        )
    elif supports_row_scan(graph_sliced, graph):
        overlap_slice = make_row_scan_log_overlap_fn(
            graph_sliced, graph_b=graph, signed=True
        )
    else:
        overlap_slice = make_log_abs_two_network_fn(
            graph_sliced, graph, signed=True
        )
    # pair tensors carry a leading [2] axis: core axes shift by one
    axis_off = 1 if pair else 0

    def slice_params(params, flat_idx):
        idxs = []
        rem = flat_idx
        for r in reversed(ranks):
            idxs.append(rem % r)
            rem = rem // r
        idxs = idxs[::-1]
        out = dict(params)
        for name, axes in slice_axes.items():
            arr = out[name]
            # keepdims slices (size-1 axes): positions stay valid in any
            # order and shapes match graph_sliced
            for b_i, axis in axes:
                arr = jax.lax.dynamic_slice_in_dim(
                    arr, idxs[b_i], 1, axis + axis_off
                )
            out[name] = arr
        return out

    def contract(params_a, params_b):
        shard = jax.lax.axis_index(model_axis)
        base = shard * local

        def one(off, carry):
            m, l = carry
            idx = base + off
            pa = slice_params(params_a, idx)
            ms, ls = overlap_slice(pa, params_b)
            valid = idx < total
            ms = jnp.where(valid, ms, jnp.zeros_like(ms))
            ls = jnp.where(valid, ls, jnp.full_like(ls, _NEG))
            # running max-normalized accumulation: sum = m·e^l stays
            # represented with |m| ~ O(1) however the slice scales differ
            hi = jnp.maximum(l, ls)
            m = m * jnp.exp(l - hi) + ms * jnp.exp(ls - hi)
            return m, hi

        dtype = jax.tree.leaves(params_a)[0].dtype
        m0 = jnp.zeros((2,) if pair else (), dtype)
        l0 = jnp.full((), _NEG, jnp.float32)
        # the body reads axis_index -> carries vary over the model axis
        m0 = jax.lax.pcast(m0, (model_axis,), to="varying")
        l0 = jax.lax.pcast(l0, (model_axis,), to="varying")
        if local > 1:
            m, l = jax.lax.fori_loop(0, local, one, (m0, l0))
        else:
            m, l = one(0, (m0, l0))
        # cross-device combine: group-max normalize then psum mantissas
        # (reference max-exchange, distributed_engine.py:1437-1472); the
        # log-scales are stop-gradient throughout, so the whole gradient
        # rides the differentiable psum of mantissas
        gmax = jax.lax.stop_gradient(jax.lax.pmax(l, model_axis))
        m_tot = jax.lax.psum(m * jnp.exp(l - gmax), model_axis)
        if pair:
            from ..ops.complex_pair import pair_abs2 as _pabs2

            return gmax + 0.5 * jnp.log(_pabs2(m_tot) + _TINY)
        return gmax + jnp.log(jnp.abs(m_tot) + _TINY)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P())
    def sharded(params_a, params_b):
        return contract(params_a, params_b)

    return sharded


def sliced_nll_loss(
    graph: CircuitGraph,
    mesh: Mesh,
    params,
    states,
    measures,
    bonds: Optional[Sequence[BondKey]] = None,
    model_axis: str = "model",
    data_axis: Optional[str] = "data",
) -> jax.Array:
    """NLL of Born probabilities through the sliced/sharded contraction."""
    fn = make_sliced_siamese_fn(
        graph, mesh, bonds, model_axis, data_axis
    )
    raw = fn(params, states, measures)
    probs = abs_square(raw) if jnp.iscomplexobj(raw) else raw
    return nll_loss(probs)
