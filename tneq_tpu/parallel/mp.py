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

__all__ = ["choose_slice_bonds", "make_sliced_siamese_fn", "sliced_nll_loss"]

BondKey = Tuple[int, int, int]  # (min_core_idx, max_core_idx, qubit)


def _internal_bonds(graph: CircuitGraph) -> List[Tuple[BondKey, int]]:
    seen = {}
    for core in graph.cores:
        for e in core.out_edges:
            if e.neighbor >= 0:
                key = (min(core.index, e.neighbor), max(core.index, e.neighbor), e.qubit)
                seen.setdefault(key, e.rank)
    return sorted(seen.items())


def choose_slice_bonds(graph: CircuitGraph, n_slices: int) -> Tuple[BondKey, ...]:
    """Greedily pick internal bonds whose rank product covers ``n_slices``
    (slice-count per device = ceil(product / n_slices); a non-divisible
    product is padded and masked).

    The reference instead shards the cut-index product of its fixed core
    partition (``distributed_engine.py:1384-1435``); choosing max-rank bonds
    keeps per-slice work MXU-shaped.
    """
    if n_slices == 1:
        return ()
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
