"""Probability inference APIs: full / marginal / conditional.

Rebuild of ``EngineSiamese.calculate_{full,marginal,conditional}_probability``
(``tneq_qc/core/engine_siamese.py:561-734``) on the jitted siamese
contraction:

- marginal: unmeasured qubits get (batched) identity operators;
- conditional: each qubit's operator is stacked ``[joint, marginal]`` along
  an extra axis so both contract in ONE batched pass, then divided.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph
from ..ops.contract import abs_square, make_siamese_fn

__all__ = ["full_probability", "marginal_probability", "conditional_probability"]


def _born(raw: jax.Array) -> jax.Array:
    return abs_square(raw) if jnp.iscomplexobj(raw) else raw


def _states_batched(states: Sequence[jax.Array]) -> bool:
    return any(getattr(s, "ndim", 1) == 2 for s in states)


def full_probability(
    graph: CircuitGraph,
    params,
    states: Sequence[jax.Array],
    measures: Sequence[jax.Array],
    log: bool = False,
) -> jax.Array:
    """P(outcomes) for a complete per-qubit measurement batch ``(B, K, K)``.

    ``log=True`` returns log P through the per-step-rescaled executor —
    the only representable form at 30+ qubits, where P itself under/
    overflows float32 (the dense reference path, ``engine_siamese.py:561-582``,
    cannot reach that regime)."""
    if log:
        fn = make_siamese_fn(
            graph,
            with_states=True,
            states_batched=_states_batched(states),
            measure_extra_dims=1,
            rescale=True,
        )
        raw, log_scale = fn(params, states, measures)
        p_m = _born(raw)
        factor = 2.0 if jnp.iscomplexobj(raw) else 1.0
        return jnp.log(p_m + 1e-30) + factor * log_scale
    fn = make_siamese_fn(
        graph,
        with_states=True,
        states_batched=_states_batched(states),
        measure_extra_dims=1,
    )
    return _born(fn(params, states, measures))


def _identity_like(measures: Sequence[jax.Array], rank: int):
    """Identity operator matching the batch shape of the given measures."""
    m0 = measures[0]
    ident = jnp.asarray(np.eye(rank, dtype=np.dtype(m0.dtype)))
    if m0.ndim == 3:
        return jnp.broadcast_to(ident[None], (m0.shape[0], rank, rank))
    return ident


def marginal_probability(
    graph: CircuitGraph,
    params,
    states: Sequence[jax.Array],
    measures: Sequence[jax.Array],
    qubit_indices: Sequence[int],
    log: bool = False,
) -> jax.Array:
    """P over a subset of qubits: identity operators trace out the rest
    (reference ``engine_siamese.py:584-645``).  ``log=True``: see
    :func:`full_probability`."""
    if len(qubit_indices) != len(measures):
        raise ValueError("qubit_indices length must match measures length")
    full = []
    ranks = graph.output_ranks
    by_qubit = dict(zip(qubit_indices, measures))
    for q in range(graph.nqubits):
        if q in by_qubit:
            full.append(by_qubit[q])
        else:
            full.append(_identity_like(measures, ranks[q]))
    return full_probability(graph, params, states, full, log=log)


def conditional_probability(
    graph: CircuitGraph,
    params,
    states: Sequence[jax.Array],
    measures: Sequence[jax.Array],
    qubit_indices: Sequence[int],
    target_indices: Sequence[int],
    epsilon: float = 1e-10,
    rescale=None,
) -> jax.Array:
    """P(target | condition) via the stacked-[M, I] trick
    (reference ``engine_siamese.py:647-734``).

    ``measures`` covers ``qubit_indices`` (targets + conditions).  Each
    qubit's operator becomes a ``(B, 2, K, K)`` stack — slot 0 computes the
    joint, slot 1 (identity on targets) the conditioning marginal — and one
    contraction yields both; the ratio is the conditional probability.

    ``rescale``: route through the per-step-rescaled executor — the shared
    log-scale cancels in the joint/marginal ratio, so the CONDITIONAL stays
    exactly representable at 30+ qubits even though joint and marginal
    individually do not.  ``None`` = auto (on from 16 qubits).
    """
    if rescale is None:
        rescale = graph.nqubits >= 16
    if len(qubit_indices) != len(measures):
        raise ValueError("qubit_indices length must match measures length")
    target_set = set(target_indices)
    if not target_set <= set(qubit_indices):
        raise ValueError("target_indices must be a subset of qubit_indices")
    ranks = graph.output_ranks
    by_qubit = dict(zip(qubit_indices, measures))
    stacked = []
    for q in range(graph.nqubits):
        if q in by_qubit:
            m = by_qubit[q]
            ident = _identity_like(measures, ranks[q])
            if q in target_set:
                pair = jnp.stack([m, ident], axis=-3)
            else:
                pair = jnp.stack([m, m], axis=-3)
        else:
            ident = _identity_like(measures, ranks[q])
            pair = jnp.stack([ident, ident], axis=-3)
        stacked.append(pair)

    fn = make_siamese_fn(
        graph,
        with_states=True,
        states_batched=_states_batched(states),
        measure_extra_dims=2,
        rescale=rescale,
    )
    raw = fn(params, states, stacked)
    if rescale:
        raw, _ = raw  # one global scale for both slots: cancels in the ratio
    both = _born(raw)  # (B, 2)
    joint, cond = both[..., 0], both[..., 1]
    return joint / (cond + epsilon)
