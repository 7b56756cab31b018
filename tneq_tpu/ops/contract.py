"""Contraction compute functions: einsum specs -> pure jittable callables.

One engine for every contraction mode (replaces the reference's Engine /
EngineSiamese / GreedyStrategy / ContractorOptEinsum execution paths):
``jnp.einsum`` with an opt_einsum-chosen pairwise schedule, traced once per
``CircuitGraph`` signature and compiled by XLA onto the MXU.

Born-rule semantics match the reference runtime path
(``engine_siamese.py:332-349`` + ``greedy_strategy.py:676-680``): the bra
side is the complex conjugate of the ket side, and for complex dtypes the
probability is ``|result|²`` (``abs_square``), for real dtypes the raw
siamese value.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..graph.dsl import CircuitGraph
from .einsum_spec import (
    EinsumSpec,
    core_only_spec,
    siamese_env_spec,
    siamese_spec,
    two_network_spec,
    with_inputs_spec,
)

__all__ = [
    "contract_cores",
    "make_core_only_fn",
    "make_with_inputs_fn",
    "make_siamese_fn",
    "make_two_network_fn",
    "siamese_probability",
    "abs_square",
]

Params = Dict[str, jax.Array]


def abs_square(x: jax.Array) -> jax.Array:
    """|x|² as a real array (Born rule; reference ``backend_interface`` abs_square)."""
    if jnp.iscomplexobj(x):
        return jnp.real(x) ** 2 + jnp.imag(x) ** 2
    return x * x


def _gather_operands(
    spec: EinsumSpec,
    params: Params,
    states: Optional[Sequence[jax.Array]] = None,
    measures: Optional[Sequence[jax.Array]] = None,
    target_params: Optional[Params] = None,
    conj_right: bool = True,
) -> List[jax.Array]:
    ops: List[jax.Array] = []
    for kind, key in spec.operands:
        if kind == "core":
            ops.append(params[key])
        elif kind == "core_conj":
            ops.append(jnp.conj(params[key]) if conj_right else params[key])
        elif kind == "state":
            ops.append(states[key])
        elif kind == "state_conj":
            ops.append(jnp.conj(states[key]) if conj_right else states[key])
        elif kind == "measure":
            ops.append(measures[key])
        elif kind == "target_core":
            ops.append(target_params[key])
        else:  # pragma: no cover
            raise ValueError(f"unknown operand kind {kind}")
    return ops


from functools import lru_cache


@lru_cache(maxsize=1024)
def _cached_native_path(equation: str, shapes: tuple):
    from ..native.path import find_path

    try:
        return find_path(equation, shapes)
    except Exception:
        return None


# Use the native C++ path search (exact DP for small networks, greedy for
# large ones) once past trivial sizes; below that opt_einsum's 'auto'
# (optimal up to 4 operands) is already exact.
_NATIVE_PATH_MIN_OPERANDS = 5


def _einsum(spec: EinsumSpec, ops: List[jax.Array]) -> jax.Array:
    optimize = "auto"
    if len(ops) >= _NATIVE_PATH_MIN_OPERANDS:
        path = _cached_native_path(
            spec.equation, tuple(tuple(o.shape) for o in ops)
        )
        if path is not None:
            optimize = path
    return jnp.einsum(spec.equation, *ops, optimize=optimize)


# ---------------------------------------------------------------------------
# Public compute-function factories
# ---------------------------------------------------------------------------


def make_core_only_fn(graph: CircuitGraph, order: str = "reference"):
    """fn(params) -> dense circuit tensor with open boundary legs."""
    spec = core_only_spec(graph, order)

    def fn(params: Params) -> jax.Array:
        return _einsum(spec, _gather_operands(spec, params))

    return fn


def contract_cores(graph: CircuitGraph, params: Params, order: str = "reference"):
    return make_core_only_fn(graph, order)(params)


def make_with_inputs_fn(graph: CircuitGraph, batched: bool = True):
    """fn(params, states) -> output-boundary tensor (circuit applied to inputs)."""
    spec = with_inputs_spec(graph, batched)

    def fn(params: Params, states: Sequence[jax.Array]) -> jax.Array:
        return _einsum(spec, _gather_operands(spec, params, states=states))

    return fn


def make_siamese_fn(
    graph: CircuitGraph,
    with_states: bool = True,
    states_batched: bool = False,
    measure_extra_dims: int = 1,
    conj_right: bool = True,
    rescale: bool = False,
):
    """fn(params, states, measures) -> raw siamese value ``[batch...]``.

    ``states``: per-qubit list of ``(rank,)`` (or ``(B, rank)`` when
    ``states_batched``); ``measures``: per-qubit list of
    ``(B..., K_out, K_out')`` operators with ``measure_extra_dims`` leading
    axes.  The bra side is conjugated (no-op for real dtypes).

    ``rescale=True``: execute through the per-step max-abs-rescaled
    pairwise executor and return ``(value, log_scale)``
    (``true_value = value·exp(log_scale)``) — float32-safe at 30+ qubits
    (see :func:`make_siamese_env_fn`).
    """
    spec = siamese_spec(graph, with_states, states_batched, measure_extra_dims)

    def _validate(states, measures):
        if len(measures) != graph.nqubits:
            raise ValueError(
                f"need one measurement operator per qubit "
                f"({graph.nqubits}), got {len(measures)}"
            )
        for q, (m, r) in enumerate(zip(measures, graph.output_ranks)):
            if m.shape[-1] != r or m.shape[-2] != r:
                raise ValueError(
                    f"measurement operator on qubit {q} has shape {m.shape} "
                    f"but the circuit's output rank there is {r} — the "
                    f"Hermite order K must equal the qubit's output rank"
                )
        if with_states:
            if states is None or len(states) != graph.nqubits:
                raise ValueError(
                    f"need one input state per qubit ({graph.nqubits}), "
                    f"got {0 if states is None else len(states)}"
                )
            for q, (s, r) in enumerate(zip(states, graph.input_ranks)):
                if s.shape[-1] != r:
                    raise ValueError(
                        f"input state on qubit {q} has shape {s.shape} but "
                        f"the circuit's input rank there is {r}"
                    )

    def fn(
        params: Params,
        states: Optional[Sequence[jax.Array]],
        measures: Sequence[jax.Array],
    ) -> jax.Array:
        _validate(states, measures)
        ops = _gather_operands(
            spec, params, states=states, measures=measures, conj_right=conj_right
        )
        if not rescale:
            return _einsum(spec, ops)
        from .pairwise import rescaled_execute

        return rescaled_execute(spec.equation, ops, 1 << 28)

    return fn


def make_siamese_env_fn(
    graph: CircuitGraph,
    open_qubit: int,
    with_states: bool = True,
    states_batched: bool = False,
    rescale: bool = False,
):
    """fn(params, states, measures) -> environment ``[B, K, K]`` with
    ``open_qubit``'s measurement slot left open.

    ``measures`` is a FULL per-qubit list; the entry at ``open_qubit`` is
    ignored (no operand consumes it).  The siamese value for any operator M
    on that qubit is then ``einsum('bkl,...kl->b...', env, M)`` — the
    sampler's grid evaluation becomes one tiny inner product instead of an
    S×G re-contraction of the whole network.

    ``rescale=True``: execute through the per-step max-abs-rescaled
    pairwise executor and return ``(env, log_scale)`` with
    ``true_env = env·exp(log_scale)`` — float32-safe at 30+ qubits where
    the dense einsum under/overflows (the sampler's CDF is scale-invariant
    per qubit, so it can drop the log; reference comparison:
    ``engine_siamese.py:740-915`` is dense and cannot reach this regime).
    """
    spec = siamese_env_spec(graph, open_qubit, with_states, states_batched)

    def fn(
        params: Params,
        states: Optional[Sequence[jax.Array]],
        measures: Sequence[jax.Array],
    ) -> jax.Array:
        ops = _gather_operands(spec, params, states=states, measures=measures)
        if not rescale:
            return _einsum(spec, ops)
        from .pairwise import rescaled_execute

        return rescaled_execute(spec.equation, ops, 1 << 28)

    return fn


def siamese_probability(
    graph: CircuitGraph,
    params: Params,
    states: Optional[Sequence[jax.Array]],
    measures: Sequence[jax.Array],
    states_batched: bool = False,
    measure_extra_dims: int = 1,
) -> jax.Array:
    """Born-rule probability of the measurement outcome batch.

    Real dtypes: the siamese value itself (already ⟨ψ|M|ψ⟩ ≥ 0).  Complex
    dtypes: ``|value|²`` — the reference's exact convention
    (``engine_siamese.py:332-349``).
    """
    fn = make_siamese_fn(
        graph,
        with_states=states is not None,
        states_batched=states_batched,
        measure_extra_dims=measure_extra_dims,
    )
    raw = fn(params, states, measures)
    if jnp.iscomplexobj(raw):
        return abs_square(raw)
    return raw


def make_two_network_fn(
    graph1: CircuitGraph, graph2: CircuitGraph, conj_target: bool = False
):
    """fn(params1, params2) -> scalar overlap of two circuits.

    ``conj_target=False`` reproduces the reference's unconjugated glue
    (``einsum_strategy.py:320-416``); True gives the Hermitian inner product.
    """
    spec = two_network_spec(graph1, graph2)

    def fn(params1: Params, params2: Params) -> jax.Array:
        if conj_target:
            params2 = {k: jnp.conj(v) for k, v in params2.items()}
        return _einsum(
            spec, _gather_operands(spec, params1, target_params=params2)
        )

    return fn
