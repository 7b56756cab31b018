"""Pairwise einsum execution with per-step rescaling: float32-safe
log-space contraction for ANY topology.

The dense einsum of a two-network overlap overflows/underflows float32
beyond ~24 qubits even on max-abs-normalized cores (the running product
grows multiplicatively with network depth).  The MPS chain case was solved
in round 1 by a rescaled transfer-matrix ``lax.scan``
(``train/network_fit.py``); this module generalizes the idea to arbitrary
graphs — the reference's flagship brick wall above all
(``symmetry_breaking_quantum.py:107-146``) — by executing an einsum as its
explicit pairwise contraction path and renormalizing the intermediate after
EVERY pairwise step:

    t_k   <- contract(t_i, t_j)
    s_k    = stop_gradient(max|t_k| + tiny)
    t_k   <- t_k / s_k ;  log_scale += log(s_k)

Scales go through ``stop_gradient``: gradients of the LOG of the result are
exact (the rescale cancels between mantissa and scale — same argument as the
chain scan, and as the reference's detached log-scale trick,
``engine_siamese.py:524-530``).

Path selection is memory-guarded: the flops-optimal path (native C++
pathfinder / opt_einsum greedy) is simulated for intermediate sizes and
rejected in favor of a row-major sweep order (the boundary-MPS schedule for
layered circuits) if it would materialize an intermediate beyond
``max_intermediate``.  All shapes are static — the unrolled pairwise
contractions jit/fuse on TPU like any other XLA program.
"""

from __future__ import annotations

import logging
from functools import lru_cache
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pairwise_steps",
    "choose_path",
    "execute_pairwise",
    "log_abs_einsum",
    "make_log_abs_overlap_fn",
    "make_log_abs_two_network_fn",
]

_TINY = 1e-30

Step = Tuple[int, int, str]  # (i, j, "sub_i,sub_j->sub_out")


def _linear_path(n: int) -> List[Tuple[int, int]]:
    """((o0·o1)·o2)·...: sequential left-fold over the operand order.

    opt_einsum convention appends each result at the END of the operand
    list, so after the first step the running result sits at the last
    position: fold steps contract (0, len-1).
    """
    if n <= 1:
        return []
    path = [(0, 1)]
    for remaining in range(n - 1, 1, -1):
        path.append((0, remaining - 1))
    return path


def pairwise_steps(
    equation: str, path: Sequence[Tuple[int, int]]
) -> List[Step]:
    """Resolve an opt_einsum-style path into explicit two-operand einsums.

    Each step names current-list positions ``(i, j)``; both are removed and
    the step result appended (opt_einsum execution convention).  The step's
    output keeps every symbol still needed by remaining operands or by the
    final output, in first-appearance order.
    """
    lhs, rhs = equation.split("->")
    cur = lhs.split(",")
    steps: List[Step] = []
    for step_i, (i, j) in enumerate(path):
        if i == j:
            raise ValueError("path step contracts an operand with itself")
        a, b = cur[i], cur[j]
        hi, lo = max(i, j), min(i, j)
        cur.pop(hi)
        cur.pop(lo)
        if step_i == len(path) - 1 and not cur:
            # last step: emit the requested output order exactly
            if not set(rhs) <= set(a + b):
                raise ValueError(
                    f"output {rhs!r} references symbols missing from the "
                    f"final operands {a!r},{b!r}"
                )
            out = rhs
        else:
            keep = set(rhs) | set("".join(cur))
            out = "".join(dict.fromkeys(ch for ch in a + b if ch in keep))
        steps.append((i, j, f"{a},{b}->{out}"))
        cur.append(out)
    if len(cur) != 1:
        raise ValueError(f"path does not contract to one operand: {cur}")
    if set(cur[0]) != set(rhs):
        raise ValueError(f"path output {cur[0]!r} != equation output {rhs!r}")
    return steps


def _index_sizes(equation: str, shapes: Sequence[Tuple[int, ...]]):
    lhs, _ = equation.split("->")
    dims = {}
    for sub, shape in zip(lhs.split(","), shapes):
        dims.update(zip(sub, shape))
    return dims


def _max_intermediate_size(
    equation: str, shapes: Sequence[Tuple[int, ...]], path
) -> int:
    """Largest intermediate (in elements) the path would materialize."""
    dims = _index_sizes(equation, shapes)
    biggest = 0
    for _, _, eq in pairwise_steps(equation, path):
        out = eq.split("->")[1]
        size = int(np.prod([dims[ch] for ch in out], dtype=np.float64)) if out else 1
        biggest = max(biggest, size)
    return biggest


def path_flops(
    equation: str, shapes: Sequence[Tuple[int, ...]], path
) -> float:
    """Exact real FLOPs of executing the path: 2·prod(union-of-index sizes)
    per pairwise step (one multiply-add = 2 FLOPs)."""
    dims = _index_sizes(equation, shapes)
    total = 0.0
    for _, _, eq in pairwise_steps(equation, path):
        union = set(eq.split("->")[0].replace(",", ""))
        total += 2.0 * float(
            np.prod([dims[ch] for ch in union], dtype=np.float64)
        )
    return total


@lru_cache(maxsize=512)
def choose_path(
    equation: str,
    shapes: Tuple[Tuple[int, ...], ...],
    max_intermediate: int = 1 << 26,
    strict: bool = False,
) -> Tuple[Tuple[int, int], ...]:
    """Native (pathfinder) path when its intermediates fit memory, else the
    linear row-major sweep.

    Wall-clock measurement (docs/ROUND2.md) shows the native path's bushier
    contraction tree beats the strictly-sequential sweep by ~4.5x on the
    16q5c brick wall DESPITE costing ~8x the FLOPs — the sweep is a long
    dependency chain of tiny ops (dispatch/latency-bound), so flops-minimal
    is the wrong runtime criterion here.  The linear candidate remains the
    memory fallback: callers pre-order operands row-major so it contracts
    layered circuits as a boundary-MPS with small environments.
    """
    n = len(shapes)
    if n <= 2:
        return tuple(_linear_path(n))
    from ..native.path import find_path

    try:
        native = find_path(equation, shapes)
    except Exception:
        native = None
    native_sz = (
        _max_intermediate_size(equation, shapes, native)
        if native is not None
        else None
    )
    if native_sz is not None and native_sz <= max_intermediate:
        return tuple(native)
    # the fallback is memory-checked too (ADVICE r2): callers that
    # pre-order operands row-major get a small boundary-MPS sweep, but
    # log_abs_einsum accepts arbitrary equations where the left-fold can
    # blow past the cap just as badly as a bad native path
    linear = _linear_path(n)
    linear_sz = _max_intermediate_size(equation, shapes, linear)
    if linear_sz <= max_intermediate:
        return tuple(linear)
    # No path fits the cap.  strict=True hard-fails; the default keeps the
    # guard VISIBLE but not fatal — return the smaller of the two paths
    # with a loud warning, so slow-but-correct contractions that worked
    # before the cap was enforced keep working (code-review r3: the raise
    # turned working large-env flows into build-time failures).
    best, best_sz = (
        (native, native_sz)
        if native_sz is not None and native_sz < linear_sz
        else (linear, linear_sz)
    )
    msg = (
        f"no contraction path fits max_intermediate={max_intermediate}: "
        f"proceeding with a {best_sz}-element intermediate "
        f"(native: {native_sz}, linear: {linear_sz})"
    )
    if strict:
        raise ValueError(msg)
    logging.getLogger(__name__).warning(msg)
    return tuple(best)


def execute_pairwise(
    steps: Sequence[Step],
    operands: Sequence[jax.Array],
    contract_pair: Optional[Callable] = None,
    rescale: bool = False,
):
    """Run the resolved steps; returns ``final`` or ``(final, log_scale)``.

    ``contract_pair(eq, a, b)`` defaults to ``jnp.einsum``; the
    complex-as-real lowering substitutes a stacked-real multiply here.
    With ``rescale=True`` every intermediate is max-abs normalized and the
    accumulated log-scale returned alongside (stop-gradient scales: LOG
    gradients stay exact).
    """
    if contract_pair is None:
        contract_pair = lambda eq, a, b: jnp.einsum(eq, a, b)  # noqa: E731
    ops = list(operands)
    logs = None
    for i, j, eq in steps:
        a, b = ops[i], ops[j]
        hi, lo = max(i, j), min(i, j)
        ops.pop(hi)
        ops.pop(lo)
        t = contract_pair(eq, a, b)
        if rescale:
            s = jax.lax.stop_gradient(jnp.max(jnp.abs(t)) + _TINY)
            t = t / s
            step_log = jnp.log(s)
            logs = step_log if logs is None else logs + step_log
        ops.append(t)
    final = ops[0]
    if rescale:
        if logs is None:  # zero-step (single operand) case
            logs = jnp.zeros((), jnp.result_type(final.real if jnp.iscomplexobj(final) else final))
        return final, logs
    return final


def rescaled_execute(
    equation: str,
    operands: Sequence[jax.Array],
    max_intermediate: int = 1 << 26,
):
    """Plan (memoized via :func:`choose_path`) and execute ``equation``
    through the per-step-rescaled pairwise executor.  Returns
    ``(mantissa, log_scale)`` with ``true_value = mantissa·exp(log_scale)``
    — the one entry point for every rescale=True caller (siamese value/env,
    two-network overlaps, log_abs_einsum)."""
    shapes = tuple(tuple(int(d) for d in np.shape(o)) for o in operands)
    path = choose_path(equation, shapes, max_intermediate)
    steps = pairwise_steps(equation, list(path))
    return execute_pairwise(steps, operands, rescale=True)


def log_abs_einsum(
    equation: str,
    operands: Sequence[jax.Array],
    max_intermediate: int = 1 << 26,
) -> jax.Array:
    """log|einsum(equation, *operands)| for a SCALAR-output einsum,
    float32-stable at any network depth (per-step renormalization)."""
    if not equation.endswith("->"):
        raise ValueError("log_abs_einsum requires a scalar-output equation")
    final, logs = rescaled_execute(equation, operands, max_intermediate)
    return logs + jnp.log(jnp.abs(final) + _TINY)


def row_major_core_order(graph) -> List[int]:
    """Core indices sorted by (lowest qubit touched, symbol index): the
    qubit-sweep order that keeps boundary environments small for layered
    circuits (brick wall / wall_col)."""

    def min_qubit(c):
        return min(e.qubit for e in c.in_edges + c.out_edges)

    return sorted(range(graph.ncores), key=lambda i: (min_qubit(graph.cores[i]), i))


def make_log_abs_overlap_fn(graph, max_intermediate: int = 1 << 26):
    """fn(params_a, params_b) -> log|⟨A, B⟩| for two same-graph networks.

    Generalizes the chain transfer scan to ANY topology: the two-network
    overlap equation's operands are pre-ordered row-major and interleaved
    (A-core, B-core per slot) so the linear-path fallback IS the
    boundary-MPS sweep; the flops-optimal native path is used when its
    intermediates fit.  B-side cores are conjugated (Hermitian overlap).
    """
    return make_log_abs_two_network_fn(graph, None, max_intermediate)


def two_network_interleave(graph_a, graph_b=None):
    """Shared operand ordering for two-network overlaps: interleave
    row-major slots of the two networks (A_k then B_k per slot, the
    boundary-MPS pairing) so the linear fallback stays a boundary sweep.
    Different core counts (unequal topologies, the GA candidate-vs-goal
    case) interleave by zip as far as possible and append the remainder.

    Returns ``(equation, slots)`` where ``slots`` is ``[(side, name),...]``
    ('a' operands come from params_a, 'b' from params_b — the caller
    conjugates the B side).  Consumed by both the complex/real executor
    below and the stacked-real pair twin
    (``complex_pair.make_pair_log_abs_two_network_fn``)."""
    from .einsum_spec import two_network_spec

    gb = graph_b if graph_b is not None else graph_a
    spec = two_network_spec(graph_a, gb)
    lhs, rhs = spec.equation.split("->")
    subs = lhs.split(",")
    n = graph_a.ncores
    order_a = row_major_core_order(graph_a)
    order_b = row_major_core_order(gb)
    perm: List[int] = []
    slots: List[Tuple[str, str]] = []
    m = min(len(order_a), len(order_b))
    for i in range(m):
        perm.append(order_a[i])
        slots.append(("a", graph_a.cores[order_a[i]].name))
        perm.append(n + order_b[i])
        slots.append(("b", gb.cores[order_b[i]].name))
    for k in order_a[m:]:
        perm.append(k)
        slots.append(("a", graph_a.cores[k].name))
    for k in order_b[m:]:
        perm.append(n + k)
        slots.append(("b", gb.cores[k].name))
    equation = ",".join(subs[p] for p in perm) + "->" + rhs
    return equation, slots


def make_log_abs_two_network_fn(
    graph_a,
    graph_b=None,
    max_intermediate: int = 1 << 26,
    signed: bool = False,
):
    """fn(params_a, params_b) -> log|⟨A, B⟩| for two networks.

    ``graph_b`` may be a DIFFERENT topology (or the same topology with
    different internal bond ranks — the sliced multi-chip case); it only
    needs matching boundary ranks.  Operands are pre-ordered row-major per
    network and interleaved so the linear fallback stays a boundary sweep.
    B-side cores are conjugated (Hermitian overlap).

    ``signed=True``: return ``(mantissa, log_scale)`` — the summable form
    for slice partials (see ``ops/row_scan.py``).
    """
    equation, slots = two_network_interleave(graph_a, graph_b)

    def fn(params_a, params_b):
        ops = []
        for side, name in slots:
            if side == "a":
                ops.append(params_a[name])
            else:
                ops.append(jnp.conj(params_b[name]))
        if not signed:
            return log_abs_einsum(equation, ops, max_intermediate)
        return rescaled_execute(equation, ops, max_intermediate)

    return fn
