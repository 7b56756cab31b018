"""Row-sweep overlap contraction: O(1)-size compiled program for layered
2-local circuits (brick wall / wall_col).

The generic rescaled pairwise executor (``ops/pairwise.py``) unrolls one
einsum per contraction step, so its compiled program — and XLA compile time
— grows with qubit count (318 s on CPU for the 32q×5c brick-wall fit).
This module contracts the two-network overlap ⟨A,B⟩ as a boundary sweep
over QUBIT ROWS instead: the environment between rows q and q+1 carries the
row-(q+1) legs of the cores spanning that cut (size ``r^(4·n_cells)``,
independent of n_qubits), each row is absorbed by ONE einsum, and rows with
identical structure run under ``jax.lax.scan`` with stacked cores — the
program size no longer depends on the qubit count, exactly like the MPS
chain scan (``train/network_fit._chain_log_overlap``).

Per-row max-abs rescaling (stop-gradient scales) keeps the sweep
float32-stable at any depth; gradients of the LOG overlap are exact.

Applies to graphs where every core spans exactly two adjacent qubit rows
(the reference's flagship topology, ``symmetry_breaking_quantum.py:107-125``);
``supports_row_scan`` reports applicability and callers fall back to the
generic executor otherwise.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph, get_symbol

__all__ = [
    "supports_row_scan",
    "same_topology",
    "build_row_steps",
    "make_row_scan_log_overlap_fn",
]

_TINY = 1e-30

# env entries beyond this are refused (r^(4*n_cells) grows with depth; the
# generic pairwise path handles deep-narrow circuits instead)
MAX_ENV_ELEMENTS = 1 << 24


def _core_rows(core) -> Tuple[int, ...]:
    return tuple(sorted({e.qubit for e in core.in_edges + core.out_edges}))


def same_topology(graph_a: CircuitGraph, graph_b: CircuitGraph) -> bool:
    """True when the two graphs differ at most in INTERNAL bond ranks:
    same cores/names, same edge wiring (qubit + neighbor per slot), same
    boundary-leg ranks.  The overlap ⟨A, B⟩ of such a pair is well-defined
    (boundaries glue; internal bonds are per-network) — the sliced
    multi-chip contraction feeds a rank-reduced A against a full B."""
    if graph_a.nqubits != graph_b.nqubits or graph_a.ncores != graph_b.ncores:
        return False
    for ca, cb in zip(graph_a.cores, graph_b.cores):
        if ca.name != cb.name:
            return False
        for ea_list, eb_list in (
            (ca.in_edges, cb.in_edges),
            (ca.out_edges, cb.out_edges),
        ):
            if len(ea_list) != len(eb_list):
                return False
            for ea, eb in zip(ea_list, eb_list):
                if ea.qubit != eb.qubit or ea.neighbor != eb.neighbor:
                    return False
                if ea.neighbor == -1 and ea.rank != eb.rank:
                    return False
    return True


def supports_row_scan(
    graph: CircuitGraph, graph_b: Optional[CircuitGraph] = None
) -> bool:
    """True when every core spans exactly two ADJACENT qubit rows and the
    cut environments stay below ``MAX_ENV_ELEMENTS``.

    With ``graph_b``, checks the two-graph overlap (same topology, ranks
    may differ on internal bonds): env size then multiplies A-side and
    B-side leg ranks."""
    if graph_b is not None and not same_topology(graph, graph_b):
        return False
    if graph.nqubits < 3:
        return False
    gb = graph_b if graph_b is not None else graph
    cuts: Dict[int, List[int]] = {}
    for core in graph.cores:
        rows = _core_rows(core)
        if len(rows) != 2 or rows[1] != rows[0] + 1:
            return False
        cuts.setdefault(rows[0], []).append(core.index)
    # every cut q in [0, n-2] must exist (each row chain non-empty)
    for q in range(graph.nqubits - 1):
        if q not in cuts:
            return False
    # env size: product of the row-(q+1) leg ranks of cut-q cores, both
    # networks
    for q, idxs in cuts.items():
        size_a = size_b = 1
        for i in idxs:
            for e in graph.cores[i].in_edges + graph.cores[i].out_edges:
                if e.qubit == q + 1:
                    size_a *= e.rank
            for e in gb.cores[i].in_edges + gb.cores[i].out_edges:
                if e.qubit == q + 1:
                    size_b *= e.rank
        if size_a * size_b > MAX_ENV_ELEMENTS:
            return False
    return True


class _Sym:
    def __init__(self):
        self.n = 0

    def next(self) -> str:
        s = get_symbol(self.n)
        self.n += 1
        return s


def _row_order(graph: CircuitGraph, idxs: List[int], q: int) -> List[int]:
    """Cut-q cores ordered along the row (both rows q and q+1 give the same
    relative order; use the row-q chain)."""
    chain = [graph.name_to_index[n] for n in graph.qubit_cores(q)]
    pos = {i: k for k, i in enumerate(chain)}
    return sorted(idxs, key=lambda i: pos[i])


def build_row_steps(
    graph: CircuitGraph, graph_b: Optional[CircuitGraph] = None
):
    """Resolve the row sweep into per-row einsum steps.

    Returns ``steps``: a list over rows q=0..n-1 of dicts with
    ``equation`` (einsum over [env?, A-cores..., B-cores...]),
    ``cores`` (cut-q core names in row order; empty for the last row).
    The output axes of each step are the canonical env axis order consumed
    by the next step.

    ``graph_b``: B-side graph when it differs from A in internal bond
    ranks (sliced overlaps); equations are rank-agnostic, only the env
    shapes depend on the per-net graph.
    """
    net_graph = {"A": graph, "B": graph_b if graph_b is not None else graph}
    n = graph.nqubits
    cuts: Dict[int, List[int]] = {}
    for core in graph.cores:
        rows = _core_rows(core)
        cuts.setdefault(rows[0], []).append(core.index)
    cut_order = {q: _row_order(graph, idxs, q) for q, idxs in cuts.items()}

    def row_edges(core, q):
        """(in-then-out) edges of a core on row q, keeping edge-list order."""
        return [e for e in core.in_edges if e.qubit == q] + [
            e for e in core.out_edges if e.qubit == q
        ]

    def edge_class(net: str, core_idx: int, e, is_out: bool):
        """Equivalence class of one edge endpoint on its row.

        Boundary edges glue A↔B (class ignores net); internal bonds pair
        the two endpoint cores within a network.
        """
        if e.neighbor == -1:
            return ("bnd", e.qubit, "out" if is_out else "in")
        a, b = sorted((core_idx, e.neighbor))
        return ("bond", net, e.qubit, a, b)

    steps = []
    # env_axes: canonical list of (net, core_idx, edge-ref) whose symbols
    # the NEXT step must reuse; edge-ref = (is_out, position) on row q+1
    env_axes: List[Tuple[str, int, Tuple[bool, int]]] = []

    for q in range(n):
        sym = _Sym()
        class_syms: Dict[object, str] = {}

        def sym_for(cls):
            if cls not in class_syms:
                class_syms[cls] = sym.next()
            return class_syms[cls]

        # 1. symbols for incoming env axes (resolve their row-q classes)
        env_subscript = ""
        for net, ci, (is_out, pos) in env_axes:
            core = graph.cores[ci]
            edges = core.out_edges if is_out else core.in_edges
            e = edges[pos]
            assert e.qubit == q, (q, net, ci, e)
            env_subscript += sym_for(edge_class(net, ci, e, is_out))

        new_idxs = cut_order.get(q, [])
        # 2. subscripts for the new (cut-q) cores, all edges
        core_subs = {}
        next_env: List[Tuple[str, int, Tuple[bool, int]]] = []
        out_syms: List[str] = []
        for net in ("A", "B"):
            for ci in new_idxs:
                core = graph.cores[ci]
                sub = ""
                for is_out, edges in ((False, core.in_edges), (True, core.out_edges)):
                    for pos, e in enumerate(edges):
                        if e.qubit == q:
                            sub += sym_for(edge_class(net, ci, e, is_out))
                        else:  # row q+1: open env leg
                            s = sym.next()
                            sub += s
                            out_syms.append(s)
                            next_env.append((net, ci, (is_out, pos)))
                core_subs[(net, ci)] = sub

        operands = []
        if env_axes:
            operands.append(env_subscript)
        for net in ("A", "B"):
            for ci in new_idxs:
                operands.append(core_subs[(net, ci)])
        equation = ",".join(operands) + "->" + "".join(out_syms)

        def _axis_rank(net, ci, ref):
            is_out, pos = ref
            core = net_graph[net].cores[ci]
            return (core.out_edges if is_out else core.in_edges)[pos].rank

        in_shape = tuple(_axis_rank(*ax) for ax in env_axes)
        out_shape = tuple(_axis_rank(*ax) for ax in next_env)
        steps.append({
            "equation": equation,
            "cores": [graph.cores[ci].name for ci in new_idxs],
            "has_env": bool(env_axes),
            # the env is CARRIED FLAT between steps: a multi-axis tensor of
            # tiny dims pads ~8x under TPU (8,128) tiling — enough to OOM
            # the 32q fit's saved scan carries.  Reshape to the multi-leg
            # view only inside the step.
            "env_in_shape": in_shape,
            "env_out_shape": out_shape,
        })
        env_axes = next_env
    assert not env_axes, "sweep did not close"
    return steps


@lru_cache(maxsize=64)
def _cached_steps(graph: CircuitGraph, graph_b: Optional[CircuitGraph] = None):
    return build_row_steps(graph, graph_b)


def make_row_scan_log_overlap_fn(
    graph: CircuitGraph,
    batch=None,
    graph_b: Optional[CircuitGraph] = None,
    signed: bool = False,
):
    """fn(params_a, params_b) -> log|⟨A, B⟩| via the row sweep.

    B-side cores are conjugated (Hermitian overlap).  Identical bulk rows
    run as one ``lax.scan`` over stacked cores; non-periodic rows unroll.
    Raises ``ValueError`` when the topology is unsupported
    (check :func:`supports_row_scan` first).

    ``batch=B``: every core carries a leading batch axis of size B and the
    result is a ``[B]`` vector of log-overlaps.  The fidelity's 3 overlaps
    (and the masked fit's 2) share one sweep structure, so batching them
    cuts kernel launches ~Bx — the sweep's narrow contractions are
    latency-bound on the device.  Rescaling is per batch element.

    ``graph_b``: B-side graph with different internal bond ranks (same
    topology); used by the sliced multi-chip overlap where the A side is a
    rank-1-bond slice of the network (``parallel/mp.py``).

    ``signed=True``: return ``(mantissa, log_scale)`` with
    ``value = mantissa·exp(log_scale)`` instead of ``log|value|`` — the
    form slice partials must be summed in (signs/phases matter across
    slices; scales are stop-gradiented so LOG gradients stay exact).
    """
    if not supports_row_scan(graph, graph_b):
        raise ValueError("graph is not a layered 2-local circuit")
    gb = graph_b if graph_b is not None else graph
    steps = _cached_steps(graph, graph_b)
    n = len(steps)

    if batch is None:
        def rescale(v, logs):
            s = jax.lax.stop_gradient(jnp.max(jnp.abs(v)) + _TINY)
            return v / s, logs + jnp.log(s)
    else:
        def rescale(v, logs):
            red = tuple(range(1, v.ndim))
            s = jax.lax.stop_gradient(
                jnp.max(jnp.abs(v), axis=red, keepdims=True) + _TINY
            )
            return v / s, logs + jnp.log(s).reshape(batch)

    def _batched_eq(equation):
        """Prefix a fresh batch symbol to every operand and the output."""
        used = set(equation)
        k = 300
        while get_symbol(k) in used:
            k += 1
        bsym = get_symbol(k)
        lhs, rhs = equation.split("->")
        subs = [bsym + t for t in lhs.split(",")]
        return ",".join(subs) + "->" + bsym + rhs

    def _resolved(step):
        """Pairwise plan for one row einsum with a TIGHT memory guard.

        jnp.einsum's default greedy path on the ~11-operand row equation
        can materialize intermediates hundreds of times the environment
        size (a 27 GB HBM blow-up observed on the 32q fit); the native
        exact-DP search under a cap bounded by a small multiple of the
        environment keeps every intermediate MXU-sized.
        """
        from .pairwise import choose_path, pairwise_steps

        shapes = []
        if step["has_env"]:
            shapes.append(step["env_in_shape"])
        for nm in step["cores"]:
            shapes.append(graph.shapes[nm])
        for nm in step["cores"]:
            shapes.append(gb.shapes[nm])
        if len(shapes) <= 2:
            # 1-operand (final self-glue trace) or trivial 2-operand step:
            # direct einsum, nothing to plan
            return None
        env_sz = max(
            int(np.prod(step["env_in_shape"], dtype=np.int64))
            if step["env_in_shape"] else 1,
            int(np.prod(step["env_out_shape"], dtype=np.int64))
            if step["env_out_shape"] else 1,
        )
        cap = max(64 * env_sz, 1 << 16)
        eq = step["equation"]
        if batch is not None:
            eq = _batched_eq(eq)
            shapes = [(batch,) + tuple(sh) for sh in shapes]
            cap *= batch
        path = choose_path(eq, tuple(shapes), cap)
        return eq, pairwise_steps(eq, list(path))

    plan_key = ("plan", batch)
    for s in steps:
        if plan_key not in s:
            s[plan_key] = _resolved(s)

    def _contract(step, ops):
        if step[plan_key] is None:
            eq = step["equation"]
            if batch is not None:
                eq = _batched_eq(eq)
            return jnp.einsum(eq, *ops)
        from .pairwise import execute_pairwise

        eq, plan = step[plan_key]
        return execute_pairwise(plan, ops)

    # Rematerialize every row step: the backward pass otherwise SAVES the
    # multi-axis intermediates (tiny-dim tensors pad up to 64x under TPU
    # tiling — observed 960MB per saved scan residual at 32q).  With
    # checkpoint, only the flat env carries are stored and the step
    # recomputes in backward (~1.3x flops for ~50x less HBM).
    lead = () if batch is None else (batch,)

    def _make_step_fn(step):
        def f(env, logs, cores_a, cores_b):
            ops = []
            if step["has_env"]:
                ops.append(env.reshape(lead + step["env_in_shape"]))
            ops += list(cores_a)
            ops += [jnp.conj(b) for b in cores_b]
            out = _contract(step, ops)
            out = out.reshape(
                lead + ((-1,) if step["env_out_shape"] else ())
            )
            return rescale(out, logs)

        return jax.checkpoint(f)

    fn_key = ("fn", batch)
    for s in steps:
        if fn_key not in s:
            s[fn_key] = _make_step_fn(s)

    def run_step(step, env, logs, pa, pb):
        cores_a = tuple(pa[nm] for nm in step["cores"])
        cores_b = tuple(pb[nm] for nm in step["cores"])
        if env is None:
            env = jnp.zeros(lead + (1,), jnp.float32)  # placeholder, unused
        return step[fn_key](env, logs, cores_a, cores_b)

    # find the periodic bulk: maximal run of interior steps where step q
    # and step q+2 are identical in equation AND core shapes
    def step_sig(i):
        return (
            steps[i]["equation"],
            tuple(graph.shapes[nm] for nm in steps[i]["cores"]),
            tuple(gb.shapes[nm] for nm in steps[i]["cores"]),
        )

    # scan candidate: pairs (q, q+1) for q in [start, start+2*T) with
    # uniform pair signature
    start = 1
    T = 0
    if n >= 5:
        sig0, sig1 = step_sig(start), step_sig(start + 1)
        q = start
        while q + 1 <= n - 2 and step_sig(q) == sig0 and step_sig(q + 1) == sig1:
            q += 2
            T += 1
        scan_end = start + 2 * T
    else:
        scan_end = start

    def fn(params_a, params_b):
        logs = jnp.zeros(lead, jnp.float32)
        env = None
        # row 0
        env, logs = run_step(steps[0], None, logs, params_a, params_b)

        q = 1
        if T >= 2:
            # stack the scan xs: per pair, cores of steps q and q+1
            xs = []
            for off in (0, 1):
                for nm_i in range(len(steps[start + off]["cores"])):
                    stackA = jnp.stack([
                        params_a[steps[start + 2 * t + off]["cores"][nm_i]]
                        for t in range(T)
                    ])
                    stackB = jnp.stack([
                        params_b[steps[start + 2 * t + off]["cores"][nm_i]]
                        for t in range(T)
                    ])
                    xs.append(stackA)
                    xs.append(stackB)

            step0, step1 = steps[start], steps[start + 1]
            n0 = len(step0["cores"])
            n1 = len(step1["cores"])
            shape0 = step0["env_in_shape"]
            shape1 = step1["env_in_shape"]

            def body(carry, x):
                env, logs = carry
                # x layout mirrors xs: [A0,B0, A1,B1, ...] for step0 cores
                # then step1 cores; env flat in the carry (layout padding)
                ops0 = [env.reshape(lead + shape0)]
                for i in range(n0):
                    ops0.append(x[2 * i])
                for i in range(n0):
                    ops0.append(jnp.conj(x[2 * i + 1]))
                env = _contract(step0, ops0).reshape(lead + (-1,))
                env, logs = rescale(env, logs)
                base = 2 * n0
                ops1 = [env.reshape(lead + shape1)]
                for i in range(n1):
                    ops1.append(x[base + 2 * i])
                for i in range(n1):
                    ops1.append(jnp.conj(x[base + 2 * i + 1]))
                env = _contract(step1, ops1).reshape(lead + (-1,))
                env, logs = rescale(env, logs)
                return (env, logs), None

            # reorder xs to [A0..,B0.., A1..,B1..] grouped per step for the
            # body's indexing: build as interleaved per core (A,B) pairs.
            # checkpoint: save only the flat carries, recompute internals
            (env, logs), _ = jax.lax.scan(
                jax.checkpoint(body), (env, logs), tuple(xs)
            )
            q = scan_end

        while q < n - 1:
            env, logs = run_step(steps[q], env, logs, params_a, params_b)
            q += 1

        # final row: scalar
        final, logs = run_step(steps[n - 1], env, logs, params_a, params_b)
        if signed:
            return final, logs
        return logs + jnp.log(jnp.abs(final) + _TINY)

    return fn
