"""MPS transfer-matrix sweep: O(B·D²)-memory siamese contraction for chains.

Rebuild of the reference ``MPSChainStrategy`` (``tneq_qc/contractor/mps_strategy.py``):
absorb the input states into the cores, then sweep left-to-right carrying
the boundary environment ``env[z, a, b]`` (batch, ket bond, bra bond) through
the transfer step ``zab,akc,zkl,bld->zcd``.  For deep chains this avoids
materializing the full einsum intermediate set; when all middle cores share
a bond dimension the sweep runs as one ``lax.scan`` (single compiled step).

Only valid for chain topologies produced by :func:`tneq_tpu.graph.mps_graph`
(core i on qubits (i, i+1)); :func:`is_mps_chain` checks applicability, the
general einsum path covers everything else — the reference's
StrategyCompiler mode table collapses to this one dispatch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.dsl import CircuitGraph

__all__ = ["is_mps_chain", "mps_sweep_siamese_fn"]


def is_mps_chain(graph: CircuitGraph) -> bool:
    """True when core i sits exactly on qubits (i, i+1) in a chain."""
    m = graph.ncores
    if m != graph.nqubits - 1 or m < 1:
        return False
    for i, core in enumerate(graph.cores):
        qubits = sorted(
            {e.qubit for e in core.in_edges} | {e.qubit for e in core.out_edges}
        )
        if qubits != [i, i + 1]:
            return False
        for e in core.in_edges:
            if e.neighbor not in (-1, i - 1):
                return False
        for e in core.out_edges:
            if e.neighbor not in (-1, i + 1):
                return False
    return True


def mps_sweep_siamese_fn(
    graph: CircuitGraph,
    conj_right: bool = True,
    use_pallas: bool = False,
    pallas_interpret: Optional[bool] = None,
    remat: bool = False,
):
    """fn(params, states, measures) -> [B] siamese values (chain only).

    ``states``: per-qubit ``(rank,)`` vectors; ``measures``: per-qubit
    ``(B, K, K)`` operators.  Semantics identical to
    :func:`tneq_tpu.ops.make_siamese_fn` on chain graphs.

    ``use_pallas``: run the middle transfer steps through the fused VMEM
    kernel (``ops/pallas_kernels.py``) instead of the XLA einsum.
    """
    if not is_mps_chain(graph):
        raise ValueError("graph is not an MPS chain; use make_siamese_fn")
    if use_pallas and not conj_right:
        raise ValueError("use_pallas implies the Born-rule conjugated bra")
    m = graph.ncores

    def _transfer(env, a, mx, conj):
        if use_pallas:
            # differentiable kernels (custom VJP): the sweep can now sit in
            # the training hot loop, not just forward contraction
            from .pallas_kernels import transfer_step, transfer_step_complex

            if jnp.iscomplexobj(env) or jnp.iscomplexobj(a):
                return transfer_step_complex(
                    env.astype(jnp.complex64),
                    a.astype(jnp.complex64),
                    mx.astype(jnp.complex64),
                    interpret=pallas_interpret,
                )
            return transfer_step(env, a, mx, interpret=pallas_interpret)
        return jnp.einsum("zab,akc,zkl,bld->zcd", env, a, mx, conj(a))

    def fn(params, states, measures):
        conj = jnp.conj if conj_right else (lambda x: x)
        names = graph.core_names

        # Absorb input states.  Core tensor layouts (in-edges by qubit then
        # out-edges by qubit):
        #   c_0:   [s_0, s_1, o_0, b_0]           (m > 1)
        #   c_i:   [b_{i-1}, s_{i+1}, o_i, b_i]   (0 < i < m-1)
        #   c_last:[b_{m-2}, s_m, o_{m-1}, o_m]
        #   m == 1: [s_0, s_1, o_0, o_1]
        if m == 1:
            a = jnp.einsum(
                "stkl,s,t->kl", params[names[0]], states[0], states[1]
            )
            out = jnp.einsum(
                "kl,zkK,zlL,KL->z",
                a,
                measures[0],
                measures[1],
                conj(a),
            )
            return out

        a0 = jnp.einsum("stkc,s,t->kc", params[names[0]], states[0], states[1])
        env = jnp.einsum(
            "kc,zkl,ld->zcd", a0, measures[0], conj(a0)
        )

        mids = [
            jnp.einsum("askc,s->akc", params[names[i]], states[i + 1])
            for i in range(1, m - 1)
        ]
        shapes = {t.shape for t in mids}
        if len(shapes) == 1 and len(mids) > 1:
            stacked = jnp.stack(mids)  # [m-2, a, k, c]
            mx_stack = jnp.stack([measures[i] for i in range(1, m - 1)])

            def step(env, inputs):
                a, mx = inputs
                return _transfer(env, a, mx, conj), None

            if remat:
                # rematerialize per transfer step when differentiating deep
                # chains: O(1) stored environments instead of O(m)
                step = jax.checkpoint(step)
            env, _ = jax.lax.scan(step, env, (stacked, mx_stack))
        else:
            for i, a in enumerate(mids):
                env = _transfer(env, a, measures[i + 1], conj)

        a_last = jnp.einsum(
            "askl,s->akl", params[names[m - 1]], states[m]
        )
        out = jnp.einsum(
            "zab,akl,zkK,zlL,bKL->z",
            env,
            a_last,
            measures[m - 1],
            measures[m],
            conj(a_last),
        )
        return out

    return fn
