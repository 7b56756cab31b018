"""O(1)-compile inverse-CDF sampling for MPS-chain circuits.

The generic sampler (``infer/sampling.py``) compiles one whole-network
environment program per qubit — ~20 s each at 30 qubits (the per-step
rescaled pairwise env unrolls with the network).  For MPS chains (core i
on qubits (i, i+1), ``ops/mps_sweep.is_mps_chain``) the classic
left-to-right MPS sampling sweep needs only a HANDFUL of compiled
programs, independent of the qubit count:

1.  absorb the input states into the cores → site tensors
    ``A_0 [o_0, b]``, ``A_i [a, o_i, b]``, ``A_last [a, o_{n-2}, o_{n-1}]``;
2.  precompute right environments ``R_i [b, b̄]`` (identity measures on
    everything right of bond i) by one right-to-left pass — they do NOT
    depend on sampled values;
3.  sweep left to right: the open-qubit environment is the tiny
    three-tensor combine ``L·A·conj(A)·R``; after drawing ``y_q``,
    absorb ``Mx(y_q)`` into the per-sample left environment ``L``.

Every step renormalizes (per sample for ``L``) — scale-invariant CDFs,
float32-safe at any depth.  The middle-qubit combine/absorb programs are
shape-uniform, so XLA compiles them once.

The reference sampler (``engine_siamese.py:740-915``) re-contracts the
full network as an S·G batch per qubit and has no chain specialization.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph
from ..ops.contract import abs_square
from ..ops.features import measurement_matrices

__all__ = ["supports_chain_sampling", "chain_sample"]

_TINY = 1e-30


def _chain_plan(graph: CircuitGraph):
    """Structural plan for the canonical MPS layout, or None if the graph
    deviates from it.  Per core: ``(state_axes, order)`` where
    ``state_axes`` is ``[(axis_pos, qubit), ...]`` in descending position
    (absorption order) and ``order`` is the transpose permutation of the
    post-absorption tensor into ``[left_bond?, out_legs..., right_bond?]``
    (outs ascending qubit).  Pure graph metadata — no params needed, so
    ``supports_chain_sampling`` can validate the layout before dispatch."""
    n = graph.ncores
    plan = []
    for i, core in enumerate(graph.cores):
        # classify axes of the raw tensor (in_edges then out_edges)
        axes = []
        for is_out, edges in ((False, core.in_edges), (True, core.out_edges)):
            for e in edges:
                if e.neighbor == -1:
                    axes.append(("out" if is_out else "state", e.qubit))
                elif e.neighbor == i - 1:
                    axes.append(("left", e.qubit))
                elif e.neighbor == i + 1:
                    axes.append(("right", e.qubit))
                else:
                    return None
        # state axes absorb highest-position-first so indices stay valid
        state_axes = sorted(
            ((p, q) for p, (k, q) in enumerate(axes) if k == "state"),
            reverse=True,
        )
        rem = [a for a in axes if a[0] != "state"]
        # canonical order: left, outs ascending, right
        order = (
            [p for p, (k, _) in enumerate(rem) if k == "left"]
            + sorted(
                (p for p, (k, _) in enumerate(rem) if k == "out"),
                key=lambda p: rem[p][1],
            )
            + [p for p, (k, _) in enumerate(rem) if k == "right"]
        )
        kinds = [rem[p][0] for p in order]
        expect = (
            (["out", "right"] if i == 0 else
             ["left", "out", "out"] if i == n - 1 else
             ["left", "out", "right"])
            if n > 1
            else ["out", "out"]
        )
        if kinds != expect:
            return None
        plan.append((state_axes, order))
    return plan


def _site_tensors(graph: CircuitGraph, params, states):
    """Absorb input states; return site tensors in canonical axis order
    (see ``_chain_plan``), or None for non-canonical layouts."""
    plan = _chain_plan(graph)
    if plan is None:
        return None
    sites = []
    for core, (state_axes, order) in zip(graph.cores, plan):
        arr = params[core.name]
        for pos, q in state_axes:
            arr = jnp.tensordot(arr, states[q], axes=([pos], [0]))
        sites.append(jnp.transpose(arr, order))
    return sites


def supports_chain_sampling(graph: CircuitGraph) -> bool:
    from ..ops.mps_sweep import is_mps_chain

    return (
        graph.ncores >= 2
        and is_mps_chain(graph)
        # is_mps_chain admits layouts (e.g. mirrored output legs) the
        # sweep sampler cannot canonicalize; validate the full plan
        and _chain_plan(graph) is not None
    )


def _norm_rows(x, batch_axes: int):
    """Max-abs normalize over all but the leading ``batch_axes`` axes."""
    red = tuple(range(batch_axes, x.ndim))
    s = jnp.max(jnp.abs(x), axis=red, keepdims=True) + _TINY
    return x / jax.lax.stop_gradient(s)


def _step_bodies(S: int, G: int, K: int, density_power: int, dtype):
    """Un-jitted per-site sampling step bodies (shared by the per-site
    programs and the fused whole-sweep program)."""

    def draw(dens, gx, subkey):
        dens = jnp.clip(dens, min=0.0)
        if density_power == 2:
            dens = dens * dens
        cdf = jnp.cumsum(dens, axis=1)
        cdf = cdf / (cdf[:, -1:] + 1e-10)
        u = jax.random.uniform(subkey, (S, 1), jnp.float32)
        idx = jnp.sum((cdf < u).astype(jnp.int32), axis=1)
        idx = jnp.clip(idx, max=G - 2)[:, None]
        cdf_l = jnp.take_along_axis(cdf, idx, axis=1)
        cdf_r = jnp.take_along_axis(cdf, idx + 1, axis=1)
        x_l = gx[idx[:, 0]][:, None]
        x_r = gx[idx[:, 0] + 1][:, None]
        frac = jnp.clip((u - cdf_l) / (cdf_r - cdf_l + 1e-10), 0.0, 1.0)
        y = (x_l + frac * (x_r - x_l))[:, 0]
        return y, measurement_matrices(y[:, None], K)[:, 0].astype(dtype)

    def born(v):
        return abs_square(v) if jnp.iscomplexobj(v) else v

    def step_first(A0, r, mg, gx, subkey):
        # env over o_0: [o, ō]
        env = jnp.einsum("ob,pd,bd->op", A0, jnp.conj(A0), r)
        dens = born(jnp.einsum("op,gop->g", env, mg))
        dens_b = jnp.broadcast_to(dens[None], (S, G))
        y, mx_y = draw(dens_b, gx, subkey)
        L = jnp.einsum("ob,sop,pd->sbd", A0, mx_y, jnp.conj(A0))
        return y, _norm_rows(L, 1)

    def step_mid(L, A, r, mg, gx, subkey):
        env = jnp.einsum("sac,aob,cpd,bd->sop", L, A, jnp.conj(A), r)
        dens = born(jnp.einsum("sop,gop->sg", env, mg))
        y, mx_y = draw(dens, gx, subkey)
        L2 = jnp.einsum("sac,aob,sop,cpd->sbd", L, A, mx_y, jnp.conj(A))
        return y, _norm_rows(L2, 1)

    def step_last_first(L, A, mg, gx, subkey):
        # A: [a, o, p]; identity on p
        env = jnp.einsum("sac,aop,cqp->soq", L, A, jnp.conj(A))
        dens = born(jnp.einsum("soq,goq->sg", env, mg))
        y, mx_y = draw(dens, gx, subkey)
        # absorb M_{n-2}: L over the p legs
        L2 = jnp.einsum("sac,aop,soq,cqr->spr", L, A, mx_y, jnp.conj(A))
        return y, _norm_rows(L2, 1)

    def step_last_second(L, mg, gx, subkey):
        dens = born(jnp.einsum("spr,gpr->sg", L, mg))
        y, _ = draw(dens, gx, subkey)
        return y

    return step_first, step_mid, step_last_first, step_last_second


@functools.lru_cache(maxsize=64)
def _step_programs(S: int, G: int, K: int, density_power: int,
                   dtype_name: str):
    """The four jitted per-site sampling programs, cached by static
    config.  Defining (and jitting) these at call time would create fresh
    function objects — and therefore a fresh, empty jit cache — on EVERY
    ``chain_sample`` call, recompiling all sites each time (warm sampling
    measured as slow as cold before this cache)."""
    bodies = _step_bodies(S, G, K, density_power, jnp.dtype(dtype_name))
    return tuple(jax.jit(b) for b in bodies)


@jax.jit
def _right_envs(mids, last):
    """Right environments of a uniform chain (identity measures) as one
    compiled reverse scan: ``rs[i]`` = env to the right of global core
    ``i``; the bare last-core env closes the list."""
    r = _norm_rows(jnp.einsum("aop,bop->ab", last, jnp.conj(last)), 0)

    def body(carry, A):
        rr = _norm_rows(
            jnp.einsum("aob,cod,bd->ac", A, jnp.conj(A), carry), 0
        )
        return rr, rr

    _, rs = jax.lax.scan(body, r, mids, reverse=True)
    return rs, r


@functools.lru_cache(maxsize=64)
def _sweep_program(S: int, G: int, K: int, density_power: int,
                   dtype_name: str, n_mids: int):
    """ONE jitted program for the whole sweep of a uniform chain: right
    environments + key schedule + every per-site draw, returning the full
    ``[S, nq]`` sample block.  The per-site host loop costs one device
    round-trip per qubit (~0.13 s each on the tunnel — ~4 s of pure
    latency at 30 qubits even fully warm); this runs the identical math
    in a single dispatch.  The key schedule unrolls the host loop's exact
    ``jax.random.split`` sequence — same algorithm, same keys — but draws
    are NOT guaranteed bit-identical to the per-site path: XLA fuses the
    larger program differently, and a last-ulp CDF difference at a
    grid-bin boundary occasionally flips one draw by a bin (see
    ``chain_sample``'s docstring and the parity tests)."""
    step_first, step_mid, step_last_first, step_last_second = _step_bodies(
        S, G, K, density_power, jnp.dtype(dtype_name)
    )

    @jax.jit
    def sweep(key, A0, mids, last, mg, gx):
        # right environments (shared helper, inlined under this jit):
        # rs[i] = env to the RIGHT of core i
        rs, r = _right_envs(mids, last)
        rs_mid = jnp.concatenate([rs[1:], r[None]], axis=0)

        # the host loop's split sequence, unrolled (static n_mids)
        key, k0 = jax.random.split(key)
        kmids = []
        for _ in range(n_mids):
            key, ki = jax.random.split(key)
            kmids.append(ki)
        kmids = jnp.stack(kmids)
        key, ka = jax.random.split(key)
        key, kb = jax.random.split(key)

        y0, L = step_first(A0, rs[0], mg, gx, k0)

        def body(L, inp):
            A, r_i, ki = inp
            y, L2 = step_mid(L, A, r_i, mg, gx, ki)
            return L2, y

        L, ys = jax.lax.scan(body, L, (mids, rs_mid, kmids))
        ya, L = step_last_first(L, last, mg, gx, ka)
        yb = step_last_second(L, mg, gx, kb)
        return jnp.concatenate(
            [y0[None], ys, ya[None], yb[None]], axis=0
        ).T  # [S, nq]

    return sweep


def chain_sample(
    graph: CircuitGraph,
    params,
    states: Sequence[jax.Array],
    num_samples: int,
    K: int,
    key: jax.Array,
    bounds: Tuple[float, float] = (-5.0, 5.0),
    grid_size: int = 200,
    density_power: int = 1,
    dtype=jnp.complex64,
    fused: bool = True,
) -> jax.Array:
    """MPS-chain sampler; same semantics as :func:`tneq_tpu.infer.sample`.

    ``fused=True`` (default) runs uniform chains through the ONE-dispatch
    whole-sweep program.  Its draws follow the identical algorithm and key
    schedule as the per-site path but are not bit-identical to it: XLA
    fuses the larger program differently, and a last-ulp CDF difference at
    a grid-bin boundary occasionally flips one draw by a bin (after which
    that sample row's conditional suffix diverges — correct sampling
    either way).  ``fused=False`` keeps the per-site dispatch whose draws
    match the generic sampler exactly (used by the parity tests)."""
    nq = graph.nqubits
    S, G = num_samples, grid_size
    grid_x = np.linspace(bounds[0], bounds[1], G, dtype=np.float32)
    mx_grid = measurement_matrices(jnp.asarray(grid_x)[:, None], K)[:, 0]
    mx_grid = mx_grid.astype(dtype)
    grid_x_d = jnp.asarray(grid_x)

    sites = _site_tensors(graph, params, [jnp.asarray(s) for s in states])
    if sites is None:
        raise ValueError("graph is not in canonical MPS-chain layout")

    mids = sites[1:-1]
    uniform = bool(mids) and all(m.shape == mids[0].shape for m in mids)
    if mids and uniform and fused:
        # fused whole-sweep program: right envs + every draw in ONE
        # dispatch (the per-site loop pays a tunnel round-trip per qubit)
        sweep = _sweep_program(S, G, K, density_power,
                               jnp.dtype(dtype).name, len(mids))
        return sweep(key, sites[0], jnp.stack(mids), sites[-1],
                     mx_grid, grid_x_d)
    if mids and uniform:
        # per-site dispatch (fused=False) on a uniform chain: the right
        # environments still run as ONE jitted reverse scan (module-level
        # program, shape-cached) instead of n_mids eager device ops
        rs, r_last = _right_envs(jnp.stack(mids), sites[-1])
        r_list = list(rs) + [r_last]
    elif mids:
        # non-uniform chain: per-core env programs (still one pass)
        r = _norm_rows(
            jnp.einsum("aop,bop->ab", sites[-1], jnp.conj(sites[-1])), 0
        )
        r_list = [r]
        for A in reversed(mids):
            r = _norm_rows(
                jnp.einsum("aob,cod,bd->ac", A, jnp.conj(A), r), 0
            )
            r_list.append(r)
        r_list = r_list[::-1]
    else:  # two cores: first + last
        r_list = [
            _norm_rows(
                jnp.einsum("aop,bop->ab", sites[-1], jnp.conj(sites[-1])), 0
            )
        ]

    # --- per-qubit sampling programs (compiled once per config+shape) ---
    # mx_grid / gx ride through every jitted step as ARGUMENTS, never as
    # closure captures: the axon TPU backend cannot host-copy captured
    # device arrays during jit lowering (CLAUDE.md channel protocol)
    step_first, step_mid, step_last_first, step_last_second = _step_programs(
        S, G, K, density_power, jnp.dtype(dtype).name
    )

    samples = np.zeros((S, nq), np.float32)
    n = graph.ncores
    key, k0 = jax.random.split(key)
    y, L = step_first(sites[0], r_list[0], mx_grid, grid_x_d, k0)
    samples[:, 0] = np.asarray(y)
    for i in range(1, n - 1):
        key, ki = jax.random.split(key)
        y, L = step_mid(L, sites[i], r_list[i], mx_grid, grid_x_d, ki)
        samples[:, i] = np.asarray(y)
    key, ka = jax.random.split(key)
    y, L = step_last_first(L, sites[-1], mx_grid, grid_x_d, ka)
    samples[:, n - 1] = np.asarray(y)
    key, kb = jax.random.split(key)
    y = step_last_second(L, mx_grid, grid_x_d, kb)
    samples[:, n] = np.asarray(y)
    return jnp.asarray(samples)
