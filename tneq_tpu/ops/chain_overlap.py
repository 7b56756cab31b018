"""Fused MPS-chain two-network overlap: one kernel per sweep.

The chain log-overlap in ``train/network_fit.py`` scans a transfer update
``v <- einsum('ce,cxyf,exyg->fg', v, A_i, conj(B_i))`` over the chain.  On
TPU that body lowers to a handful of small HLO ops per site, and at the
headline scale (32 qubits, bond 16) the whole gradient step is *op-latency*
bound, not compute bound — the MXU sees [16,16]x[16,4096] matmuls a few
microseconds apart with HBM round-trips in between.

This module restructures the sweep the TPU-native way:

1. **M-form precompute** (XLA, one batched einsum): fold each site's core
   pair into a transfer matrix ``M_i[ce, fg] = sum_xy A_i[c,x,y,f] *
   conj(B_i)[e,x,y,g]`` for all sites at once — a single MXU-friendly
   [n, S, S] batched contraction (S = bond**2) instead of 2 narrow matmuls
   per site at sweep time.
2. **One Pallas kernel for the whole sweep**: the sequential part collapses
   to ``v <- v @ M_i`` with per-site max-abs rescaling, executed as a
   grid-sequential kernel whose carry lives in VMEM scratch.  Forward
   stores the per-site prefix states + scales; a second (reverse-grid)
   kernel computes the exact VJP — ``dM_i = outer(u_{i-1}, r_i/s_i)``,
   ``r_{i-1} = M_i @ (r_i/s_i)`` — so the fused path trains, it is not a
   forward-only fast path.

Rescaling uses the same stop-gradient trick as the XLA scan: with
``log|ov| = sum_i log s_i + log|u_n . w|`` and the scales held constant,
the gradient of the log-overlap is exact (the scale factors cancel).

Reference provenance: the workload is the reference's network-fidelity
inner loop (``symmetry_breaking_quantum.py:157-171`` drives the same
overlap objective); the fusion itself has no reference counterpart — the
reference contracts through opt_einsum on torch-CPU.

float32/real only (Mosaic has no complex dtype); callers fall back to the
XLA scan for complex or odd shapes.  ``interpret=True`` runs the kernels
in interpreter mode for CPU tests.

Measured outcome (real TPU, 32q dim-16, 2000-step gradient scan,
2026-08-17): direct einsum scan 344 steps/s vs M-form XLA scan 295 vs
fused Pallas sweep 312.  XLA's pipelining of the small-bond chain scan
already matches the hand-fused kernel, so the fused path is OPT-IN
(``TNEQ_CHAIN_PALLAS=1``), not the default — kept as the substrate for
batched multi-chain sweeps where one kernel per sweep amortizes better.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "chain_pair_to_mv",
    "mv_chain_log_overlap",
    "mv_chain_log_overlap_pallas",
    "fused_chain_log_overlap",
    "fused_chain_supported",
]

_TINY = 1e-30


def chain_pair_to_mv(a, b) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Fold two ``(first, mids, last)`` chain-core triples into
    ``(v0 [S], M [n, S, S] | None, w [S])`` with ``S = bond**2``.

    Axis convention matches ``train/network_fit.py``: first ``[x,i,y,c]``,
    middle ``[c,x,y,f]``, last ``[c,x,y,z]``; the bra side is conjugated.
    """
    (fa, ma, la), (fb, mb, lb) = a, b
    v0 = jnp.einsum("xiyc,xiye->ce", fa, jnp.conj(fb)).reshape(-1)
    w = jnp.einsum("cxyz,exyz->ce", la, jnp.conj(lb)).reshape(-1)
    if ma is None:
        return v0, None, w
    n, c = ma.shape[0], ma.shape[1]
    f = ma.shape[-1]
    m = jnp.einsum("icxyf,iexyg->icefg", ma, jnp.conj(mb))
    return v0, m.reshape(n, c * c, f * f), w


def mv_chain_log_overlap(v0, M, w) -> jax.Array:
    """XLA reference sweep of the M-form: ``log |v0 . (prod_i M_i) . w|``
    with per-site max-abs rescaling (stop-gradient scales)."""

    def rescale(v, logs):
        s = jax.lax.stop_gradient(jnp.max(jnp.abs(v)) + _TINY)
        return v / s, logs + jnp.log(s)

    v, logs = rescale(v0, jnp.zeros((), v0.real.dtype))
    if M is not None:

        def body(carry, Mi):
            v, logs = carry
            v, logs = rescale(v @ Mi, logs)
            return (v, logs), None

        (v, logs), _ = jax.lax.scan(body, (v, logs), M)
    # w already carries the bra conjugation (chain_pair_to_mv)
    return logs + jnp.log(jnp.abs(jnp.sum(v * w)) + _TINY)


# ---------------------------------------------------------------------------
# Pallas whole-sweep kernels
# ---------------------------------------------------------------------------


# TPU f32 VMEM tiling: block shapes must have second-to-last dim % 8 == 0
# and last dim % 128 == 0.  Vector carries are therefore padded to 8
# sublanes (row 0 = data, rows 1-7 = zeros; zeros are invariant under
# v @ M and do not perturb the max-abs rescale), and true scalars live in
# SMEM where the tiling rule does not apply.
_PAD = 8


@lru_cache(maxsize=32)
def _chain_sweep(n: int, S: int, interpret: bool):
    """custom-VJP ``sweep(u0 [8,S], M [n,S,S], w [8,S]) -> (f, logsum)``.

    ``u0`` is the (pre-normalized) boundary vector padded to 8 sublanes;
    ``f = u_n . w`` where ``u_i`` is the carry after site ``i`` (rescaled),
    ``logsum`` the accumulated ``sum_i log s_i``.  The VJP treats the
    scales as constants (exact for the LOG overlap) and returns
    (du0, dM, dw).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    prec = jax.lax.Precision.HIGHEST
    P = _PAD

    def fwd_kernel(u0_ref, m_ref, w_ref, ustack_ref, s_ref, f_ref,
                   logsum_ref, ulast_ref, v_s, logs_s):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            v_s[:] = u0_ref[:]
            logs_s[0] = jnp.float32(0.0)

        u_prev = v_s[:]  # [P, S] — entry state u_{i-1} in row 0
        ustack_ref[0] = u_prev
        raw = jnp.dot(u_prev, m_ref[0], preferred_element_type=jnp.float32,
                      precision=prec)
        s = jnp.max(jnp.abs(raw)) + _TINY  # zero pad rows don't affect max
        v_new = raw / s
        v_s[:] = v_new
        logs_s[0] += jnp.log(s)
        s_ref[0, i] = s

        @pl.when(i == n - 1)
        def _fin():
            f_ref[0, 0] = jnp.sum(v_new * w_ref[:])
            logsum_ref[0, 0] = logs_s[0]
            ulast_ref[:] = v_new

    def run_fwd(u0, M, w):
        return pl.pallas_call(
            fwd_kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((P, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, P, S), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((P, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, P, S), jnp.float32),  # u_{i-1} stack
                jax.ShapeDtypeStruct((1, n), jnp.float32),     # scales
                jax.ShapeDtypeStruct((1, 1), jnp.float32),     # f = u_n . w
                jax.ShapeDtypeStruct((1, 1), jnp.float32),     # sum log s
                jax.ShapeDtypeStruct((P, S), jnp.float32),     # u_n
            ],
            scratch_shapes=[
                pltpu.VMEM((P, S), jnp.float32),
                pltpu.SMEM((1,), jnp.float32),
            ],
            interpret=interpret,
        )(u0, M, w)

    def bwd_kernel(r0_ref, m_ref, u_ref, s_ref, dm_ref, rfinal_ref, r_s):
        i = pl.program_id(0)  # reversed site: handles original site n-1-i

        @pl.when(i == 0)
        def _init():
            r_s[:] = r0_ref[:]

        draw = r_s[:] / s_ref[0, n - 1 - i]  # [P, S], data in row 0
        # dM_i[a, b] = u_{i-1}[a] * draw[b]: [S,P] @ [P,S] — pad rows are
        # zero on both sides, so the 8-row contraction equals the outer
        # product of the row-0 vectors
        dm_ref[0] = jax.lax.dot_general(
            u_ref[0], draw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        # r_{i-1}[a] = sum_b M_i[a, b] * draw[b]
        r_s[:] = jax.lax.dot_general(
            draw, m_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

        @pl.when(i == n - 1)
        def _fin():
            rfinal_ref[:] = r_s[:]

    def run_bwd(r0, M, ustack, scales):
        rev3 = lambda i: (n - 1 - i, 0, 0)
        return pl.pallas_call(
            bwd_kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((P, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, S), rev3, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, S), rev3, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, S, S), rev3, memory_space=pltpu.VMEM),
                pl.BlockSpec((P, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, S, S), jnp.float32),  # dM
                jax.ShapeDtypeStruct((P, S), jnp.float32),     # du0
            ],
            scratch_shapes=[pltpu.VMEM((P, S), jnp.float32)],
            interpret=interpret,
        )(r0, M, ustack, scales)

    @jax.custom_vjp
    def sweep(u0, M, w):
        _, _, f, logsum, _ = run_fwd(u0, M, w)
        return f[0, 0], logsum[0, 0]

    def sweep_fwd(u0, M, w):
        ustack, scales, f, logsum, ulast = run_fwd(u0, M, w)
        return (f[0, 0], logsum[0, 0]), (M, w, ustack, scales, ulast)

    def sweep_bwd(res, cts):
        M, w, ustack, scales, ulast = res
        df, _dlogsum = cts  # scales are stop-gradient: dlogsum contributes 0
        r0 = df * w  # [P, S]
        dM, du0 = run_bwd(r0, M, ustack, scales)
        dw = df * ulast
        return du0, dM, dw

    sweep.defvjp(sweep_fwd, sweep_bwd)
    return sweep


def mv_chain_log_overlap_pallas(
    v0, M, w, interpret: Optional[bool] = None
) -> jax.Array:
    """Pallas whole-sweep ``log |v0 . (prod M_i) . w|`` (f32, differentiable).

    Matches :func:`mv_chain_log_overlap` to f32 rounding, in one fused
    kernel (plus one reverse kernel under ``grad``).
    """
    if M is None:
        return mv_chain_log_overlap(v0, M, w)
    if interpret is None:
        interpret = not _backend_is_tpu()
    n, S = M.shape[0], M.shape[1]
    s0 = jax.lax.stop_gradient(jnp.max(jnp.abs(v0)) + _TINY)
    # pad vectors to 8 sublanes (TPU f32 VMEM tiling); autodiff through
    # .at[0].set routes du0/dw back to the rank-1 operands
    u0 = jnp.zeros((_PAD, S), v0.dtype).at[0].set(v0 / s0)
    wp = jnp.zeros((_PAD, S), w.dtype).at[0].set(w)
    f, logsum = _chain_sweep(n, S, bool(interpret))(u0, M, wp)
    return jnp.log(s0) + logsum + jnp.log(jnp.abs(f) + _TINY)


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------


def fused_chain_supported(a, use_pallas: Optional[bool] = None) -> bool:
    """True when the (first, mids, last) triple can take the fused path:
    real float32 cores, stacked mids present, S = bond**2 a lane multiple.

    ``TNEQ_CHAIN_PALLAS=1`` (or ``use_pallas=True``) opts in; the default
    is OFF everywhere.  Measured head-to-head on the real TPU (32q dim-16,
    2000-step gradient scan, 2026-08-17): direct einsum scan 344 steps/s,
    M-form XLA scan 295, fused Pallas sweep 312 — XLA already pipelines
    the latency-bound chain scan as well as the hand-fused kernel, so the
    fusion stays an opt-in experiment rather than the default.
    """
    env = os.environ.get("TNEQ_CHAIN_PALLAS", "")
    if use_pallas is None:
        if env != "1":
            return False
        forced = True
    else:
        forced = use_pallas
        if not use_pallas:
            return False
    first, mids, last = a
    if mids is None:
        return False
    if any(jnp.issubdtype(x.dtype, jnp.complexfloating)
           for x in (first, mids, last)):
        return False
    if jnp.dtype(mids.dtype) != jnp.dtype(jnp.float32):
        return False
    # the M-form needs square per-site transfer matrices: uniform bonds
    # only (non-uniform triples crash the sweep's fixed-S kernel) — and
    # the boundary cores must share that bond too (first [x,i,y,c] right
    # bond, last [c,x,y,z] left bond), else v0/w lengths mismatch M
    if mids.shape[1] != mids.shape[-1]:
        return False
    if first.shape[-1] != mids.shape[1] or last.shape[0] != mids.shape[1]:
        return False
    S = mids.shape[1] * mids.shape[1]
    if S % 128 != 0:
        return False
    # the M-form is O(S^2) per site: cap so one [S, S] transfer matrix
    # stays a VMEM-resident block (S=1024 -> 4 MB f32).  Large-bond chains
    # (the D>=256 utilization sweeps) keep the direct einsum scan, which is
    # MXU-bound there anyway — the fusion targets the small-bond
    # latency-bound regime.
    if S > 1024:
        return False
    return forced


def _backend_is_tpu() -> bool:
    # under the axon tunnel the registered backend name differs from the
    # device platform ("tpu"); accept either signal
    if jax.default_backend() == "tpu":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def fused_chain_log_overlap(a, b, interpret: Optional[bool] = None) -> jax.Array:
    """M-form fused chain overlap of two core triples (Pallas sweep)."""
    v0, M, w = chain_pair_to_mv(a, b)
    return mv_chain_log_overlap_pallas(v0, M, w, interpret=interpret)
