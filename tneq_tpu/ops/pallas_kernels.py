"""Pallas TPU kernels for the MPS transfer step.

The sweep's hot op is ``zab,akc,zkl,bld->zcd`` (``mps_sweep.py``).  XLA
evaluates it as a chain of batched contractions that materializes the
``[B, D, K, D]``-sized intermediate in HBM; this kernel keeps everything in
VMEM by rewriting the step as ONE MXU matmul per batch block:

    W[cd, abkl] = A[a,k,c] · Ā[b,l,d]          (tiny, precomputed per core)
    E[abkl, z]  = env[ab, z] * Mx[kl, z]       (VPU broadcast multiply)
    out[cd, z]  = W @ E                        (MXU)

with the batch ``z`` on the lane dimension.  float32 only (Mosaic has no
complex dtype); the sweep falls back to the XLA path for complex inputs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_transfer_step", "pallas_supported"]


def pallas_supported(dtype) -> bool:
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        return False
    return jax.default_backend() in ("tpu", "cpu")  # cpu via interpret


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_transfer_step(
    env: jax.Array,  # [B, Da, Db] float32
    a: jax.Array,  # [Da, K, Dc]
    mx: jax.Array,  # [B, K, K]
    block_z: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """One MPS transfer step -> new env ``[B, Dc, Dc]`` (real dtypes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jnp.issubdtype(env.dtype, jnp.complexfloating):
        raise TypeError("complex inputs: use the XLA sweep path")
    B, Da, Db = env.shape
    _, K, Dc = a.shape
    Dd = Dc  # bra side mirrors ket
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # W[cd, abkl] = A[a,k,c]·A[b,l,d]  (real: bra = ket)
    w = jnp.einsum("akc,bld->cdabkl", a, a).reshape(Dc * Dd, Da * Db * K * K)

    # z-last layouts, padded to the lane size
    BZ = _round_up(min(block_z, B), 128)
    B_pad = _round_up(B, BZ)
    env_t = jnp.transpose(env, (1, 2, 0)).reshape(Da * Db, B)
    mx_t = jnp.transpose(mx, (1, 2, 0)).reshape(K * K, B)
    if B_pad != B:
        env_t = jnp.pad(env_t, ((0, 0), (0, B_pad - B)))
        mx_t = jnp.pad(mx_t, ((0, 0), (0, B_pad - B)))

    def kernel(w_ref, env_ref, mx_ref, out_ref):
        env_blk = env_ref[:]  # [AB, BZ]
        mx_blk = mx_ref[:]  # [KL, BZ]
        ab = env_blk.shape[0]
        kl = mx_blk.shape[0]
        e = (env_blk[:, None, :] * mx_blk[None, :, :]).reshape(ab * kl, -1)
        out_ref[:] = jnp.dot(
            w_ref[:], e, preferred_element_type=jnp.float32
        )

    out_t = pl.pallas_call(
        kernel,
        grid=(B_pad // BZ,),
        in_specs=[
            pl.BlockSpec(
                (Dc * Dd, Da * Db * K * K),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Da * Db, BZ), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((K * K, BZ), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Dc * Dd, BZ), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Dc * Dd, B_pad), jnp.float32),
        interpret=interpret,
    )(w, env_t, mx_t)

    out = out_t[:, :B].reshape(Dc, Dd, B)
    return jnp.transpose(out, (2, 0, 1))
