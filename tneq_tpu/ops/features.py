"""Hermite-polynomial feature maps (measurement-operator construction).

TPU-native rewrite of ``EngineSiamese._init_mx_weights`` /
``_eval_hermitenorm_batch`` / ``generate_data``
(``tneq_qc/core/engine_siamese.py:59-254``): pure jittable functions, and a
*normalized* recurrence so the whole thing is float32-stable on TPU (the
reference computes raw probabilists' Hermite values in float64, which
overflows float32 already at K≈35 for |x|≈5).

Mathematics: φ_k(x) = w_k · exp(-x²/4) · He_k(x) with
w_k = exp(-½(½·log 2π + log k!)) — i.e. the normalized Hermite functions.
Define h̃_k = He_k/√(k!); then

    h̃_k = x·h̃_{k-1}/√k − √((k-1)/k)·h̃_{k-2},   h̃_0 = 1, h̃_1 = x

stays O(1) and φ_k(x) = (2π)^(-¼)·exp(-x²/4)·h̃_k(x).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hermite_weights", "hermite_phi", "measurement_matrices", "generate_data"]


def hermite_weights(k_max: int, dtype=jnp.float32) -> jax.Array:
    """Normalization weights w_k for k = 0..k_max (reference ``:59-80``)."""
    import math

    log_factorial = np.array(
        [math.lgamma(k + 1.0) for k in range(k_max + 1)], dtype=np.float64
    )
    log_factor = -0.5 * (0.5 * np.log(2.0 * np.pi) + log_factorial)
    return jnp.asarray(np.exp(log_factor), dtype=dtype)


@partial(jax.jit, static_argnames=("K",))
def hermite_phi(x: jax.Array, K: int) -> jax.Array:
    """Feature vectors φ(x): ``[B, D] -> [B, D, K]`` (real).

    Equivalent to weights·gaussian·He_k of the reference
    (``engine_siamese.py:212-235``) but computed with the normalized
    recurrence (no overflow for large K).
    """
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        x = jnp.real(x)
    x = x.astype(jnp.float32)

    def step(carry, k):
        h_prev, h_prev2 = carry
        kf = k.astype(jnp.float32)
        h = x * h_prev / jnp.sqrt(kf) - jnp.sqrt((kf - 1.0) / kf) * h_prev2
        return (h, h_prev), h

    h0 = jnp.ones_like(x)
    if K == 1:
        h_stack = h0[None]
    else:
        h1 = x
        ks = jnp.arange(2, K)
        (_, _), rest = jax.lax.scan(step, (h1, h0), ks)
        h_stack = jnp.concatenate([h0[None], h1[None], rest], axis=0)  # [K, B, D]

    gauss = jnp.exp(-jnp.square(x) / 4.0)  # [B, D]
    phi = (2.0 * jnp.pi) ** (-0.25) * gauss[None] * h_stack  # [K, B, D]
    return jnp.moveaxis(phi, 0, -1)  # [B, D, K]


@partial(jax.jit, static_argnames=("K",))
def measurement_matrices(x: jax.Array, K: int) -> jax.Array:
    """Per-qubit measurement operators Mx: ``[B, D] -> [B, D, K, K]``.

    Mx[b, d, k, l] = φ_k(x[b,d])·φ_l(x[b,d]) (real rank-1 projectors;
    reference ``engine_siamese.py:236-240``).
    """
    phi = hermite_phi(x, K)
    return jnp.einsum("bdk,bdl->bdkl", phi, phi)


def generate_data(
    x: jax.Array, K: int, dtype=None
) -> Tuple[list, jax.Array]:
    """Reference-shaped API: ``(Mx_list, phi)`` for a data batch.

    Returns a per-qubit list of ``[B, K, K]`` operators plus the ``[B, D, K]``
    feature array, optionally cast (complex dtypes get real values promoted,
    as in the reference complex branch, ``engine_siamese.py:165-207``).
    """
    mx = measurement_matrices(x, K)
    phi = hermite_phi(x, K)
    if dtype is not None:
        mx = mx.astype(dtype)
        phi = phi.astype(dtype)
    return [mx[:, q] for q in range(mx.shape[1])], phi
