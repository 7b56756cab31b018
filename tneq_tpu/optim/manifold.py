"""Manifold math helpers.

JAX equivalents of the reference's ``gutils.py`` beyond what the optimizers
use inline (``qr_retraction``/``matrix_norm_one``/``unit_rows`` live in
``stiefel.py``): polar retraction, Stiefel tangent/normal projections,
sphere exponential map and parallel transport (``gutils.py:29-132``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .stiefel import matrix_norm_one, qr_retraction, unit_rows

__all__ = [
    "sym",
    "skew",
    "polar_retraction",
    "stiefel_project_tangent",
    "stiefel_project_normal",
    "sphere_exp",
    "sphere_transport",
    "cayley_step",
    "qr_retraction",
    "matrix_norm_one",
    "unit_rows",
]


def sym(y: jax.Array) -> jax.Array:
    return (y + jnp.conj(y).T) / 2


def skew(y: jax.Array) -> jax.Array:
    return (y - jnp.conj(y).T) / 2


def polar_retraction(tan: jax.Array) -> jax.Array:
    """Polar retraction of a (p, n) matrix, p <= n (``gutils.py:53-57``)."""
    u, _, vh = jnp.linalg.svd(tan, full_matrices=False)
    return u @ vh


def stiefel_project_tangent(y: jax.Array, g: jax.Array) -> jax.Array:
    """Project g onto the tangent space of the Stiefel point y
    (row-orthonormal (p, n), ``gutils.py:37-46``)."""
    yyh = y @ jnp.conj(g).T
    return g - sym(yyh) @ y


def stiefel_project_normal(y: jax.Array, g: jax.Array) -> jax.Array:
    """Normal-space component (``gutils.py:48-51``)."""
    return sym(y @ jnp.conj(g).T) @ y


def sphere_exp(y: jax.Array, h: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Row-wise sphere exponential map (``gexp``, ``gutils.py:104-110``)."""
    norm = jnp.linalg.norm(h, axis=1, keepdims=True)
    u = h / (norm + eps)
    return y * jnp.cos(norm) + u * jnp.sin(norm)


def sphere_transport(y: jax.Array, h: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Parallel transport of h along itself on the sphere
    (``gpt``, ``gutils.py:126-131``)."""
    norm = jnp.linalg.norm(h, axis=1, keepdims=True)
    u = h / (norm + eps)
    return (u * jnp.cos(norm) - y * jnp.sin(norm)) * norm


def cayley_step(x: jax.Array, w: jax.Array, alpha) -> jax.Array:
    """Y = (I − α/2·W)⁻¹(I + α/2·W)·X via solve (``Cayley_loop`` closed form,
    ``gutils.py:80-86`` / ``stiefel_optimizer_complex.py:67-75``)."""
    eye = jnp.eye(w.shape[0], dtype=w.dtype)
    half = jnp.asarray(alpha).astype(w.real.dtype) / 2
    return jnp.linalg.solve(eye - half * w, (eye + half * w) @ x)
