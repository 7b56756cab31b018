"""Log-scale companions: overflow-safe contraction for deep networks.

TPU-native replacement for the reference's ``TNTensor`` wrapper
(``tneq_qc/core/tn_tensor.py``): instead of a mutable (tensor, scale) object
threaded through every code path, a pure ``(data, log_scale)`` pair — a
pytree — where ``data`` is kept O(1) by max-abs normalization and
``log_scale`` carries the magnitude.  The loss-side trick
``log(P·S) = log P + stop_grad(log S)`` (``engine_siamese.py:524-530``) is in
:func:`tneq_tpu.train.losses.nll_loss`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..graph.dsl import CircuitGraph
from .contract import abs_square, make_siamese_fn

__all__ = ["Scaled", "auto_scale", "scaled_siamese_fn"]


class Scaled(NamedTuple):
    """A tensor with its magnitude factored out: value = data · exp(log_scale)."""

    data: jax.Array
    log_scale: jax.Array  # scalar, real

    @property
    def value(self) -> jax.Array:
        return self.data * jnp.exp(self.log_scale).astype(self.data.dtype)


def auto_scale(x: jax.Array, eps: float = 1e-30) -> Scaled:
    """Normalize max-abs to 1 (reference ``TNTensor.auto_scale``,
    ``tn_tensor.py:67-85``).  The scale is stop-gradiented: gradients flow
    through ``data`` exactly as they would through ``x`` up to the constant
    factor, matching the reference's constant-``scale`` convention."""
    m = jax.lax.stop_gradient(jnp.max(jnp.abs(x)))
    m = jnp.maximum(m, eps)
    return Scaled(x / m.astype(x.dtype), jnp.log(m).astype(jnp.float32))


def scaled_siamese_fn(
    graph: CircuitGraph,
    with_states: bool = True,
    states_batched: bool = False,
    measure_extra_dims: int = 1,
):
    """Siamese contraction on auto-scaled operands.

    Returns ``fn(params, states, measures) -> (raw, log_scale)`` where the
    true siamese value is ``raw · exp(log_scale)``.  Cores contribute their
    log-scale twice (ket + bra; scales are real so conjugation is a no-op),
    measures once — mirroring the reference's scale product over the operand
    list (``einsum_strategy.py:87-108``).  Born probability of the scaled
    result: ``abs_square(raw)`` with ``2·log_scale`` (complex) or ``raw``
    with ``log_scale`` (real) — feed that log term to
    ``nll_loss(probs, log_scale=...)``.
    """
    fn = make_siamese_fn(
        graph, with_states, states_batched, measure_extra_dims
    )

    def scaled(params, states, measures):
        total = jnp.zeros((), jnp.float32)
        norm_params = {}
        for name, arr in params.items():
            s = auto_scale(arr)
            norm_params[name] = s.data
            total = total + 2.0 * s.log_scale  # ket + bra
        norm_measures = []
        for m in measures:
            s = auto_scale(m)
            norm_measures.append(s.data)
            total = total + s.log_scale
        raw = fn(norm_params, states, norm_measures)
        return raw, total

    return scaled
