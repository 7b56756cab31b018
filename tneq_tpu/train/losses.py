"""Loss functions: fidelity against a target tensor, data negative-log-likelihood.

Reference semantics: fidelity |⟨t,o⟩|² / (⟨t,t⟩⟨o,o⟩) with clamped
denominator (``symmetry_breaking_quantum.py:160-166``); NLL as cross-entropy
with an all-ones target and a stop-gradient log-scale companion
(``engine_siamese.py:491-530``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fidelity", "fidelity_loss", "nll_loss"]


def fidelity(out: jax.Array, target: jax.Array) -> jax.Array:
    """|⟨t,o⟩|² / (⟨t,t⟩·⟨o,o⟩), flattening both tensors."""
    o = out.reshape(-1)
    t = target.reshape(-1)
    overlap = jnp.vdot(t, o)
    num = jnp.real(overlap) ** 2 + jnp.imag(overlap) ** 2
    den = jnp.clip(
        jnp.real(jnp.vdot(t, t)) * jnp.real(jnp.vdot(o, o)), min=1e-12
    )
    return num / den


def fidelity_loss(out: jax.Array, target: jax.Array) -> jax.Array:
    """1 - fidelity (the quantity minimized by the symmetry-breaking fits)."""
    return 1.0 - fidelity(out, target)


def nll_loss(probs: jax.Array, log_scale: jax.Array | float = 0.0) -> jax.Array:
    """-mean(log(P·S)) with the scale's log detached.

    ``log(P·S) = log P + stop_grad(log S)`` keeps gradients scale-correct
    while the reported loss reflects the true magnitude (reference trick,
    ``engine_siamese.py:524-530``).
    """
    probs = jnp.clip(jnp.real(probs), min=1e-10)
    log_scale = jax.lax.stop_gradient(jnp.asarray(log_scale, probs.dtype))
    return -jnp.mean(jnp.log(probs) + log_scale)
