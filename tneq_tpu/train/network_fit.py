"""Network-space fidelity fitting: no dense target tensor, log-space math.

The reference's symmetry-breaking fits materialize the target as a DENSE
tensor of 4^n_qubits entries (``symmetry_breaking_quantum.py:128-146``) —
impossible beyond ~14 qubits.  Here the target stays a tensor network and
the fidelity

    F = |⟨t, o⟩|² / (⟨t, t⟩·⟨o, o⟩)

is computed from network-network overlaps (two copies glued at both
boundaries).  At 20+ qubits the raw quantities underflow/overflow float32
(⟨o,o⟩ ~ 2^n, |⟨t,o⟩|² ~ 2^-2n), so the loss is the LOG-fidelity

    log F = 2·log|⟨t,o⟩| − log⟨o,o⟩ − log⟨t,t⟩

evaluated on max-abs-normalized cores — the per-core log-scales cancel
exactly because F is scale-invariant, and the log gradient keeps signal even
when F starts at ~2^-n (the raw-fidelity gradient is ~F and dies).

The same dynamic identity-mask trick as :mod:`tneq_tpu.train.fit` makes
every pruning candidate reuse one compiled program; for multi-chip runs the
overlap contractions can be index-sliced over a mesh axis (``parallel/mp.py``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph
from ..ops.contract import make_two_network_fn
from ..ops.scaling import auto_scale
from ..optim.stiefel import GradientTransformation
from .fit import FitResult, identity_cores

__all__ = [
    "make_masked_network_fidelity_fit",
    "network_fidelity",
    "network_log_fidelity",
]

_TINY = 1e-30


def _normalize(params):
    return {n: auto_scale(v).data for n, v in params.items()}


def network_log_fidelity(
    graph: CircuitGraph, params, target_params
) -> jax.Array:
    """log F between two same-graph networks, float32-safe at large n."""
    overlap_fn = make_two_network_fn(graph, graph, conj_target=True)
    p = _normalize(params)
    t = _normalize(target_params)
    ov = overlap_fn(p, t)
    oo = jnp.real(overlap_fn(p, p))
    tt = jnp.real(overlap_fn(t, t))
    log_num = jnp.log(jnp.real(ov) ** 2 + jnp.imag(ov) ** 2 + _TINY)
    return log_num - jnp.log(oo + _TINY) - jnp.log(tt + _TINY)


def network_fidelity(
    graph: CircuitGraph, params, target_params, target_norm=None
) -> jax.Array:
    """Fidelity between two same-graph networks via overlaps only."""
    return jnp.exp(network_log_fidelity(graph, params, target_params))


def make_masked_network_fidelity_fit(
    graph: CircuitGraph,
    optimizer: GradientTransformation,
    max_steps: int,
    tol: float = 1e-3,
    dtype=jnp.complex64,
) -> Callable:
    """Build ``fit(params, mask, target_params, target_mask) -> FitResult``.

    Both the candidate and the target are masked full-graph networks
    (identity-gate substitution); the loss is −log F; the whole fit runs in
    one jitted ``lax.while_loop`` with early exit at ``1 − F < tol``.
    """
    overlap_fn = make_two_network_fn(graph, graph, conj_target=True)
    idents = identity_cores(graph, dtype)
    names = graph.core_names
    # exit when log F > log(1 - tol)
    log_tol = float(np.log1p(-tol))

    def effective(params, mask):
        return {
            n: mask[i].astype(dtype) * params[n]
            + (1.0 - mask[i]).astype(dtype) * idents[n]
            for i, n in enumerate(names)
        }

    def neg_log_f(params, mask, target_eff_n, log_tt):
        eff = _normalize(effective(params, mask))
        ov = overlap_fn(eff, target_eff_n)
        oo = jnp.real(overlap_fn(eff, eff))
        log_num = jnp.log(jnp.real(ov) ** 2 + jnp.imag(ov) ** 2 + _TINY)
        return -(log_num - jnp.log(oo + _TINY) - log_tt)

    grad_fn = jax.value_and_grad(neg_log_f)

    @jax.jit
    def fit(params, mask, target_params, target_mask) -> FitResult:
        # full-precision matmuls (see train/fit.py)
        with jax.default_matmul_precision("highest"):
            return _fit_body(params, mask, target_params, target_mask)

    def _fit_body(params, mask, target_params, target_mask) -> FitResult:
        target_eff_n = _normalize(effective(target_params, target_mask))
        log_tt = jnp.log(
            jnp.real(overlap_fn(target_eff_n, target_eff_n)) + _TINY
        )
        opt_state = optimizer.init(params)

        def cond(carry):
            _, _, step, nlf = carry
            return jnp.logical_and(step < max_steps, nlf > -log_tol)

        def body(carry):
            params, opt_state, step, _ = carry
            nlf, grads = grad_fn(params, mask, target_eff_n, log_tt)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state, step + 1, nlf)

        params_f, opt_state_f, steps, nlf = jax.lax.while_loop(
            cond,
            body,
            (params, opt_state, jnp.zeros((), jnp.int32), jnp.full((), 1e9)),
        )
        # report 1 - F from the exit-triggering -log F (pre-final-step, same
        # convention as train/fit.py and the reference)
        infid = -jnp.expm1(-nlf)
        return FitResult(params_f, infid, steps, opt_state_f)

    return fit
