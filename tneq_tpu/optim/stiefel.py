"""Riemannian Stiefel-manifold optimizers as optax-style transforms.

TPU-native rewrite of the reference's torch optimizers
(``tneq_qc/optim/stiefel_optimizer_complex.py`` — ``SGDG`` at ``:23-176``,
``AdamG`` at ``:178-338``; manifold helpers ``tneq_qc/optim/gutils.py``):

- pure functional ``init``/``update`` (composable with optax / jit / scan)
- Cayley transform via ``jnp.linalg.solve`` (or a matmul-only fixed-point
  iteration, ``cayley="iterative"``) instead of explicit inverse
- PRNG-keyed stochastic QR retraction (the reference uses
  ``random.randint`` on the host, ``stiefel_optimizer_complex.py:111-113``)
- complex-aware throughout (skew-Hermitian ``W``, conjugate transposes)

Semantics per parameter tensor of shape ``s``: reshape to
``(rows, cols) = (prod(s[:len(s)//2]), prod(s[len(s)//2:]))``; if
``stiefel`` and ``rows <= cols`` apply the Cayley/Stiefel update, else plain
SGD with momentum (reference's else-branch).  JAX's convention for gradients
of real losses w.r.t. complex parameters matches torch autograd's, so the
momentum/``gᴴ`` algebra carries over unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sgdg", "adamg", "qr_retraction", "matrix_norm_one", "unit_rows"]

EPS = 1e-8

ScalarOrSchedule = Union[float, Callable[[jax.Array], jax.Array]]


def _lr_at(lr: ScalarOrSchedule, count: jax.Array) -> jax.Array:
    return lr(count) if callable(lr) else jnp.asarray(lr, jnp.float32)


def matrix_norm_one(w: jax.Array) -> jax.Array:
    """Induced 1-norm: max over columns of the column abs-sum
    (reference ``gutils.py:134-138``)."""
    return jnp.max(jnp.sum(jnp.abs(w), axis=0))


def unit_rows(x: jax.Array, eps: float = EPS) -> jax.Array:
    """Normalize each row to unit L2 norm (reference ``gutils.py:7-9``)."""
    n = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / (n + eps)


def qr_retraction(x: jax.Array) -> jax.Array:
    """Retract a ``(rows, cols)`` (rows <= cols) matrix onto the Stiefel
    manifold of row-orthonormal matrices, with phase/sign correction
    (reference ``gutils.py:59-78``)."""
    xt = jnp.conj(x).T  # (cols, rows)
    q, r = jnp.linalg.qr(xt)
    d = jnp.diagonal(r)
    if jnp.iscomplexobj(d):
        ph = d / (jnp.abs(d) + 1e-12)
    else:
        ph = jnp.sign(d)
    q = q * ph[None, :]
    return jnp.conj(q).T


def _rows_cols(shape) -> tuple:
    mid = len(shape) // 2
    rows = int(np.prod(shape[:mid], dtype=np.int64)) if mid else 1
    cols = int(np.prod(shape[mid:], dtype=np.int64))
    return rows, cols


def _cayley_solve(alpha: jax.Array, w: jax.Array, x: jax.Array) -> jax.Array:
    """Y = (I - α/2·W)⁻¹ (I + α/2·W) X via a linear solve
    (reference ``compute_Y``, ``stiefel_optimizer_complex.py:67-75``)."""
    eye = jnp.eye(w.shape[0], dtype=w.dtype)
    half = alpha.astype(w.real.dtype) / 2
    return jnp.linalg.solve(eye - half * w, (eye + half * w) @ x)


def _cayley_iterative(
    alpha: jax.Array, w: jax.Array, x: jax.Array, iters: int = 8
) -> jax.Array:
    """Same Cayley step by fixed-point iteration Y ← X + α·W·(X+Y)/2
    (the reference's original ``Cayley_loop``, ``gutils.py:80-86``).

    Matmul-only — no LU custom call — so it runs entirely on the MXU and
    batches trivially under vmap.  Converges geometrically with rate
    ``α/2·‖W‖ ≤ 1/2`` (the step size is clamped to 1/‖W‖₁)."""
    half = alpha.astype(w.real.dtype) / 2
    y = x
    for _ in range(iters):
        y = x + half * (w @ (x + y))
    return y


def _cayley(alpha, w, x, method: str = "solve", iters: int = 8):
    if method == "solve":
        return _cayley_solve(alpha, w, x)
    return _cayley_iterative(alpha, w, x, iters)


class SGDGState(NamedTuple):
    momentum: Any  # pytree of momentum buffers (cols, rows) per stiefel param
    key: jax.Array
    count: jax.Array


class GradientTransformation(NamedTuple):
    init: Callable
    update: Callable


def sgdg(
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.0,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    stiefel: bool = True,
    retraction_prob: float = 1.0 / 101.0,
    eps: float = EPS,
    seed: int = 0,
    cayley: str = "solve",
    cayley_iters: int = 8,
) -> GradientTransformation:
    """Stiefel SGD-G with Cayley updates (reference ``SGDG``).

    ``cayley``: 'solve' (exact, LU) or 'iterative' (matmul-only fixed point
    — use on accelerators where the LU custom call is unavailable/slow).

    Returns an optax-compatible ``(init, update)`` pair; ``update`` needs
    ``params`` and returns additive updates (``new - old``) so standard
    ``optax.apply_updates`` works.
    """
    if nesterov and (momentum <= 0 or dampening != 0):
        raise ValueError("nesterov momentum needs momentum > 0 and 0 dampening")

    def is_stiefel_leaf(p) -> bool:
        rows, cols = _rows_cols(p.shape)
        return stiefel and rows <= cols

    def init(params):
        def init_buf(p):
            rows, cols = _rows_cols(p.shape)
            if is_stiefel_leaf(p):
                return jnp.zeros((cols, rows), dtype=p.dtype)
            return jnp.zeros_like(p)

        momentum_tree = jax.tree.map(init_buf, params)
        return SGDGState(
            momentum=momentum_tree,
            key=jax.random.PRNGKey(seed),
            count=jnp.zeros((), jnp.int32),
        )

    def _stiefel_math(g, p, v, x, lr):
        """Cayley update given the (possibly retracted) manifold point x."""
        shape = p.shape
        rows, cols = _rows_cols(shape)
        # torch autograd hands SGDG the conjugate of what jax.grad returns
        # for real losses of complex params, and the reference then takes
        # conj(g)ᵀ (stiefel_optimizer_complex.py:130); with jax gradients the
        # two conjugations cancel to a plain transpose.
        g2 = g.reshape(rows, cols)
        v_new = momentum * v - g2.T  # (cols, rows)
        mx = v_new @ x  # (cols, cols)
        xmx = x @ mx  # (rows, cols)
        xxmx = jnp.conj(x).T @ xmx  # (cols, cols)
        w_hat = mx - 0.5 * xxmx
        w = w_hat - jnp.conj(w_hat).T  # skew-Hermitian
        t = 1.0 / (matrix_norm_one(w) + eps)
        alpha = jnp.minimum(t, lr)
        y = _cayley(alpha, w, jnp.conj(x).T, cayley, cayley_iters)  # (cols, rows)
        p_new = jnp.conj(y).T.reshape(shape)
        v_next = w @ jnp.conj(x).T  # (cols, rows), saved for next step
        return p_new - p, v_next

    def _stiefel_update(g, p, v, subkey, lr):
        rows, cols = _rows_cols(p.shape)
        x = unit_rows(p.reshape(rows, cols), eps)
        if retraction_prob > 0:
            do_retract = jax.random.bernoulli(subkey, retraction_prob)
            x = jax.lax.cond(do_retract, qr_retraction, lambda m: m, x)
        return _stiefel_math(g, p, v, x, lr)

    def _plain_update(g, p, buf, lr, count):
        # jax.grad -> descent direction for complex params is conj(g)
        d = jnp.conj(g)
        if weight_decay != 0:
            d = d + weight_decay * p
        if momentum != 0:
            # torch initializes the buffer to the first gradient; with zeros
            # init that equals buf = momentum·0 + d only when dampening == 0,
            # so emulate the first-step clone explicitly.
            buf_new = momentum * buf + (1.0 - dampening) * d
            buf_new = jnp.where(count == 0, d, buf_new)
            d = d + momentum * buf_new if nesterov else buf_new
        else:
            buf_new = buf
        return -_lr_at(learning_rate, count) * d, buf_new

    def update(grads, state: SGDGState, params):
        """Fused update: Stiefel leaves are grouped by shape and processed
        as ONE vmapped batch per shape group (one batched QR + one batched
        Cayley solve instead of ncores tiny ops — the TPU-relevant case is a
        brick wall where every core is the same small square)."""
        lr = _lr_at(learning_rate, state.count)
        flat_params, treedef = jax.tree.flatten(params)
        flat_grads = jax.tree.leaves(grads)
        flat_mom = jax.tree.leaves(state.momentum)
        n = len(flat_params)
        key, *subkeys = jax.random.split(state.key, n + 1)

        updates_out: list = [None] * n
        momentum_out: list = [None] * n

        # group stiefel leaves by shape; plain leaves individually
        groups: dict = {}
        for i, p in enumerate(flat_params):
            if is_stiefel_leaf(p):
                groups.setdefault(p.shape, []).append(i)
            else:
                u, m = _plain_update(
                    flat_grads[i], p, flat_mom[i], lr, state.count
                )
                updates_out[i], momentum_out[i] = u, m

        for shape, idxs in groups.items():
            if len(idxs) == 1:
                i = idxs[0]
                u, m = _stiefel_update(
                    flat_grads[i], flat_params[i], flat_mom[i], subkeys[i], lr
                )
                updates_out[i], momentum_out[i] = u, m
                continue
            rows, cols = _rows_cols(shape)
            g_b = jnp.stack([flat_grads[i] for i in idxs])
            p_b = jnp.stack([flat_params[i] for i in idxs])
            v_b = jnp.stack([flat_mom[i] for i in idxs])
            x_b = jax.vmap(
                lambda p: unit_rows(p.reshape(rows, cols), eps)
            )(p_b)
            if retraction_prob > 0:
                # one group-level draw (same expected 1/101 frequency as the
                # reference's per-core draw) keeps the batched QR out of the
                # steady-state path — a per-core cond would compute it every
                # step under vmap
                do_retract = jax.random.bernoulli(
                    subkeys[idxs[0]], retraction_prob
                )
                x_b = jax.lax.cond(
                    do_retract, jax.vmap(qr_retraction), lambda m: m, x_b
                )
            u_b, m_b = jax.vmap(
                lambda g, p, v, x: _stiefel_math(g, p, v, x, lr)
            )(g_b, p_b, v_b, x_b)
            for j, i in enumerate(idxs):
                updates_out[i] = u_b[j]
                momentum_out[i] = m_b[j]

        updates = jax.tree.unflatten(treedef, updates_out)
        new_momentum = jax.tree.unflatten(treedef, momentum_out)
        return updates, SGDGState(new_momentum, key, state.count + 1)

    return GradientTransformation(init, update)


class AdamGState(NamedTuple):
    m: Any
    v: Any
    beta1_power: Any
    beta2_power: Any
    key: jax.Array
    count: jax.Array


def adamg(
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.9,
    beta2: float = 0.99,
    epsilon: float = 1e-8,
    stiefel: bool = True,
    retraction_prob: float = 1.0 / 101.0,
    eps: float = EPS,
    seed: int = 0,
    cayley: str = "solve",
    cayley_iters: int = 8,
) -> GradientTransformation:
    """Adam-G Grassmann/Stiefel variant (reference ``AdamG``), complex-aware
    and generalized beyond the reference's 4-D-only reshape."""

    def is_stiefel_leaf(p) -> bool:
        rows, cols = _rows_cols(p.shape)
        return stiefel and rows <= cols

    def init(params):
        def init_m(p):
            rows, cols = _rows_cols(p.shape)
            if is_stiefel_leaf(p):
                return jnp.zeros((cols, rows), dtype=p.dtype)
            return jnp.zeros_like(p)

        return AdamGState(
            m=jax.tree.map(init_m, params),
            v=jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params),
            beta1_power=jnp.asarray(momentum, jnp.float32),
            beta2_power=jnp.asarray(beta2, jnp.float32),
            key=jax.random.PRNGKey(seed),
            count=jnp.zeros((), jnp.int32),
        )

    def update(grads, state: AdamGState, params):
        lr = _lr_at(learning_rate, state.count)
        b1p, b2p = state.beta1_power, state.beta2_power
        leaves = jax.tree.leaves(params)
        key, *subkeys = jax.random.split(state.key, len(leaves) + 1)
        key_tree = jax.tree.unflatten(jax.tree.structure(params), subkeys)

        def leaf_update(g, p, m, v, k):
            if not is_stiefel_leaf(p):
                d = jnp.conj(g)
                buf = momentum * m + d if momentum != 0 else d
                return -lr * buf, buf, v
            shape = p.shape
            rows, cols = _rows_cols(shape)
            x = unit_rows(p.reshape(rows, cols), eps)
            if retraction_prob > 0:
                do_retract = jax.random.bernoulli(k, retraction_prob)
                x = jax.lax.cond(do_retract, qr_retraction, lambda q: q, x)
            # same conjugate-convention cancellation as in sgdg
            g2 = g.reshape(rows, cols)
            m_new = momentum * m + (1 - momentum) * g2.T
            v_new = beta2 * v + (1 - beta2) * jnp.real(
                jnp.vdot(g2, g2)
            ).astype(jnp.float32)
            m_hat = m_new / (1 - b1p)
            v_hat = v_new / (1 - b2p)
            mx = m_hat @ x
            xmx = x @ mx
            xxmx = jnp.conj(x).T @ xmx
            w_hat = mx - 0.5 * xxmx
            w = (w_hat - jnp.conj(w_hat).T) / jnp.sqrt(v_hat + epsilon).astype(
                w_hat.dtype
            )
            t = 1.0 / (matrix_norm_one(w) + eps)
            alpha = jnp.minimum(t, lr)
            # m accumulates +gᵀ (unlike sgdg's −gᵀ), so the Cayley step must
            # take −α to descend; the reference's active code uses +α and
            # ascends (its commented-out Cayley_loop call used −alpha,
            # stiefel_optimizer_complex.py:302-304) — defect not replicated.
            y = _cayley(-alpha, w, jnp.conj(x).T, cayley, cayley_iters)
            p_new = jnp.conj(y).T.reshape(shape)
            m_next = (
                w
                @ jnp.conj(x).T
                * jnp.sqrt(v_hat + epsilon).astype(w.dtype)
                * (1 - b1p)
            )
            return p_new - p, m_next, v_new

        triples = jax.tree.map(
            leaf_update, grads, params, state.m, state.v, key_tree
        )
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3
        updates = jax.tree.map(lambda tr: tr[0], triples, is_leaf=is_triple)
        m_tree = jax.tree.map(lambda tr: tr[1], triples, is_leaf=is_triple)
        v_tree = jax.tree.map(lambda tr: tr[2], triples, is_leaf=is_triple)
        return updates, AdamGState(
            m=m_tree,
            v=v_tree,
            beta1_power=b1p * momentum,
            beta2_power=b2p * beta2,
            key=key,
            count=state.count + 1,
        )

    return GradientTransformation(init, update)
