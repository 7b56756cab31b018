"""Stiefel SGD-G on complex parameters in stacked-real (pair) form.

Twin of ``optim/stiefel.py``'s complex path, with every complex matrix op
lowered to real arithmetic on ``[2, rows, cols]`` pair arrays
(``ops/complex_pair.py``), so the full Cayley/Stiefel update — momentum,
skew-Hermitian projection, adaptive step, Cayley solve, stochastic QR
retraction — runs on a real-only backend (the axon TPU rejects all complex64
ops).  The lowering is exact: ``φ(Xᴴ)=φ(X)ᴴ``, ``φ(XY)=φ(X)φ(Y)``,
``φ((I−hW)⁻¹B)`` solved through the standard real 2n×2n embedding
``[[Wr,−Wi],[Wi,Wr]]``, and the QR retraction is a complex modified
Gram-Schmidt in pair arithmetic (positive-real diagonal, which equals the
reference's QR + phase fix, ``gutils.py:59-78``).

Gradient convention: a pair parameter's JAX gradient is the plain real pair
``(∂L/∂xr, ∂L/∂xi)`` = ``pair(conj(g_jax))``; the complex-path update uses
``g_jaxᵀ``, whose pair form is the pair conj-transpose of that gradient —
accounted for in ``_stiefel_math`` below, giving step-for-step parity with
``stiefel.sgdg`` on complex parameters (tested to ~1e-5).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .stiefel import EPS, GradientTransformation, ScalarOrSchedule, _lr_at

__all__ = [
    "pair_sgdg",
    "pair_qr_retraction",
    "pair_matmul",
    "pair_h",
    "pair_norm_one",
]


def pair_h(p: jax.Array) -> jax.Array:
    """Conjugate transpose of a pair matrix ``[2, m, n] -> [2, n, m]``."""
    t = jnp.swapaxes(p, -1, -2)
    return jnp.stack([t[0], -t[1]])


def pair_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pair matrix product (Karatsuba: 3 real matmuls)."""
    t1 = a[0] @ b[0]
    t2 = a[1] @ b[1]
    t3 = (a[0] + a[1]) @ (b[0] + b[1])
    return jnp.stack([t1 - t2, t3 - t1 - t2])


def pair_norm_one(w: jax.Array) -> jax.Array:
    """Induced 1-norm of the underlying complex matrix."""
    mod = jnp.sqrt(w[0] ** 2 + w[1] ** 2)
    return jnp.max(jnp.sum(mod, axis=0))


def pair_unit_rows(x: jax.Array, eps: float = EPS) -> jax.Array:
    n = jnp.sqrt(jnp.sum(x[0] ** 2 + x[1] ** 2, axis=1, keepdims=True))
    return x / (n[None] + eps)


def _cdot(q: jax.Array, v: jax.Array):
    """⟨q, v⟩ = Σ conj(q)·v of pair vectors ``[2, n]`` -> pair scalar."""
    re = jnp.sum(q[0] * v[0] + q[1] * v[1])
    im = jnp.sum(q[0] * v[1] - q[1] * v[0])
    return re, im


def pair_qr_retraction(x: jax.Array) -> jax.Array:
    """Retract a pair ``[2, rows, cols]`` (rows <= cols) matrix onto the
    row-orthonormal Stiefel manifold: complex MGS on the conjugate
    transpose, positive-real diagonal."""
    rows = x.shape[1]
    a = pair_h(x)  # [2, cols, rows] tall
    qs = []
    for j in range(rows):
        v = a[:, :, j]  # [2, cols]
        for q in qs:
            re, im = _cdot(q, v)
            # v -= q * (re + i·im)
            v = jnp.stack(
                [v[0] - (q[0] * re - q[1] * im), v[1] - (q[0] * im + q[1] * re)]
            )
        nrm = jnp.sqrt(jnp.sum(v[0] ** 2 + v[1] ** 2)) + 1e-12
        qs.append(v / nrm)
    q_mat = jnp.stack(qs, axis=2)  # [2, cols, rows]
    return pair_h(q_mat)


def _pair_cayley_solve(alpha, w: jax.Array, x: jax.Array) -> jax.Array:
    """Y = (I − α/2·W)⁻¹ (I + α/2·W) X on pairs via the real 2n embedding."""
    n = w.shape[1]
    half = alpha / 2
    eye = jnp.eye(n, dtype=w.dtype)
    a_re = eye - half * w[0]
    a_im = -half * w[1]
    b = pair_matmul(jnp.stack([eye + half * w[0], half * w[1]]), x)
    big = jnp.block([[a_re, -a_im], [a_im, a_re]])  # E(I − hW)
    rhs = jnp.concatenate([b[0], b[1]], axis=0)  # [2n, r]
    sol = jnp.linalg.solve(big, rhs)
    return jnp.stack([sol[:n], sol[n:]])


def _pair_cayley_iterative(alpha, w, x, iters: int = 8) -> jax.Array:
    """Matmul-only fixed point Y ← X + α/2·W·(X+Y) (MXU-friendly)."""
    half = alpha / 2
    y = x
    for _ in range(iters):
        y = x + half * pair_matmul(w, x + y)
    return y


class PairSGDGState(NamedTuple):
    momentum: Any
    key: jax.Array
    count: jax.Array


def _rows_cols(shape) -> tuple:
    mid = len(shape) // 2
    rows = int(np.prod(shape[:mid], dtype=np.int64)) if mid else 1
    cols = int(np.prod(shape[mid:], dtype=np.int64))
    return rows, cols


def pair_sgdg(
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.0,
    dampening: float = 0.0,
    weight_decay: float = 0.0,
    stiefel: bool = True,
    retraction_prob: float = 1.0 / 101.0,
    eps: float = EPS,
    seed: int = 0,
    cayley: str = "solve",
    cayley_iters: int = 8,
) -> GradientTransformation:
    """``stiefel.sgdg`` for PAIR parameters ``{name: [2, *shape]}``.

    Semantics track the complex path exactly (same reshape rule on the
    underlying shape, same momentum/Cayley algebra, same PRNG-gated
    retraction); parity with ``sgdg`` on complex params is unit-tested.
    """

    def under_shape(p):
        return p.shape[1:]

    def is_stiefel_leaf(p) -> bool:
        rows, cols = _rows_cols(under_shape(p))
        return stiefel and rows <= cols

    def init(params):
        def init_buf(p):
            rows, cols = _rows_cols(under_shape(p))
            if is_stiefel_leaf(p):
                return jnp.zeros((2, cols, rows), dtype=p.dtype)
            return jnp.zeros_like(p)

        return PairSGDGState(
            momentum=jax.tree.map(init_buf, params),
            key=jax.random.PRNGKey(seed),
            count=jnp.zeros((), jnp.int32),
        )

    def _stiefel_math(g, p, v, x, lr):
        shape = under_shape(p)
        rows, cols = _rows_cols(shape)
        g2 = g.reshape(2, rows, cols)
        # complex path uses g_jaxᵀ; pair grads are pair(conj(g_jax)), so the
        # pair form of g_jaxᵀ is the pair conj-transpose of the gradient
        gt = pair_h(g2)  # [2, cols, rows]
        v_new = momentum * v - gt
        mx = pair_matmul(v_new, x)  # [2, cols, cols]
        xmx = pair_matmul(x, mx)  # [2, rows, cols]
        xxmx = pair_matmul(pair_h(x), xmx)  # [2, cols, cols]
        w_hat = mx - 0.5 * xxmx
        w = w_hat - pair_h(w_hat)
        t = 1.0 / (pair_norm_one(w) + eps)
        alpha = jnp.minimum(t, lr).astype(w.dtype)
        if cayley == "solve":
            y = _pair_cayley_solve(alpha, w, pair_h(x))
        else:
            y = _pair_cayley_iterative(alpha, w, pair_h(x), cayley_iters)
        p_new = pair_h(y).reshape((2,) + shape)
        v_next = pair_matmul(w, pair_h(x))
        return p_new - p, v_next

    def _stiefel_update(g, p, v, subkey, lr):
        rows, cols = _rows_cols(under_shape(p))
        x = pair_unit_rows(p.reshape(2, rows, cols), eps)
        if retraction_prob > 0:
            do_retract = jax.random.bernoulli(subkey, retraction_prob)
            x = jax.lax.cond(do_retract, pair_qr_retraction, lambda m: m, x)
        return _stiefel_math(g, p, v, x, lr)

    def _plain_update(g, p, buf, lr, count):
        d = g  # pair grads ARE the descent direction (= pair(conj(g_jax)))
        if weight_decay != 0:
            d = d + weight_decay * p
        if momentum != 0:
            buf_new = momentum * buf + (1.0 - dampening) * d
            buf_new = jnp.where(count == 0, d, buf_new)
            d = buf_new
        else:
            buf_new = buf
        return -_lr_at(learning_rate, count) * d, buf_new

    def update(grads, state: PairSGDGState, params):
        lr = _lr_at(learning_rate, state.count)
        flat_params, treedef = jax.tree.flatten(params)
        flat_grads = jax.tree.leaves(grads)
        flat_mom = jax.tree.leaves(state.momentum)
        n = len(flat_params)
        key, *subkeys = jax.random.split(state.key, n + 1)

        updates_out: list = [None] * n
        momentum_out: list = [None] * n
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
            rows, cols = _rows_cols(shape[1:])
            g_b = jnp.stack([flat_grads[i] for i in idxs])
            p_b = jnp.stack([flat_params[i] for i in idxs])
            v_b = jnp.stack([flat_mom[i] for i in idxs])
            x_b = jax.vmap(
                lambda p: pair_unit_rows(p.reshape(2, rows, cols), eps)
            )(p_b)
            if retraction_prob > 0:
                do_retract = jax.random.bernoulli(
                    subkeys[idxs[0]], retraction_prob
                )
                x_b = jax.lax.cond(
                    do_retract, jax.vmap(pair_qr_retraction), lambda m: m, x_b
                )
            u_b, m_b = jax.vmap(
                lambda g, p, v, x: _stiefel_math(g, p, v, x, lr)
            )(g_b, p_b, v_b, x_b)
            for j, i in enumerate(idxs):
                updates_out[i] = u_b[j]
                momentum_out[i] = m_b[j]

        updates = jax.tree.unflatten(treedef, updates_out)
        new_momentum = jax.tree.unflatten(treedef, momentum_out)
        return updates, PairSGDGState(new_momentum, key, state.count + 1)

    return GradientTransformation(init, update)
