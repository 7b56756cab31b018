"""Optimizer tests: Stiefel SGDG/AdamG, schedules, manifold helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.optim import (
    adamg,
    make_optimizer,
    matrix_norm_one,
    qr_retraction,
    sgdg,
    step_table_schedule,
)
from tneq_tpu.optim.stiefel import unit_rows


def apply(opt, params, grads, state):
    updates, state = opt.update(grads, state, params)
    return jax.tree.map(lambda p, u: p + u, params, updates), state


class TestHelpers:
    def test_matrix_norm_one(self):
        w = jnp.asarray([[1.0, -2.0], [3.0, 4.0]])
        # column abs sums: [4, 6] -> max 6
        assert float(matrix_norm_one(w)) == 6.0

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.complex64])
    def test_qr_retraction_row_orthonormal(self, dtype):
        key = jax.random.PRNGKey(0)
        if dtype == jnp.complex64:
            x = jax.random.normal(key, (3, 6)) + 1j * jax.random.normal(
                jax.random.PRNGKey(1), (3, 6)
            )
            x = x.astype(dtype)
        else:
            x = jax.random.normal(key, (3, 6), dtype)
        q = qr_retraction(x)
        gram = np.asarray(q @ jnp.conj(q).T)
        np.testing.assert_allclose(gram, np.eye(3), atol=1e-5)

    def test_step_table_schedule(self):
        sched = step_table_schedule([(0, 1.0), (10, 0.1), (20, 0.01)])
        assert float(sched(0)) == 1.0
        assert float(sched(9)) == 1.0
        assert float(sched(10)) == pytest.approx(0.1)
        assert float(sched(25)) == pytest.approx(0.01)


class TestSGDG:
    def _stiefel_param(self, key, rows=4, cols=8, dtype=jnp.complex64):
        from tneq_tpu.model.qctn import orthogonal_core

        return orthogonal_core(key, (rows, cols), dtype)

    def test_stiefel_preserves_row_orthonormality(self):
        key = jax.random.PRNGKey(0)
        p = {"a": self._stiefel_param(key)}
        opt = sgdg(0.1, momentum=0.9, stiefel=True, retraction_prob=0.0)
        state = opt.init(p)
        for i in range(20):
            g = {
                "a": jax.random.normal(jax.random.PRNGKey(i), (4, 8))
                .astype(jnp.complex64)
            }
            p, state = apply(opt, p, g, state)
        m = np.asarray(p["a"])
        np.testing.assert_allclose(m @ m.conj().T, np.eye(4), atol=1e-3)

    def test_descends_on_stiefel_objective(self):
        """Minimize 1 - |<t, x>|² / (<t,t><x,x>) over a Stiefel row."""
        from tneq_tpu.train.losses import fidelity_loss

        target = self._stiefel_param(jax.random.PRNGKey(5), 2, 4)
        x0 = {"a": self._stiefel_param(jax.random.PRNGKey(6), 2, 4)}
        loss = lambda p: fidelity_loss(p["a"], target)
        opt = sgdg(0.5, momentum=0.9, stiefel=True, retraction_prob=0.0)
        state = opt.init(x0)
        p = x0
        l0 = float(loss(p))
        for _ in range(200):
            g = jax.grad(loss)(p)
            p, state = apply(opt, p, g, state)
        assert float(loss(p)) < l0 * 0.1

    def test_plain_branch_matches_sgd(self):
        # rows > cols -> plain SGD branch
        p = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(6, 2)), jnp.float32)}
        g = {"w": jnp.ones((6, 2), jnp.float32)}
        opt = sgdg(0.1, momentum=0.0, stiefel=True)
        state = opt.init(p)
        p2, _ = apply(opt, p, g, state)
        np.testing.assert_allclose(
            np.asarray(p2["w"]), np.asarray(p["w"]) - 0.1, atol=1e-6
        )

    def test_stiefel_flag_off_means_plain(self):
        p = {"w": jnp.ones((2, 4), jnp.float32)}
        g = {"w": jnp.full((2, 4), 0.5, jnp.float32)}
        opt = sgdg(0.2, stiefel=False)
        state = opt.init(p)
        p2, _ = apply(opt, p, g, state)
        np.testing.assert_allclose(np.asarray(p2["w"]), 1.0 - 0.1, atol=1e-6)

    def test_jit_and_scan_compatible(self):
        p = {"a": self._stiefel_param(jax.random.PRNGKey(1))}
        opt = sgdg(0.1, momentum=0.9)
        state = opt.init(p)

        @jax.jit
        def run(p, state):
            def body(carry, _):
                p, state = carry
                g = jax.tree.map(lambda x: jnp.ones_like(x), p)
                updates, state = opt.update(g, state, p)
                p = jax.tree.map(lambda a, u: a + u, p, updates)
                return (p, state), None

            (p, state), _ = jax.lax.scan(body, (p, state), None, length=5)
            return p

        out = run(p, state)
        assert np.all(np.isfinite(np.asarray(out["a"]).real))

    def test_retraction_path_executes(self):
        p = {"a": self._stiefel_param(jax.random.PRNGKey(2))}
        opt = sgdg(0.1, momentum=0.9, retraction_prob=1.0)  # always retract
        state = opt.init(p)
        g = jax.tree.map(jnp.ones_like, p)
        p2, _ = apply(opt, p, g, state)
        m = np.asarray(p2["a"])
        np.testing.assert_allclose(m @ m.conj().T, np.eye(4), atol=1e-3)


class TestAdamG:
    def test_descends(self):
        from tneq_tpu.model.qctn import orthogonal_core
        from tneq_tpu.train.losses import fidelity_loss

        target = orthogonal_core(jax.random.PRNGKey(5), (2, 4), jnp.complex64)
        p = {"a": orthogonal_core(jax.random.PRNGKey(6), (2, 4), jnp.complex64)}
        loss = lambda p: fidelity_loss(p["a"], target)
        opt = adamg(0.2, momentum=0.9, retraction_prob=0.0)
        state = opt.init(p)
        l0 = float(loss(p))
        for _ in range(300):
            g = jax.grad(loss)(p)
            updates, state = opt.update(g, state, p)
            p = jax.tree.map(lambda a, u: a + u, p, updates)
        assert float(loss(p)) < l0


class TestFactory:
    @pytest.mark.parametrize(
        "method", ["sgdg", "adamg", "adam", "sgd", "momentum", "nesterov", "rmsprop"]
    )
    def test_all_methods_step(self, method):
        p = {"w": jnp.ones((2, 4), jnp.float32)}
        opt = make_optimizer(method, lr=0.01, momentum=0.9)
        state = opt.init(p)
        g = jax.tree.map(jnp.ones_like, p)
        updates, _ = opt.update(g, state, p)
        assert jax.tree.leaves(updates)[0].shape == (2, 4)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_optimizer("quantum_annealing")


class TestCayleyVariants:
    def test_iterative_matches_solve(self):
        from tneq_tpu.optim.stiefel import _cayley_iterative, _cayley_solve
        import numpy as np

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
        w = w - w.T  # skew
        x = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        alpha = jnp.float32(0.8 / float(jnp.max(jnp.sum(jnp.abs(w), axis=0))))
        exact = _cayley_solve(alpha, w, x)
        approx = _cayley_iterative(alpha, w, x, iters=12)
        np.testing.assert_allclose(
            np.asarray(approx), np.asarray(exact), rtol=1e-4, atol=1e-5
        )

    def test_sgdg_iterative_converges(self):
        from tneq_tpu.model.qctn import orthogonal_core
        from tneq_tpu.train.losses import fidelity_loss

        target = orthogonal_core(jax.random.PRNGKey(5), (2, 4), jnp.complex64)
        p = {"a": orthogonal_core(jax.random.PRNGKey(6), (2, 4), jnp.complex64)}
        loss = lambda p: fidelity_loss(p["a"], target)
        opt = sgdg(0.5, momentum=0.9, stiefel=True, retraction_prob=0.0,
                   cayley="iterative")
        state = opt.init(p)
        l0 = float(loss(p))
        for _ in range(200):
            g = jax.grad(loss)(p)
            p, state = apply(opt, p, g, state)
        assert float(loss(p)) < l0 * 0.1
