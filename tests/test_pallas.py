"""Pallas transfer-step kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.ops.pallas_kernels import fused_transfer_step, pallas_supported


class TestFusedTransferStep:
    @pytest.mark.parametrize("B,D,K", [(4, 2, 2), (130, 3, 2), (256, 4, 4)])
    def test_matches_einsum(self, B, D, K):
        rng = np.random.default_rng(0)
        env = jnp.asarray(rng.normal(size=(B, D, D)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(D, K, D)), jnp.float32)
        mx = jnp.asarray(rng.normal(size=(B, K, K)), jnp.float32)
        got = fused_transfer_step(env, a, mx, interpret=True)
        expect = jnp.einsum("zab,akc,zkl,bld->zcd", env, a, mx, a)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-5
        )

    def test_complex_raises(self):
        env = jnp.zeros((4, 2, 2), jnp.complex64)
        a = jnp.zeros((2, 2, 2), jnp.complex64)
        mx = jnp.zeros((4, 2, 2), jnp.complex64)
        with pytest.raises(TypeError):
            fused_transfer_step(env, a, mx)

    def test_supported_flags(self):
        assert not pallas_supported(jnp.complex64)
        assert pallas_supported(jnp.float32)

    def test_jit_compatible(self):
        rng = np.random.default_rng(1)
        env = jnp.asarray(rng.normal(size=(8, 2, 2)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(2, 2, 2)), jnp.float32)
        mx = jnp.asarray(rng.normal(size=(8, 2, 2)), jnp.float32)
        f = jax.jit(lambda e, aa, m: fused_transfer_step(e, aa, m, interpret=True))
        out = f(env, a, mx)
        assert out.shape == (8, 2, 2)


class TestFusedTransferStepComplex:
    @pytest.mark.parametrize("B,D,K", [(4, 2, 2), (130, 3, 2)])
    def test_matches_einsum(self, B, D, K):
        from tneq_tpu.ops.pallas_kernels import fused_transfer_step_complex

        rng = np.random.default_rng(0)
        mk = lambda s: jnp.asarray(
            (rng.normal(size=s) + 1j * rng.normal(size=s)), jnp.complex64
        )
        env, a, mx = mk((B, D, D)), mk((D, K, D)), mk((B, K, K))
        got = fused_transfer_step_complex(env, a, mx, interpret=True)
        expect = jnp.einsum(
            "zab,akc,zkl,bld->zcd", env, a, mx, jnp.conj(a)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-4
        )

    def test_real_kernel_consistency(self):
        """Complex kernel on real inputs == real kernel."""
        from tneq_tpu.ops.pallas_kernels import (
            fused_transfer_step,
            fused_transfer_step_complex,
        )

        rng = np.random.default_rng(1)
        env = jnp.asarray(rng.normal(size=(8, 2, 2)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(2, 2, 2)), jnp.float32)
        mx = jnp.asarray(rng.normal(size=(8, 2, 2)), jnp.float32)
        r = fused_transfer_step(env, a, mx, interpret=True)
        c = fused_transfer_step_complex(
            env.astype(jnp.complex64), a.astype(jnp.complex64),
            mx.astype(jnp.complex64), interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(c).real, np.asarray(r), rtol=1e-4, atol=1e-5
        )


class TestTransferStepVJP:
    """Differentiable kernels: custom-VJP gradients match XLA einsum
    gradients (f32 accumulation-order noise allowed)."""

    def _data(self, complex_=False):
        rng = np.random.default_rng(0)
        B, D, K = 16, 4, 3

        def mk(shape):
            x = rng.normal(size=shape)
            if complex_:
                x = x + 1j * rng.normal(size=shape)
            return jnp.asarray(x, jnp.complex64 if complex_ else jnp.float32)

        return mk((B, D, D)), mk((D, K, D)), mk((B, K, K))

    def test_real_grad_parity(self):
        from tneq_tpu.ops.pallas_kernels import transfer_step

        env, a, mx = self._data()

        def ref(env, a, mx):
            return jnp.einsum("zab,akc,zkl,bld->zcd", env, a, mx, a)

        with jax.default_matmul_precision("highest"):
            np.testing.assert_allclose(
                np.asarray(transfer_step(env, a, mx)),
                np.asarray(ref(env, a, mx)), rtol=1e-5, atol=1e-5,
            )
            gk = jax.grad(
                lambda *t: jnp.sum(jnp.sin(transfer_step(*t))), argnums=(0, 1, 2)
            )(env, a, mx)
            gr = jax.grad(
                lambda *t: jnp.sum(jnp.sin(ref(*t))), argnums=(0, 1, 2)
            )(env, a, mx)
        for x, y in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=5e-3, atol=1e-4
            )

    def test_complex_grad_parity(self):
        from tneq_tpu.ops.pallas_kernels import transfer_step_complex

        env, a, mx = self._data(complex_=True)

        def ref(env, a, mx):
            return jnp.einsum("zab,akc,zkl,bld->zcd", env, a, mx, jnp.conj(a))

        with jax.default_matmul_precision("highest"):
            np.testing.assert_allclose(
                np.asarray(transfer_step_complex(env, a, mx)),
                np.asarray(ref(env, a, mx)), rtol=1e-4, atol=1e-4,
            )
            gk = jax.grad(
                lambda *t: jnp.sum(jnp.abs(transfer_step_complex(*t)) ** 2),
                argnums=(0, 1, 2),
            )(env, a, mx)
            gr = jax.grad(
                lambda *t: jnp.sum(jnp.abs(ref(*t)) ** 2), argnums=(0, 1, 2)
            )(env, a, mx)
        for x, y in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=5e-3, atol=5e-3
            )

    def test_sweep_trains_with_pallas(self):
        """End-to-end: gradient of the pallas-routed siamese sweep matches
        the XLA sweep gradient on a chain graph."""
        from tneq_tpu.graph import mps_graph, parse_graph
        from tneq_tpu.model.qctn import init_params
        from tneq_tpu.ops.mps_sweep import mps_sweep_siamese_fn
        from tneq_tpu.train.trainer import basis_states

        g = parse_graph(mps_graph(6, dim=3))
        params = init_params(g, jax.random.PRNGKey(0), jnp.float32)
        states = basis_states(g, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        K = g.output_ranks[0]
        measures = [
            jnp.asarray(rng.normal(size=(8, K, K)), jnp.float32)
            for _ in range(g.nqubits)
        ]
        fn_x = mps_sweep_siamese_fn(g, use_pallas=False)
        fn_p = mps_sweep_siamese_fn(g, use_pallas=True, pallas_interpret=True)

        def loss(fn, p):
            return jnp.sum(fn(p, states, measures) ** 2)

        with jax.default_matmul_precision("highest"):
            lx, gx = jax.value_and_grad(lambda p: loss(fn_x, p))(params)
            lp, gp = jax.value_and_grad(lambda p: loss(fn_p, p))(params)
        np.testing.assert_allclose(float(lx), float(lp), rtol=1e-4)
        for n in gx:
            np.testing.assert_allclose(
                np.asarray(gx[n]), np.asarray(gp[n]), rtol=5e-3, atol=1e-4
            )
