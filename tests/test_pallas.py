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
