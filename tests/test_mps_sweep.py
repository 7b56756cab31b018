"""MPS sweep strategy tests: equivalence with the general einsum path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.graph import mps_graph, parse_graph, wall_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.ops import make_siamese_fn, measurement_matrices
from tneq_tpu.ops.mps_sweep import is_mps_chain, mps_sweep_siamese_fn


def setup(n, dim=2, B=4, dtype=jnp.complex64, seed=0):
    g = parse_graph(mps_graph(n, dim=dim))
    params = init_params(g, jax.random.PRNGKey(seed), dtype)
    rng = np.random.default_rng(seed)
    states = [
        jnp.asarray(rng.normal(size=(dim,)).astype(np.float32)).astype(dtype)
        for _ in range(n)
    ]
    x = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
    mx = measurement_matrices(x, dim).astype(dtype)
    measures = [mx[:, q] for q in range(n)]
    return g, params, states, measures


class TestMPSSweep:
    def test_is_mps_chain(self):
        assert is_mps_chain(parse_graph(mps_graph(5, dim=3)))
        assert not is_mps_chain(parse_graph(wall_graph(4, layers=2, dim=2)))
        assert not is_mps_chain(parse_graph("-2-A-2-\n-2-B-2-"))

    @pytest.mark.parametrize("n", [2, 3, 5, 8])
    def test_matches_einsum_path(self, n):
        g, params, states, measures = setup(n)
        full = make_siamese_fn(g)(params, states, measures)
        sweep = mps_sweep_siamese_fn(g)(params, states, measures)
        np.testing.assert_allclose(
            np.asarray(sweep), np.asarray(full), rtol=2e-4, atol=1e-6
        )

    def test_real_dtype(self):
        g, params, states, measures = setup(4, dtype=jnp.float32)
        full = make_siamese_fn(g)(params, states, measures)
        sweep = mps_sweep_siamese_fn(g)(params, states, measures)
        np.testing.assert_allclose(
            np.asarray(sweep), np.asarray(full), rtol=2e-4, atol=1e-6
        )

    def test_scan_path_used_for_uniform_chain(self):
        # uniform bond dims -> scan path; just ensure jit works & matches
        g, params, states, measures = setup(8)
        f = jax.jit(lambda p: mps_sweep_siamese_fn(g)(p, states, measures))
        out = f(params)
        full = make_siamese_fn(g)(params, states, measures)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full), rtol=2e-4)

    def test_non_chain_raises(self):
        g = parse_graph(wall_graph(4, layers=2, dim=2))
        with pytest.raises(ValueError):
            mps_sweep_siamese_fn(g)

    def test_gradients_match(self):
        g, params, states, measures = setup(5)
        from tneq_tpu.ops.contract import abs_square
        from tneq_tpu.train.losses import nll_loss

        def loss_sweep(p):
            return nll_loss(abs_square(mps_sweep_siamese_fn(g)(p, states, measures)))

        def loss_full(p):
            return nll_loss(abs_square(make_siamese_fn(g)(p, states, measures)))

        g1 = jax.grad(loss_sweep)(params)
        g2 = jax.grad(loss_full)(params)
        for n in params:
            np.testing.assert_allclose(
                np.asarray(g1[n]), np.asarray(g2[n]), rtol=1e-3, atol=1e-5
            )


class TestPallasSweep:
    def test_pallas_sweep_matches_xla(self):
        g, params, states, measures = setup(6, dtype=jnp.complex64)
        xla = mps_sweep_siamese_fn(g)(params, states, measures)
        pal = mps_sweep_siamese_fn(g, use_pallas=True, pallas_interpret=True)(
            params, states, measures
        )
        np.testing.assert_allclose(
            np.asarray(pal), np.asarray(xla), rtol=1e-3, atol=1e-5
        )

    def test_pallas_sweep_real(self):
        g, params, states, measures = setup(5, dtype=jnp.float32)
        xla = mps_sweep_siamese_fn(g)(params, states, measures)
        pal = mps_sweep_siamese_fn(g, use_pallas=True, pallas_interpret=True)(
            params, states, measures
        )
        np.testing.assert_allclose(
            np.asarray(pal), np.asarray(xla), rtol=1e-3, atol=1e-5
        )
