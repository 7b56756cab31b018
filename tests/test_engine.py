"""Engine facade + log-scale contraction tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.engine import EngineSiamese
from tneq_tpu.graph import parse_graph, wall_graph
from tneq_tpu.model import QCTN
from tneq_tpu.ops.scaling import Scaled, auto_scale, scaled_siamese_fn
from tneq_tpu.ops.contract import make_siamese_fn, abs_square
from tneq_tpu.train.trainer import basis_states


@pytest.fixture(scope="module")
def model():
    return QCTN(wall_graph(4, layers=2, dim=2), key=jax.random.PRNGKey(0))


class TestScaling:
    def test_auto_scale_value_preserved(self):
        x = jnp.asarray([[3.0, -6.0], [1.5, 0.5]])
        s = auto_scale(x)
        assert float(jnp.max(jnp.abs(s.data))) == pytest.approx(1.0)
        np.testing.assert_allclose(np.asarray(s.value), np.asarray(x), rtol=1e-6)

    def test_scaled_siamese_matches_plain(self, model):
        states = basis_states(model.graph)
        engine = EngineSiamese()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)), jnp.float32)
        mx, _ = engine.generate_data(x, K=2)
        plain = make_siamese_fn(model.graph)(model.params, states, mx)
        raw, log_scale = scaled_siamese_fn(model.graph)(model.params, states, mx)
        got = np.asarray(raw) * np.exp(float(log_scale))
        np.testing.assert_allclose(got, np.asarray(plain), rtol=1e-4)

    def test_scaled_avoids_overflow(self):
        """Cores scaled up by 1e5 each would overflow float32 in the plain
        path; the scaled path stays finite with the log carried separately."""
        g = parse_graph(wall_graph(4, layers=4, dim=2))
        q = QCTN(g, key=jax.random.PRNGKey(1), dtype=jnp.float32)
        big = {k: v * 1e4 for k, v in q.params.items()}
        states = basis_states(g, dtype=jnp.float32)
        engine = EngineSiamese(dtype=jnp.float32)
        x = jnp.zeros((2, 4), jnp.float32)
        mx, _ = engine.generate_data(x, K=2)
        plain = make_siamese_fn(g)(big, states, mx)
        assert not np.isfinite(np.asarray(plain)).all()  # overflows
        raw, log_scale = scaled_siamese_fn(g)(big, states, mx)
        assert np.isfinite(np.asarray(raw)).all()
        assert np.isfinite(float(log_scale))


class TestEngineFacade:
    def test_generate_data(self):
        engine = EngineSiamese()
        mx_list, phi = engine.generate_data(np.zeros((5, 3)), K=4)
        assert len(mx_list) == 3 and mx_list[0].shape == (5, 4, 4)
        assert phi.shape == (5, 3, 4)

    def test_contract_probabilities(self, model):
        engine = EngineSiamese()
        states = basis_states(model.graph)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4)), jnp.float32)
        mx, _ = engine.generate_data(x, K=2)
        p = engine.contract_with_compiled_strategy(model, states, mx)
        assert p.shape == (4,)
        assert (np.asarray(p) >= 0).all()

    def test_contract_scaled_matches(self, model):
        engine = EngineSiamese(use_scaling=True)
        plain_engine = EngineSiamese()
        states = basis_states(model.graph)
        x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 4)), jnp.float32)
        mx, _ = engine.generate_data(x, K=2)
        p_scaled = engine.contract_with_compiled_strategy(model, states, mx)
        p_plain = plain_engine.contract_with_compiled_strategy(model, states, mx)
        np.testing.assert_allclose(
            np.asarray(p_scaled), np.asarray(p_plain), rtol=1e-3
        )

    def test_gradient_api(self, model):
        engine = EngineSiamese()
        states = basis_states(model.graph)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 4)), jnp.float32)
        mx, _ = engine.generate_data(x, K=2)
        loss, grads = engine.contract_with_compiled_strategy_for_gradient(
            model, states, mx
        )
        assert np.isfinite(float(loss))
        assert set(grads) == set(model.cores)
        # gradient check vs numerical loss difference along one direction
        g0 = grads[model.cores[0]]
        assert np.isfinite(np.asarray(g0)).all()

    def test_gradient_cache(self, model):
        engine = EngineSiamese()
        states = basis_states(model.graph)
        x = jnp.zeros((4, 4), jnp.float32)
        mx, _ = engine.generate_data(x, K=2)
        engine.contract_with_compiled_strategy_for_gradient(model, states, mx)
        n = len(engine._grad_cache)
        engine.contract_with_compiled_strategy_for_gradient(model, states, mx)
        assert len(engine._grad_cache) == n

    def test_probability_and_sampling_delegates(self, model):
        engine = EngineSiamese()
        B = 3
        s0 = jnp.broadcast_to(jnp.asarray([1.0 + 0j, 0.0]), (B, 2))
        states = [s0] * 4
        proj = jnp.broadcast_to(
            jnp.asarray([[1.0, 0], [0, 0]], jnp.complex64), (B, 2, 2)
        )
        p = engine.calculate_full_probability(model, states, [proj] * 4)
        m = engine.calculate_marginal_probability(model, states, [proj], [0])
        c = engine.calculate_conditional_probability(
            model, states, [proj] * 4, [0, 1, 2, 3], [3]
        )
        assert p.shape == m.shape == c.shape == (B,)
        samp = engine.sample(
            model, basis_states(model.graph), 8, 2, grid_size=32,
            key=jax.random.PRNGKey(0),
        )
        assert samp.shape == (8, 4)

    def test_vector_measure_matches_matrix(self, model):
        """measure_is_matrix=False builds rank-1 operators from phi vectors."""
        engine = EngineSiamese()
        states = basis_states(model.graph)
        x = jnp.asarray(np.random.default_rng(5).normal(size=(3, 4)), jnp.float32)
        mx, phi = engine.generate_data(x, K=2)
        phi_list = [phi[:, q].astype(jnp.complex64) for q in range(4)]
        p_vec = engine.contract_with_compiled_strategy(
            model, states, phi_list, measure_is_matrix=False
        )
        p_mat = engine.contract_with_compiled_strategy(model, states, mx)
        np.testing.assert_allclose(
            np.asarray(p_vec), np.asarray(p_mat), rtol=1e-4
        )


def test_gradient_list_form(model=None):
    from tneq_tpu.model import QCTN
    from tneq_tpu.graph import wall_graph

    m = QCTN(wall_graph(4, layers=2, dim=2), key=jax.random.PRNGKey(0))
    engine = EngineSiamese()
    states = basis_states(m.graph)
    x = jnp.zeros((4, 4), jnp.float32)
    mx, _ = engine.generate_data(x, K=2)
    loss_d, gd = engine.contract_with_compiled_strategy_for_gradient(m, states, mx)
    loss_l, gl = engine.contract_with_compiled_strategy_for_gradient(
        m, states, mx, ret="list"
    )
    assert isinstance(gl, list) and len(gl) == m.ncores
    np.testing.assert_allclose(
        np.asarray(gl[0]), np.asarray(gd[m.cores[0]]), atol=1e-7
    )


def test_engine_with_mesh():
    from tneq_tpu.parallel import make_mesh
    from tneq_tpu.model import QCTN
    from tneq_tpu.graph import wall_graph

    m = QCTN(wall_graph(4, layers=2, dim=2), key=jax.random.PRNGKey(0))
    states = basis_states(m.graph)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4)), jnp.float32)
    plain = EngineSiamese()
    mx, _ = plain.generate_data(x, K=2)
    p0 = plain.contract_with_compiled_strategy(m, states, mx)
    meshed = EngineSiamese(mesh=make_mesh({"data": 4, "model": 2}))
    p1 = meshed.contract_with_compiled_strategy(m, states, mx)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-5)


class TestEngineCacheBounds:
    def test_compiled_program_caches_are_lru_bounded(self):
        import jax.numpy as jnp

        from tneq_tpu.engine import EngineSiamese
        from tneq_tpu.graph import mps_graph, parse_graph
        from tneq_tpu.model.qctn import init_params
        import jax

        eng = EngineSiamese(dtype=jnp.float32, cache_size=3)
        g = parse_graph(mps_graph(2, dim=2))
        params = init_params(g, jax.random.PRNGKey(0), jnp.float32)
        from tneq_tpu.train.trainer import basis_states

        states = basis_states(g, dtype=jnp.float32)
        # 5 distinct batch shapes -> 5 distinct cache keys, bounded at 3
        for b in (1, 2, 3, 4, 5):
            mx = jnp.ones((b, 2, 2), jnp.float32)
            eng.contract_with_compiled_strategy(
                None if False else _qctn(g, params), states, [mx, mx]
            )
        assert len(eng._fwd_cache) == 3


def _qctn(graph, params):
    from tneq_tpu.model.qctn import QCTN

    return QCTN(graph, params)
