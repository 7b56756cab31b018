"""Parallel tests on the 8-device virtual CPU mesh: DP sharding, sliced MP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.graph import parse_graph, wall_graph, mps_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.ops import make_siamese_fn, measurement_matrices
from tneq_tpu.parallel import (
    choose_slice_bonds,
    make_dp_train_step,
    make_mesh,
    make_sliced_siamese_fn,
    shard_batch,
)
from tneq_tpu.train.trainer import Trainer, TrainingConfig, basis_states


@pytest.fixture(scope="module")
def graph():
    return parse_graph(wall_graph(4, layers=2, dim=2))


@pytest.fixture(scope="module")
def params(graph):
    return init_params(graph, jax.random.PRNGKey(0), jnp.complex64)


def measures_for(graph, x, dtype=jnp.complex64):
    mx = measurement_matrices(x, 2).astype(dtype)
    return [mx[:, q] for q in range(graph.nqubits)]


class TestMesh:
    def test_make_mesh_default(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8}

    def test_make_mesh_2d(self):
        mesh = make_mesh({"data": 4, "model": 2})
        assert mesh.shape == {"data": 4, "model": 2}

    def test_bad_sizes_raise(self):
        with pytest.raises(ValueError):
            make_mesh({"data": 3})


class TestDataParallel:
    def test_dp_step_matches_single_device(self, graph):
        cfg = TrainingConfig(method="sgdg", learning_rate=0.05, momentum=0.9)
        trainer = Trainer(graph, config=cfg)
        params = init_params(graph, jax.random.PRNGKey(1), jnp.complex64)
        states = basis_states(graph)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(16, graph.nqubits)),
            jnp.float32,
        )

        # single-device reference step
        opt_state = trainer.optimizer.init(params)
        p1, _, loss1 = trainer.train_step(params, opt_state, states, x)

        mesh = make_mesh({"data": 8})
        dp_step = make_dp_train_step(trainer, mesh)
        opt_state2 = trainer.optimizer.init(params)
        xs = shard_batch(x, mesh)
        p2, _, loss2 = dp_step(params, opt_state2, states, xs)

        assert float(loss1) == pytest.approx(float(loss2), rel=1e-4)
        for n in params:
            np.testing.assert_allclose(
                np.asarray(p1[n]), np.asarray(p2[n]), atol=5e-5
            )

    def test_dp_output_sharding(self, graph):
        trainer = Trainer(graph, config=TrainingConfig(learning_rate=0.01))
        mesh = make_mesh({"data": 8})
        x = jnp.zeros((8, graph.nqubits), jnp.float32)
        xs = shard_batch(x, mesh)
        assert len(xs.sharding.device_set) == 8


class TestSlicedModelParallel:
    def test_choose_slice_bonds(self, graph):
        bonds = choose_slice_bonds(graph, 2)
        assert len(bonds) == 1
        assert choose_slice_bonds(graph, 1) == ()
        bonds4 = choose_slice_bonds(graph, 4)
        assert len(bonds4) == 2

    def test_choose_insufficient_raises(self):
        g = parse_graph("-2-A-2-")  # no internal bonds at all
        with pytest.raises(ValueError):
            choose_slice_bonds(g, 2)

    def test_padded_slicing_matches_unsliced(self):
        # bond rank 3 over a 2-way model axis: slice space padded 3 -> 4
        g = parse_graph(mps_graph(3, dim=3))
        params = init_params(g, jax.random.PRNGKey(7), jnp.complex64)
        mesh = make_mesh({"data": 4, "model": 2})
        x = jnp.asarray(
            np.random.default_rng(5).normal(size=(4, 3)), jnp.float32
        )
        states = basis_states(g)
        mx = measurement_matrices(x, 3).astype(jnp.complex64)
        measures = [mx[:, q] for q in range(3)]
        full = make_siamese_fn(g)(params, states, measures)
        got = make_sliced_siamese_fn(g, mesh)(params, states, measures)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(full), atol=1e-5
        )

    @pytest.mark.parametrize("model_size", [2, 4])
    def test_sliced_matches_unsliced(self, graph, params, model_size):
        mesh = make_mesh({"data": 8 // model_size, "model": model_size})
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(8, graph.nqubits)), jnp.float32
        )
        states = basis_states(graph)
        measures = measures_for(graph, x)

        full = make_siamese_fn(graph)(params, states, measures)
        sliced_fn = make_sliced_siamese_fn(graph, mesh)
        got = sliced_fn(params, states, measures)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(full), atol=1e-5
        )

    def test_sliced_is_differentiable(self, graph, params):
        mesh = make_mesh({"data": 4, "model": 2})
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(4, graph.nqubits)), jnp.float32
        )
        states = basis_states(graph)
        measures = measures_for(graph, x)
        from tneq_tpu.ops.contract import abs_square
        from tneq_tpu.train.losses import nll_loss

        sliced_fn = make_sliced_siamese_fn(graph, mesh)

        def loss(p):
            raw = sliced_fn(p, states, measures)
            return nll_loss(abs_square(raw))

        g_sliced = jax.grad(loss)(params)

        full_fn = make_siamese_fn(graph)

        def loss_full(p):
            raw = full_fn(p, states, measures)
            return nll_loss(abs_square(raw))

        g_full = jax.grad(loss_full)(params)
        for n in params:
            np.testing.assert_allclose(
                np.asarray(g_sliced[n]), np.asarray(g_full[n]), atol=1e-4
            )

    def test_sliced_under_jit(self, graph, params):
        mesh = make_mesh({"data": 4, "model": 2})
        x = jnp.zeros((4, graph.nqubits), jnp.float32)
        states = basis_states(graph)
        measures = measures_for(graph, x)
        fn = jax.jit(make_sliced_siamese_fn(graph, mesh))
        out = fn(params, states, measures)
        assert out.shape == (4,)


class TestSlicedTwoNetwork:
    def test_sliced_overlap_matches_unsliced(self):
        from tneq_tpu.ops import make_two_network_fn
        from tneq_tpu.parallel.mp import make_sliced_two_network_fn

        g = parse_graph(wall_graph(4, layers=2, dim=2))
        p1 = init_params(g, jax.random.PRNGKey(0), jnp.complex64)
        p2 = init_params(g, jax.random.PRNGKey(1), jnp.complex64)
        mesh = make_mesh({"data": 4, "model": 2})
        full = complex(make_two_network_fn(g, g, conj_target=True)(p1, p2))
        sliced = complex(make_sliced_two_network_fn(g, g, mesh)(p1, p2))
        assert abs(full - sliced) < 1e-5 * max(1.0, abs(full))

    def test_sliced_overlap_differentiable(self):
        from tneq_tpu.ops import make_two_network_fn
        from tneq_tpu.parallel.mp import make_sliced_two_network_fn

        g = parse_graph(wall_graph(4, layers=2, dim=2))
        p1 = init_params(g, jax.random.PRNGKey(2), jnp.complex64)
        p2 = init_params(g, jax.random.PRNGKey(3), jnp.complex64)
        mesh = make_mesh({"data": 4, "model": 2})
        fn_s = make_sliced_two_network_fn(g, g, mesh)
        fn_f = make_two_network_fn(g, g, conj_target=True)

        def loss_s(p):
            ov = fn_s(p, p2)
            return jnp.real(ov) ** 2 + jnp.imag(ov) ** 2

        def loss_f(p):
            ov = fn_f(p, p2)
            return jnp.real(ov) ** 2 + jnp.imag(ov) ** 2

        g_s = jax.grad(loss_s)(p1)
        g_f = jax.grad(loss_f)(p1)
        for n in p1:
            np.testing.assert_allclose(
                np.asarray(g_s[n]), np.asarray(g_f[n]), rtol=1e-3, atol=1e-5
            )


class TestMultihost:
    def test_detect_none_by_default(self, monkeypatch):
        from tneq_tpu.parallel.multihost import detect_multihost

        for var in ("JAX_COORDINATOR_ADDRESS", "MASTER_ADDR", "WORLD_SIZE"):
            monkeypatch.delenv(var, raising=False)
        assert detect_multihost() is None

    def test_detect_jax_vars(self, monkeypatch):
        from tneq_tpu.parallel.multihost import detect_multihost

        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        d = detect_multihost()
        assert d == {"coordinator_address": "10.0.0.1:1234",
                     "num_processes": 4, "process_id": 2}

    def test_detect_torchstyle_vars(self, monkeypatch):
        from tneq_tpu.parallel.multihost import detect_multihost

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.setenv("MASTER_ADDR", "node0")
        monkeypatch.setenv("MASTER_PORT", "29500")
        monkeypatch.setenv("WORLD_SIZE", "2")
        monkeypatch.setenv("RANK", "1")
        d = detect_multihost()
        assert d["coordinator_address"] == "node0:29500"
        assert d["num_processes"] == 2 and d["process_id"] == 1

    def test_initialize_noop_single_process(self, monkeypatch):
        from tneq_tpu.parallel.multihost import initialize_multihost, is_main_process

        for var in ("JAX_COORDINATOR_ADDRESS", "MASTER_ADDR", "WORLD_SIZE"):
            monkeypatch.delenv(var, raising=False)
        assert initialize_multihost() is False
        assert is_main_process()
