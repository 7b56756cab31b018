"""Model-state sharding (parallel/fsdp.py): params + optimizer state live
sharded over the model axis; compute gathers, updates stay sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tneq_tpu.graph import mps_graph, parse_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.parallel import make_mesh
from tneq_tpu.parallel.fsdp import (
    make_fsdp_network_fit_step,
    stack_params,
    stacked_sgdg,
    unstack_params,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return make_mesh({"model": 8})


class TestStacking:
    def test_roundtrip(self):
        g = parse_graph(mps_graph(6, dim=4))
        params = init_params(g, jax.random.PRNGKey(0), jnp.float32)
        stacked = stack_params(g, params, pad_to=1)
        back = unstack_params(stacked)
        for n in params:
            np.testing.assert_array_equal(np.asarray(back[n]), np.asarray(params[n]))

    def test_padding_to_mesh_multiple(self):
        g = parse_graph(mps_graph(6, dim=4))  # 5 cores: 1 first, 3 mid, 1 last
        params = init_params(g, jax.random.PRNGKey(0), jnp.float32)
        stacked = stack_params(g, params, pad_to=4)
        for arr, ns in zip(stacked.arrays, stacked.names):
            assert arr.shape[0] % 4 == 0
            assert arr.shape[0] >= len(ns)


class TestStackedSGDG:
    def test_matches_unstacked_sgdg(self):
        """Vmapped stacked update == per-core sgdg update (retraction off
        for determinism)."""
        from tneq_tpu.optim.stiefel import sgdg

        g = parse_graph(mps_graph(6, dim=4))
        params = init_params(g, jax.random.PRNGKey(1), jnp.float32)
        grads = {
            n: 0.01 * jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(2), i), v.shape)
            for i, (n, v) in enumerate(sorted(params.items()))
        }
        opt_ref = sgdg(0.05, momentum=0.9, stiefel=True, retraction_prob=0.0)
        s_ref = opt_ref.init(params)
        u_ref, _ = opt_ref.update(grads, s_ref, params)

        stacked = stack_params(g, params, pad_to=1)
        g_stacked = stack_params(g, grads, pad_to=1)
        opt = stacked_sgdg(0.05, momentum=0.9, stiefel=True, retraction_prob=0.0)
        st = opt.init(stacked.arrays)
        u_st, _ = opt.update(g_stacked.arrays, st, stacked.arrays)
        u_dict = unstack_params(
            type(stacked)(tuple(u_st), stacked.names, stacked.n_real)
        )
        for n in u_ref:
            np.testing.assert_allclose(
                np.asarray(u_ref[n]), np.asarray(u_dict[n]), rtol=1e-4, atol=1e-6
            )


class TestFSDPStep:
    def test_sharded_training_step(self, mesh):
        g = parse_graph(mps_graph(10, dim=8))
        params = init_params(g, jax.random.PRNGKey(3), jnp.float32)
        target = {
            n: v + 0.01 * jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(4), i), v.shape)
            for i, (n, v) in enumerate(sorted(params.items()))
        }
        step, prepare, opt = make_fsdp_network_fit_step(
            g, mesh, learning_rate=1e-2, momentum=0.9
        )
        arrays = prepare(params)
        t_arrays = prepare(target)
        # the dominant (middle-core) group is genuinely sharded over the
        # model axis; 1-core groups replicate
        big = max(arrays, key=lambda a: a.size)
        assert big.sharding.spec == P("model")
        opt_state = opt.init(arrays)
        losses = []
        for _ in range(4):
            arrays, opt_state, loss = step(arrays, opt_state, t_arrays)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] <= losses[0] + 1e-6
        # updated params AND momentum remain sharded (dominant group)
        big = max(arrays, key=lambda a: a.size)
        assert big.sharding.spec == P("model")
        big_m = max(opt_state.momentum, key=lambda a: a.size)
        assert getattr(big_m.sharding, "spec", None) == P("model")

    def test_loss_matches_replicated(self, mesh):
        """First-step loss equals the unsharded network_log_fidelity."""
        from tneq_tpu.train.network_fit import network_log_fidelity

        g = parse_graph(mps_graph(8, dim=4))
        params = init_params(g, jax.random.PRNGKey(5), jnp.float32)
        target = init_params(g, jax.random.PRNGKey(6), jnp.float32)
        step, prepare, opt = make_fsdp_network_fit_step(g, mesh)
        arrays, t_arrays = prepare(params), prepare(target)
        opt_state = opt.init(arrays)
        _, _, loss = step(arrays, opt_state, t_arrays)
        want = -float(network_log_fidelity(g, params, target))
        np.testing.assert_allclose(float(loss), want, rtol=1e-4, atol=1e-5)
