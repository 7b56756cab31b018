"""Strategy compiler + dtype policy tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.graph import mps_graph, parse_graph, wall_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.ops import measurement_matrices
from tneq_tpu.ops.compiler import compile_siamese, estimate_cost
from tneq_tpu.parallel import make_mesh
from tneq_tpu.train.trainer import basis_states
from tneq_tpu.utils.dtypes import BF16_COMPUTE, DEFAULT, Policy


def _setup(src, dtype=jnp.complex64):
    g = parse_graph(src)
    params = init_params(g, jax.random.PRNGKey(0), dtype)
    states = basis_states(g, dtype=dtype)
    x = jnp.zeros((4, g.nqubits), jnp.float32)
    mx = measurement_matrices(x, 2).astype(dtype)
    measures = [mx[:, q] for q in range(g.nqubits)]
    return g, params, states, measures


class TestCompiler:
    def test_auto_picks_sweep_for_chain(self):
        g, params, states, measures = _setup(mps_graph(4, dim=2))
        fn, name = compile_siamese(g)
        assert name == "mps_sweep"
        out = fn(params, states, measures)
        assert out.shape == (4,)

    def test_auto_picks_einsum_for_wall(self):
        g, params, states, measures = _setup(wall_graph(4, layers=2, dim=2))
        fn, name = compile_siamese(g)
        assert name == "einsum_xla"

    def test_auto_picks_sliced_with_model_mesh(self):
        g, params, states, measures = _setup(wall_graph(4, layers=2, dim=2))
        mesh = make_mesh({"data": 4, "model": 2})
        fn, name = compile_siamese(g, mesh=mesh)
        assert name == "sliced_shard_map"
        out = fn(params, states, measures)
        # all strategies agree
        fn_e, _ = compile_siamese(g, mode="einsum")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(fn_e(params, states, measures)),
            atol=1e-5,
        )

    def test_forced_modes(self):
        g, *_ = _setup(mps_graph(3, dim=2))
        _, name = compile_siamese(g, mode="einsum")
        assert name == "einsum_xla"
        with pytest.raises(ValueError):
            compile_siamese(parse_graph(wall_graph(4, 2, 2)), mode="mps_sweep")
        with pytest.raises(ValueError):
            compile_siamese(g, mode="sliced")  # no mesh
        with pytest.raises(ValueError):
            compile_siamese(g, mode="turbo")

    def test_estimate_cost(self):
        small = estimate_cost(parse_graph(mps_graph(3, dim=2)), batch=4)
        big = estimate_cost(parse_graph(mps_graph(8, dim=2)), batch=4)
        if small is not None:  # native lib present
            assert big > small > 0


class TestDtypePolicy:
    def test_default_complex(self):
        assert DEFAULT.is_complex

    def test_bf16_cast_roundtrip(self):
        p = {"a": jnp.ones((4, 4), jnp.float32)}
        cast = BF16_COMPUTE.cast_params(p)
        assert cast["a"].dtype == jnp.bfloat16
        out = BF16_COMPUTE.cast_output(cast["a"] @ cast["a"])
        assert out.dtype == jnp.float32

    def test_bf16_contraction_close_to_f32(self):
        g, params, states, measures = _setup(
            wall_graph(4, layers=2, dim=2), dtype=jnp.float32
        )
        fn, _ = compile_siamese(g)
        exact = np.asarray(fn(params, states, measures))
        pol = BF16_COMPUTE
        approx = np.asarray(
            fn(
                pol.cast_params(params),
                [s.astype(jnp.bfloat16) for s in states],
                [m.astype(jnp.bfloat16) for m in measures],
            ).astype(jnp.float32)
        )
        np.testing.assert_allclose(approx, exact, rtol=0.1, atol=1e-3)
