"""Smoke tests for the visual diagnostics (VERDICT r3 item 10).

Parity target: the reference's plotting blocks in
``tests/test_probabilities.py:197-341`` (marginal heatmap + sampling
scatter).  Here we verify the PNGs render headlessly and the heatmap grid
is a genuine probability surface (finite, non-negative, non-constant).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tneq_tpu.graph import parse_graph
from tneq_tpu.infer import sample
from tneq_tpu.model.qctn import init_params
from tneq_tpu.utils.plots import (
    marginal_grid,
    marginal_heatmap_png,
    sampling_scatter_png,
)

EDGE = 12  # tiny grid: the reference uses 100, semantics are identical


def _setup():
    graph = parse_graph("-2-A-2-\n-2-B-2-")
    params = init_params(graph, jax.random.PRNGKey(0), jnp.complex64)
    return graph, params


class TestMarginalHeatmap:
    def test_grid_is_probability_surface(self):
        graph, params = _setup()
        grid = marginal_grid(graph, params, edge_size=EDGE)
        assert grid.shape == (EDGE, EDGE)
        assert np.all(np.isfinite(grid))
        assert np.all(grid >= -1e-9)
        assert grid.max() > grid.min()  # not a constant field

    def test_png_written(self, tmp_path):
        graph, params = _setup()
        out = tmp_path / "heatmap.png"
        grid = marginal_heatmap_png(graph, params, str(out), edge_size=EDGE)
        assert out.exists() and out.stat().st_size > 1000
        assert grid.shape == (EDGE, EDGE)


class TestSamplingScatter:
    def test_png_written_from_sampler(self, tmp_path):
        graph, params = _setup()
        from tneq_tpu.train.trainer import basis_states

        states = [jnp.asarray(s) for s in basis_states(graph)]
        draws = sample(
            graph, params, states, num_samples=16, K=2,
            key=jax.random.PRNGKey(1), grid_size=32,
        )
        out = tmp_path / "scatter.png"
        sampling_scatter_png(draws, str(out))
        assert out.exists() and out.stat().st_size > 1000

    def test_shape_validation(self, tmp_path):
        import pytest

        with pytest.raises(ValueError):
            sampling_scatter_png(np.zeros((4,)), str(tmp_path / "x.png"))
