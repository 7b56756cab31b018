"""Chunked train step + generator helpers tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tneq_tpu.graph import example_graph, parse_graph, wall_graph
from tneq_tpu.graph.generators import TARGET_EXAMPLE, triu_ndindex
from tneq_tpu.model.qctn import init_params
from tneq_tpu.train.trainer import Trainer, TrainingConfig, basis_states


def test_target_example_parses():
    g = parse_graph(example_graph(target=True))
    assert g.nqubits == 5 and g.core_names == ("A", "B", "C", "D", "E")
    assert example_graph(target=True) == TARGET_EXAMPLE


def test_triu_ndindex():
    assert list(triu_ndindex(3)) == [(0, 1), (0, 2), (1, 2)]


def test_chunked_step_matches_loop():
    g = parse_graph(wall_graph(4, layers=2, dim=2))
    cfg = TrainingConfig(method="sgdg", learning_rate=0.05, momentum=0.9,
                         seed=3)
    trainer = Trainer(g, config=cfg)
    params = init_params(g, jax.random.PRNGKey(0), jnp.complex64)
    states = basis_states(g)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(5, 8, 4)), jnp.float32)

    # loop path
    p1 = params
    st1 = trainer.optimizer.init(p1)
    losses1 = []
    for i in range(5):
        p1, st1, l = trainer.train_step(p1, st1, states, xs[i])
        losses1.append(float(l))

    # chunked path
    chunk = trainer.make_chunked_step(5)
    p2, st2, losses2 = chunk(params, trainer.optimizer.init(params), states, xs)

    np.testing.assert_allclose(losses1, np.asarray(losses2), rtol=1e-4)
    for n in p1:
        np.testing.assert_allclose(
            np.asarray(p1[n]), np.asarray(p2[n]), atol=1e-4
        )


def test_data_utils():
    from tneq_tpu.train.data import cycle_batches, gaussian_batches, shuffled_epochs

    batches = gaussian_batches(3, 8, 4, seed=1)
    assert len(batches) == 3 and batches[0].shape == (8, 4)
    # determinism
    again = gaussian_batches(3, 8, 4, seed=1)
    np.testing.assert_array_equal(np.asarray(batches[0]), np.asarray(again[0]))

    it = cycle_batches(batches)
    seq = [next(it) for _ in range(5)]
    np.testing.assert_array_equal(np.asarray(seq[3]), np.asarray(batches[0]))

    sh = shuffled_epochs(batches, seed=0)
    epoch1 = [next(sh) for _ in range(3)]
    assert len(epoch1) == 3


def test_profiling_trace_smoke(tmp_path):
    from tneq_tpu.utils.profiling import trace, annotate

    with trace(str(tmp_path)):
        with annotate("span"):
            _ = jnp.ones((4,)) * 2
    # a trace produces at least one file under the log dir
    assert any(tmp_path.rglob("*"))
