"""Utils (config/logging/checkpoint) and distributed-trainer tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.graph import mps_graph, wall_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.optim import sgdg
from tneq_tpu.parallel.trainer import DistributedConfig, DistributedTrainer
from tneq_tpu.utils import (
    AgentBehavior,
    CheckpointManager,
    Configuration,
    setup_colored_logger,
)
from tneq_tpu.utils.config import load_func


class TestConfig:
    def test_defaults(self):
        a = AgentBehavior()
        assert a.n_iter == 10 and a.timeout == 1800.0

    def test_load_func(self):
        f = load_func("numpy.mean")
        assert f([1, 2, 3]) == 2.0

    def test_distributed_config_from_dict_ignores_unknown(self):
        cfg = DistributedConfig.from_dict(
            {"graph": "-2-A-2-", "max_steps": 5, "bogus_key": 1}
        )
        assert cfg.max_steps == 5

    def test_distributed_config_from_json_file(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"graph": "-2-A-2-", "batch_size": 8}))
        cfg = DistributedConfig.from_file(str(p))
        assert cfg.batch_size == 8


class TestLogging:
    def test_colored_logger(self, capsys):
        log = setup_colored_logger("testlog", rank=3)
        log.info("hello")
        err = capsys.readouterr().err
        assert "[Rank 3]" in err and "hello" in err


class TestCheckpoint:
    def test_save_load_roundtrip_with_opt_state(self, tmp_path):
        graph_src = mps_graph(3, dim=2)
        from tneq_tpu.graph import parse_graph

        graph = parse_graph(graph_src)
        params = init_params(graph, jax.random.PRNGKey(0), jnp.complex64)
        opt = sgdg(0.1, momentum=0.9)
        state = opt.init(params)
        # take one step so the state is nontrivial
        g = jax.tree.map(jnp.ones_like, params)
        updates, state = opt.update(g, state, params)

        mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
        mgr.save(7, params, state, extra={"note": "x"})
        assert mgr.latest_step() == 7

        step, loaded_params, loaded_state, extra = mgr.load(
            opt_state_template=opt.init(params)
        )
        assert step == 7 and extra["note"] == "x"
        for n in params:
            np.testing.assert_allclose(
                np.asarray(params[n]), loaded_params[n], atol=1e-7
            )
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_retention(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "c", keep=2)
        params = {"a": jnp.ones((2, 2))}
        for s in [1, 2, 3, 4]:
            mgr.save(s, params)
        assert mgr.all_steps() == [3, 4]

    def test_load_empty_raises(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "empty")
        with pytest.raises(FileNotFoundError):
            mgr.load()


class TestDistributedTrainer:
    def test_train_dp_only(self):
        cfg = DistributedConfig(
            graph=wall_graph(4, layers=2, dim=2),
            model_axis=1,
            max_steps=10,
            batch_size=16,
            log_every=0,
        )
        trainer = DistributedTrainer(cfg)
        params, stats = trainer.train()
        assert stats.steps == 10
        assert np.isfinite(stats.final_loss)

    def test_train_with_model_axis_and_resume(self, tmp_path):
        cfg = DistributedConfig(
            graph=wall_graph(4, layers=2, dim=2),
            model_axis=2,
            max_steps=6,
            batch_size=8,
            log_every=0,
            checkpoint_dir=str(tmp_path / "ck"),
            checkpoint_every=3,
        )
        trainer = DistributedTrainer(cfg)
        params, stats = trainer.train()
        assert stats.steps == 6

        # resume continues from the saved step
        cfg2 = DistributedConfig(**{**cfg.to_dict(), "max_steps": 9,
                                    "resume": True})
        trainer2 = DistributedTrainer(cfg2)
        params2, stats2 = trainer2.train()
        assert stats2.steps == 9
        assert len(stats2.losses) == 3  # only the resumed steps ran

    def test_sliced_equals_unsliced_loss(self):
        base = dict(
            graph=wall_graph(4, layers=2, dim=2),
            max_steps=1,
            batch_size=8,
            log_every=0,
            seed=3,
        )
        t1 = DistributedTrainer(DistributedConfig(model_axis=1, **base))
        t2 = DistributedTrainer(DistributedConfig(model_axis=2, **base))
        _, s1 = t1.train()
        _, s2 = t2.train()
        assert s1.final_loss == pytest.approx(s2.final_loss, rel=1e-4)
