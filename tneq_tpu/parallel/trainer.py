"""Distributed trainer orchestration: config + mesh + sharded training loop.

Rebuild of the reference's ``DistributedTrainer`` / ``DistributedConfig``
(``tneq_qc/distributed/trainer/distributed_trainer.py``): one config object
describing mesh axes, parallelism, training and checkpoint knobs; a trainer
that builds the mesh, the (optionally bond-sliced) sharded train step, runs
the loop with rank-0-style logging, and saves/restores full resume state.
The reference's comm-backend selection (mock/mpi/torch) maps to mesh axis
sizes: a 1-device mesh IS the mock backend.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph, parse_graph
from ..model.qctn import init_params
from ..ops.contract import abs_square, make_siamese_fn
from ..ops.features import measurement_matrices
from ..optim.factory import make_optimizer
from ..train.losses import nll_loss
from ..train.trainer import TrainingStats, basis_states
from ..utils.checkpoint import CheckpointManager
from .mesh import make_mesh
from .mp import make_sliced_siamese_fn

__all__ = ["DistributedConfig", "DistributedTrainer"]


@dataclass
class DistributedConfig:
    """Reference ``DistributedConfig`` fields mapped to mesh language
    (``distributed_trainer.py:35-172``)."""

    graph: str = ""  # DSL string (required)
    data_axis: int = 0  # 0 = use all remaining devices
    model_axis: int = 1  # bond-slice ways (1 = no model parallelism)
    method: str = "sgdg"
    learning_rate: float = 1e-2
    momentum: float = 0.9
    stiefel: bool = True
    max_steps: int = 1000
    batch_size: int = 32
    num_batches: int = 4
    K: Optional[int] = None
    dtype: str = "complex64"
    seed: int = 0
    log_every: int = 50
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0
    resume: bool = False
    tol: float = 0.0

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DistributedConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_file(cls, path: str) -> "DistributedConfig":
        text = Path(path).read_text()
        if path.endswith((".yml", ".yaml")):
            try:
                import yaml

                return cls.from_dict(yaml.safe_load(text))
            except ImportError as e:
                raise ImportError("pyyaml not available; use JSON config") from e
        return cls.from_dict(json.loads(text))

    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)


class DistributedTrainer:
    def __init__(self, config: DistributedConfig, devices=None):
        self.config = config
        if not config.graph:
            raise ValueError("config.graph (DSL string) is required")
        self.graph: CircuitGraph = parse_graph(config.graph)
        self.dtype = jnp.complex64 if config.dtype == "complex64" else jnp.float32

        devices = list(devices if devices is not None else jax.devices())
        model = max(1, config.model_axis)
        data = config.data_axis or max(1, len(devices) // model)
        self.mesh = make_mesh(
            {"data": data, "model": model}, devices=devices[: data * model]
        )

        ranks = set(self.graph.output_ranks)
        self.K = config.K or (next(iter(ranks)) if len(ranks) == 1 else None)
        if self.K is None:
            raise ValueError("mixed output ranks; set config.K")

        opt_kwargs: Dict[str, Any] = {"lr": config.learning_rate}
        if config.method in ("sgdg", "adamg"):
            opt_kwargs.update(
                momentum=config.momentum, stiefel=config.stiefel,
                seed=config.seed,
            )
        self.optimizer = make_optimizer(config.method, **opt_kwargs)
        self.states = basis_states(self.graph, dtype=self.dtype)

        if model > 1:
            self._contract = make_sliced_siamese_fn(
                self.graph, self.mesh, model_axis="model", data_axis="data"
            )
        else:
            self._contract = make_siamese_fn(self.graph)
        self._train_step = self._build_step()

        self.ckpt = (
            CheckpointManager(config.checkpoint_dir)
            if config.checkpoint_dir
            else None
        )

    def _build_step(self):
        optimizer = self.optimizer
        contract = self._contract
        states = self.states
        K = self.K
        dtype = self.dtype
        nq = self.graph.nqubits

        def loss_fn(params, x):
            mx = measurement_matrices(x, K).astype(dtype)
            measures = [mx[:, q] for q in range(nq)]
            raw = contract(params, states, measures)
            probs = abs_square(raw) if jnp.iscomplexobj(raw) else raw
            return nll_loss(probs)

        @jax.jit
        def step(params, opt_state, x):
            loss, grads = jax.value_and_grad(loss_fn)(params, x)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        return step

    def _log(self, msg: str) -> None:
        if jax.process_index() == 0:
            print(msg, flush=True)

    def prepare_data(self) -> List[jax.Array]:
        """Deterministic Gaussian batches, identical on every process
        (the reference broadcasts rank-0 batches,
        ``distributed_trainer.py:347-398``; a shared seed achieves the same)."""
        rng = np.random.default_rng(self.config.seed)
        return [
            jnp.asarray(
                rng.normal(size=(self.config.batch_size, self.graph.nqubits)),
                jnp.float32,
            )
            for _ in range(self.config.num_batches)
        ]

    def train(
        self,
        params: Optional[Dict[str, jax.Array]] = None,
        data_list: Optional[Sequence[jax.Array]] = None,
    ):
        cfg = self.config
        if params is None:
            params = init_params(self.graph, jax.random.PRNGKey(cfg.seed), self.dtype)
        data_list = data_list if data_list is not None else self.prepare_data()
        opt_state = self.optimizer.init(params)

        start_step = 0
        if cfg.resume and self.ckpt and self.ckpt.latest_step() is not None:
            start_step, saved_params, saved_opt, extra = self.ckpt.load(
                opt_state_template=opt_state
            )
            params = {
                k: jnp.asarray(v, self.dtype) for k, v in saved_params.items()
            }
            if saved_opt is not None:
                opt_state = saved_opt
            self._log(f"resumed from step {start_step}")

        stats = TrainingStats()
        prev = None
        t0 = time.time()
        for step_idx in range(start_step, cfg.max_steps):
            x = data_list[step_idx % len(data_list)]
            params, opt_state, loss = self._train_step(params, opt_state, x)
            loss_f = float(loss)
            stats.losses.append(loss_f)
            stats.steps = step_idx + 1
            if cfg.log_every and step_idx % cfg.log_every == 0:
                self._log(f"step {step_idx}: loss={loss_f:.6f}")
            if (
                self.ckpt
                and cfg.checkpoint_every
                and step_idx
                and step_idx % cfg.checkpoint_every == 0
            ):
                self.ckpt.save(step_idx, params, opt_state)
            if cfg.tol and prev is not None and abs(loss_f - prev) < cfg.tol:
                stats.converged = True
                break
            prev = loss_f
        stats.wall_time = time.time() - t0
        if self.ckpt:
            self.ckpt.save(stats.steps, params, opt_state)
        return params, stats


def main(argv: Optional[Sequence[str]] = None):
    """CLI mirroring the reference's ``distributed_trainer.py main()``."""
    import argparse

    p = argparse.ArgumentParser(description="Distributed QCTN training")
    p.add_argument("--config", type=str, default=None, help="JSON/YAML config")
    p.add_argument("--graph-type", default="mps")
    p.add_argument("--num-qubits", type=int, default=6)
    p.add_argument("--dim", type=int, default=2)
    p.add_argument("--model-axis", type=int, default=1)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    if args.config:
        cfg = DistributedConfig.from_file(args.config)
    else:
        from ..graph.generators import example_graph

        cfg = DistributedConfig(
            graph=example_graph(args.num_qubits, args.graph_type, args.dim),
            model_axis=args.model_axis,
            max_steps=args.steps,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
    trainer = DistributedTrainer(cfg)
    params, stats = trainer.train()
    trainer._log(
        f"done: {stats.steps} steps, final loss "
        f"{stats.final_loss:.6f}, {stats.wall_time:.1f}s"
    )
    return stats


if __name__ == "__main__":
    main()
