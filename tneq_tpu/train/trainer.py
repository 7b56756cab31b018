"""Likelihood training: jitted train step + host-side training loop.

Replaces the reference's ``Optimizer`` loop (``tneq_qc/optim/optimizer.py``)
and the engine-gradient plumbing (``engine_siamese.py:351-554``): the whole
forward — Hermite feature map, siamese Born-rule contraction, NLL loss — and
the optimizer update run inside ONE jitted step; the Python loop only feeds
batches and handles schedules / eval / checkpoint hooks.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph
from ..ops.contract import abs_square, make_siamese_fn
from ..ops.features import measurement_matrices
from ..optim.factory import make_optimizer
from ..optim.stiefel import GradientTransformation
from .losses import nll_loss

__all__ = ["TrainingConfig", "TrainingStats", "Trainer", "basis_states"]


@dataclass
class TrainingConfig:
    """Knobs of the reference's training loops (``optimizer.py:5-61``,
    ``data_parallel.py:28-52``)."""

    method: str = "sgdg"
    learning_rate: float = 1e-2
    momentum: float = 0.9
    stiefel: bool = True
    max_steps: int = 1000
    tol: float = 0.0  # stop when |loss - prev| < tol (0 disables)
    log_every: int = 50
    eval_every: int = 0
    save_every: int = 0
    lr_schedule: Optional[Sequence[Tuple[int, float]]] = None
    seed: int = 0


@dataclass
class TrainingStats:
    losses: List[float] = field(default_factory=list)
    steps: int = 0
    wall_time: float = 0.0
    converged: bool = False

    @property
    def final_loss(self) -> Optional[float]:
        return self.losses[-1] if self.losses else None


def basis_states(
    graph: CircuitGraph, index: int = -1, dtype=jnp.complex64
) -> List[jax.Array]:
    """Per-qubit computational-basis state vectors; ``index=-1`` puts the 1
    in the last slot (the reference example's convention,
    ``example_train_single_node.py:46-54``)."""
    states = []
    for rank in graph.input_ranks:
        # host arrays so they can be closure-captured under jit on any backend
        v = np.zeros(rank, np.dtype(dtype))
        v[index] = 1.0
        states.append(v)
    return states


class Trainer:
    """Builds the jitted NLL train step for a circuit + optimizer."""

    def __init__(
        self,
        graph: CircuitGraph,
        optimizer: Optional[GradientTransformation] = None,
        config: Optional[TrainingConfig] = None,
        K: Optional[int] = None,
        dtype=jnp.complex64,
    ):
        self.graph = graph
        self.config = config or TrainingConfig()
        self.dtype = dtype
        # K (Hermite order) must equal the per-qubit output rank
        ranks = set(graph.output_ranks)
        if K is None:
            if len(ranks) != 1:
                raise ValueError(
                    "circuit has mixed output ranks; pass K explicitly"
                )
            K = next(iter(ranks))
        self.K = K
        if optimizer is None:
            cfg = self.config
            lr: Any = cfg.learning_rate
            if cfg.lr_schedule:
                from ..optim.schedules import step_table_schedule

                lr = step_table_schedule(cfg.lr_schedule, cfg.learning_rate)
            kwargs: Dict[str, Any] = {"lr": lr}
            if cfg.method in ("sgdg", "adamg"):
                kwargs.update(momentum=cfg.momentum, stiefel=cfg.stiefel,
                              seed=cfg.seed)
            elif cfg.method in ("momentum", "nesterov"):
                kwargs.update(momentum=cfg.momentum)
            optimizer = make_optimizer(cfg.method, **kwargs)
        self.optimizer = optimizer
        self._siamese = make_siamese_fn(
            graph, with_states=True, states_batched=False, measure_extra_dims=1
        )
        self._train_step = self._build_train_step()

    # -- forward ----------------------------------------------------------

    def probability(self, params, states, x: jax.Array) -> jax.Array:
        """Born-rule probability of data batch ``x [B, nqubits]``."""
        mx = measurement_matrices(x, self.K).astype(self.dtype)
        measures = [mx[:, q] for q in range(self.graph.nqubits)]
        raw = self._siamese(params, states, measures)
        return abs_square(raw) if jnp.iscomplexobj(raw) else raw

    def loss(self, params, states, x: jax.Array) -> jax.Array:
        return nll_loss(self.probability(params, states, x))

    def _build_train_step(self) -> Callable:
        optimizer = self.optimizer

        def step(params, opt_state, states, x):
            loss_val, grads = jax.value_and_grad(self.loss)(params, states, x)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss_val

        return jax.jit(step)

    @property
    def train_step(self) -> Callable:
        """Jitted ``(params, opt_state, states, x) -> (params, opt_state, loss)``."""
        return self._train_step

    def make_chunked_step(self, n_steps: int) -> Callable:
        """``(params, opt_state, states, xs[n_steps, B, nq]) ->
        (params, opt_state, losses[n_steps])``: ``n_steps`` updates in ONE
        device program (lax.scan over the batch stack) — removes per-step
        host round trips; use when the loop body has no per-step hooks."""
        optimizer = self.optimizer

        def chunk(params, opt_state, states, xs):
            def body(carry, x):
                params, opt_state = carry
                loss_val, grads = jax.value_and_grad(self.loss)(
                    params, states, x
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return (params, opt_state), loss_val

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), xs
            )
            return params, opt_state, losses

        return jax.jit(chunk)

    # -- loop -------------------------------------------------------------

    def fit(
        self,
        params,
        data_list: Sequence[jax.Array],
        states: Optional[Sequence[jax.Array]] = None,
        eval_fn: Optional[Callable] = None,
        checkpoint_fn: Optional[Callable] = None,
        verbose: bool = True,
    ) -> Tuple[dict, TrainingStats]:
        """Cycle batches like the reference ``Optimizer.optimize``
        (``optimizer.py:62-142``): per-step gradient update, optional
        eval/checkpoint hooks, tol-based convergence."""
        cfg = self.config
        if states is None:
            states = basis_states(self.graph, dtype=self.dtype)
        opt_state = self.optimizer.init(params)
        stats = TrainingStats()
        prev_loss = None
        t0 = time.time()
        for step_idx in range(cfg.max_steps):
            x = data_list[step_idx % len(data_list)]
            params, opt_state, loss_val = self._train_step(
                params, opt_state, states, x
            )
            loss_f = float(loss_val)
            stats.losses.append(loss_f)
            stats.steps = step_idx + 1
            if verbose and cfg.log_every and step_idx % cfg.log_every == 0:
                print(f"step {step_idx}: loss={loss_f:.6f}")
            if eval_fn and cfg.eval_every and step_idx % cfg.eval_every == 0:
                eval_fn(params, step_idx)
            if (
                checkpoint_fn
                and cfg.save_every
                and step_idx
                and step_idx % cfg.save_every == 0
            ):
                checkpoint_fn(params, step_idx)
            if cfg.tol and prev_loss is not None and abs(loss_f - prev_loss) < cfg.tol:
                stats.converged = True
                break
            prev_loss = loss_f
        stats.wall_time = time.time() - t0
        return params, stats
