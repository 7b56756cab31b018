"""Candidate evaluator: trains a candidate circuit against a goal circuit.

Rebuild of the ``MPI_Agent`` evaluation core (``tneq_qc/distributed/mpi_agent.py:125-290``)
without the message passing: the candidate QCTN is fit to the goal with the
overlap loss ``|⟨goal|candidate⟩ - 1|²`` (the legacy contractor's MSE loss,
``copteinsum.py:560-614``), run as chunked jitted scans so the host can apply
the reference's timeout policy between chunks.

TPU-first: the ``evaluate_repeat`` independent restarts of one candidate are
vmapped into a single compiled program (the reference dispatches each repeat
to a different MPI worker); compiled programs are cached per graph signature
so re-evaluations and copies of a parent cost no recompile.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph, parse_graph
from ..model.qctn import init_params
from ..ops.contract import make_two_network_fn
from ..optim.factory import make_optimizer
from .codes import REASONS

__all__ = ["CandidateEvaluator"]


class CandidateEvaluator:
    def __init__(
        self,
        goal_graph: CircuitGraph,
        goal_params: Dict[str, jax.Array],
        n_iter: int = 10,
        max_iterations: int = 200,
        tol: float = 1e-6,
        timeout: float = 1800.0,
        method: str = "adam",
        learning_rate: float = 1e-2,
        dtype=jnp.float32,
        loss: str = "overlap_mse",
    ):
        """``n_iter``: steps per device chunk (timeout checked between
        chunks, reference ``AgentBehavier.n_iter``);
        ``max_iterations``: total optimization budget per evaluation;
        ``timeout``: hard wall-clock limit per evaluation.

        ``loss``: ``'overlap_mse'`` is the reference agent objective
        ``|⟨goal|cand⟩ − 1|²`` (``copteinsum.py:560-614``) — fine at the
        reference's 3–5 qubits, but float32-degenerate beyond ~24 qubits
        (the raw overlap under/overflows, so every candidate scores the
        same).  ``'log_fidelity'`` is −log F computed from per-step
        rescaled log-overlaps (``ops/pairwise.make_log_abs_two_network_fn``)
        — finite and discriminative at 30+ qubits, the scale-safe mode for
        the BASELINE "genetic search on a 30+-qubit circuit" workload.
        """
        if loss not in ("overlap_mse", "log_fidelity"):
            raise ValueError(f"unknown loss {loss!r}")
        self.goal_graph = goal_graph
        self.goal_params = goal_params
        self.n_iter = n_iter
        self.max_iterations = max_iterations
        self.tol = tol
        self.timeout = timeout
        self.method = method
        self.learning_rate = learning_rate
        self.dtype = dtype
        self.loss = loss
        self._cache: Dict[str, Callable] = {}

    def clone(self, device=None) -> "CandidateEvaluator":
        """Fresh evaluator with the same config and an empty compile cache.

        Used by :class:`~tneq_tpu.genetic.farm.DeviceFarm` to give each
        device worker its own evaluator (the reference forks one
        ``MPI_Agent`` process per rank, ``mpi_agent.py:40-80``).  With
        ``device`` set, the goal weights are committed to that device so
        every chunk launch stays device-local.
        """
        goal_params = self.goal_params
        if device is not None:
            goal_params = jax.device_put(
                {k: np.asarray(v) for k, v in goal_params.items()}, device
            )
        ev = CandidateEvaluator(
            self.goal_graph,
            goal_params,
            n_iter=self.n_iter,
            max_iterations=self.max_iterations,
            tol=self.tol,
            timeout=self.timeout,
            method=self.method,
            learning_rate=self.learning_rate,
            dtype=self.dtype,
            loss=self.loss,
        )
        # Share the jit cache: one trace per topology across all workers
        # (each device still gets its own executable under the same jitted
        # function; the chunk closure captures no device arrays).
        ev._cache = self._cache
        return ev

    def _chunk_fn(self, graph: CircuitGraph) -> Callable:
        """Jitted: run ``n_iter`` optimization steps for a batch of
        independent restarts (vmapped), returning updated state + losses."""
        if graph.signature in self._cache:
            return self._cache[graph.signature]

        optimizer = make_optimizer(self.method, lr=self.learning_rate)

        if self.loss == "log_fidelity":
            from ..ops.pairwise import make_log_abs_two_network_fn

            log_cg = make_log_abs_two_network_fn(graph, self.goal_graph)
            log_cc = make_log_abs_two_network_fn(graph, graph)
            log_gg = make_log_abs_two_network_fn(
                self.goal_graph, self.goal_graph
            )

            def loss_fn(params, goal_params):
                # −log F: scale-invariant, float32-safe at any qubit count
                # (per-step rescaled executors); log_gg is loop-invariant
                # and hoisted out of the scan by XLA
                return -(
                    2.0 * log_cg(params, goal_params)
                    - log_cc(params, params)
                    - log_gg(goal_params, goal_params)
                )

        else:
            overlap_fn = make_two_network_fn(graph, self.goal_graph)

            def loss_fn(params, goal_params):
                out = overlap_fn(params, goal_params)
                d = out - 1.0
                return jnp.real(d) ** 2 + jnp.imag(d) ** 2

        def one_restart(params, opt_state, goal_params):
            def body(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, goal_params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=self.n_iter
            )
            return params, opt_state, losses[-1]

        @jax.jit
        def chunk(params_b, opt_state_b, goal_params):
            return jax.vmap(one_restart, in_axes=(0, 0, None))(
                params_b, opt_state_b, goal_params
            )

        self._cache[graph.signature] = (chunk, optimizer)
        return self._cache[graph.signature]

    def evaluate(
        self,
        graph_string: str,
        key: jax.Array,
        repeats: int = 1,
    ) -> Tuple[np.ndarray, int, int]:
        """Fit ``repeats`` random restarts of the candidate to the goal.

        Returns ``(losses [repeats], iterations, reason)``.
        """
        graph = parse_graph(graph_string)
        if (
            graph.input_ranks != self.goal_graph.input_ranks
            or graph.output_ranks != self.goal_graph.output_ranks
        ):
            raise ValueError(
                "candidate boundary ranks do not match the goal circuit"
            )
        chunk, optimizer = self._chunk_fn(graph)

        keys = jax.random.split(key, repeats)
        params_b = jax.vmap(
            lambda k: init_params(graph, k, self.dtype)
        )(keys)
        opt_state_b = jax.vmap(optimizer.init)(params_b)

        t0 = time.time()
        it = 0
        reason = REASONS.REACH_MAX_ITER
        losses = np.full(repeats, np.inf)
        while it < self.max_iterations:
            params_b, opt_state_b, loss_b = chunk(
                params_b, opt_state_b, self.goal_params
            )
            it += self.n_iter
            losses = np.asarray(loss_b)
            if np.min(losses) < self.tol:
                break
            if time.time() - t0 > self.timeout:
                reason = REASONS.HARD_TIMEOUT
                break
        return losses, it, reason
