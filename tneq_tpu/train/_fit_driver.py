"""Shared fit-loop drivers for the masked fidelity fits.

One implementation of the execution scopes used by BOTH fit factories
(``train/fit.py`` dense fidelity, ``train/network_fit.py`` log-space
network fidelity) — previously two near-verbatim copies (code-review r3):

- ``fit_while``: the whole loop as ONE traced ``lax.while_loop`` with
  early exit (call under jit);
- ``fit_chunked``: host loop over a jitted K-step ``lax.scan`` — bounded
  program size (whole-fit programs crash the axon tunnel's TPU worker)
  and K steps per device round-trip;
- ``fit_host``: host-driven per-step dispatch, ``sync_every`` async
  dispatches per exit-check fetch so steps pipeline over a remote device;
- ``batched``: vmapped lockstep lanes over mask rows (any scope's
  ``fit.batched``), host early-exit when every lane converges.

Parameterized by a single ``step(params, opt_state, mask, *shared) ->
(params, opt_state, metric)`` and a ``running(metric) -> bool`` predicate
(elementwise True while NOT converged; must work traced and on host
numpy), so the two fits share the drivers verbatim — the metric is 1-F
for the dense fit and -log F for the network fit.

Chunked/batched loops dispatch FULL-k chunks only (``max_steps`` rounds
UP to chunk granularity): a partial tail chunk would compile a SECOND
whole fit program just for the last dispatch — minutes of remote compile
(and compiler-OOM risk) on the tunnel.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import coop

__all__ = ["FitDrivers"]


class FitDrivers:
    """See module docstring.  All public methods return
    ``(params, opt_state, steps, metric)``; callers wrap the metric into
    their own FitResult semantics."""

    def __init__(
        self,
        step: Callable,
        optimizer,
        max_steps: int,
        sync_every: int,
        running: Callable,
        init_metric: float,
        matmul_precision: str = "highest",
    ):
        self.step = step
        self.optimizer = optimizer
        self.max_steps = int(max_steps)
        self.sync_every = max(1, int(sync_every))
        self.running = running
        self.init_metric = float(init_metric)
        self.matmul_precision = matmul_precision
        self._chunk_jit: dict = {}
        self._batched_jit: dict = {}

    # -- program builders -------------------------------------------------
    def _chunk_body(self, k: int):
        """Unjitted k-step scan: the amortization unit for the 'chunk'
        host loop and the vmapped batched driver.  Default precision:
        'highest' = full f32 matmuls (the TPU's fast single-pass-bf16
        default stalls Stiefel convergence near bf16 noise for the
        small-core flagship); big-bond MPS experiments override it ('high'
        = 3-pass bf16x3, ~f32 accuracy at MXU pace — bench/mps_flagship)."""
        step = self.step

        def chunk(params, opt_state, mask, *shared):
            with jax.default_matmul_precision(self.matmul_precision):
                def body(carry, _):
                    p, o = carry
                    p, o, m = step(p, o, mask, *shared)
                    return (p, o), m

                (params, opt_state), ms = jax.lax.scan(
                    body, (params, opt_state), None, length=k
                )
                return params, opt_state, ms[-1]

        return chunk

    def chunk(self, k: int):
        """Jitted k-step chunk (cached per k)."""
        if k not in self._chunk_jit:
            self._chunk_jit[k] = jax.jit(self._chunk_body(k))
        return self._chunk_jit[k]

    def batched_chunk(self, k: int, n_shared: int):
        """Jitted vmapped k-step chunk: params/opt_state/mask batched over
        lanes, the ``n_shared`` trailing args shared."""
        key = (k, n_shared)
        if key not in self._batched_jit:
            self._batched_jit[key] = jax.jit(
                jax.vmap(
                    self._chunk_body(k),
                    in_axes=(0, 0, 0) + (None,) * n_shared,
                )
            )
        return self._batched_jit[key]

    # -- drivers ----------------------------------------------------------
    def fit_while(self, params, mask, *shared):
        """Whole fit as one traced ``lax.while_loop`` (call under jit,
        inside a ``default_matmul_precision('highest')`` context)."""
        opt_state = self.optimizer.init(params)
        step, running = self.step, self.running

        def cond(carry):
            _, _, s, m = carry
            return jnp.logical_and(s < self.max_steps, running(m))

        def body(carry):
            p, o, s, _ = carry
            p, o, m = step(p, o, mask, *shared)
            return (p, o, s + 1, m)

        params, opt_state, steps, metric = jax.lax.while_loop(
            cond,
            body,
            (params, opt_state, jnp.zeros((), jnp.int32),
             jnp.full((), self.init_metric)),
        )
        # the reported metric is the one that triggered the exit (measured
        # before the final update) — the reference's convergence check also
        # uses the pre-step fidelity and then still applies opt.step()
        # (symmetry_breaking_quantum.py:157-171)
        return params, opt_state, steps, metric

    def fit_chunked(self, params, mask, *shared):
        """Host loop over jitted full-k chunks (max_steps rounds UP)."""
        opt_state = self.optimizer.init(params)
        k = self.sync_every
        metric = jnp.full((), self.init_metric)
        steps = 0
        while steps < self.max_steps and bool(
            self.running(np.asarray(metric))
        ):
            coop.poll()  # mid-run bench-priority yield point (utils/coop)
            params, opt_state, metric = self.chunk(k)(
                params, opt_state, mask, *shared
            )
            steps += k
        return params, opt_state, steps, metric

    def fit_host(self, params, mask, *shared):
        """Per-step dispatch; the exit check fetches the metric (a device
        round-trip), so ``sync_every`` steps dispatch async per fetch."""
        opt_state = self.optimizer.init(params)
        one = self.chunk(1)
        metric = jnp.full((), self.init_metric)
        steps = 0
        k = self.sync_every
        while steps < self.max_steps and bool(
            self.running(np.asarray(metric))
        ):
            coop.poll()
            for _ in range(min(k, self.max_steps - steps)):
                params, opt_state, metric = one(
                    params, opt_state, mask, *shared
                )
                steps += 1
        return params, opt_state, steps, metric

    def batched(self, params, masks, *shared, chunk_steps: int = 0):
        """Vmapped lockstep lanes over mask rows from one start: a k-step
        vmapped chunk per dispatch, host early-exit when EVERY lane
        converges.  Semantics match ``vmap(fit)`` of the while_loop form
        (lanes run until the slowest converges) with a bounded program —
        whole-fit while_loop programs crash the axon TPU worker, and
        ``vmap`` of the host-driven fits is impossible (ADVICE r2)."""
        b = int(masks.shape[0])
        k = int(chunk_steps) if chunk_steps else self.sync_every
        params_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (b,) + a.shape), params
        )
        opt_state = self.optimizer.init(params)
        opt_state_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (b,) + a.shape), opt_state
        )
        metric_b = jnp.full((b,), self.init_metric)
        steps = 0
        bc = self.batched_chunk(k, len(shared))
        while steps < self.max_steps and bool(
            np.asarray(self.running(np.asarray(metric_b))).any()
        ):
            coop.poll()
            params_b, opt_state_b, metric_b = bc(
                params_b, opt_state_b, masks, *shared
            )
            steps += k
        return params_b, opt_state_b, steps, metric_b
