"""Autoregressive sampling via numerical inverse-CDF.

Rebuild of ``EngineSiamese.sample`` (``tneq_qc/core/engine_siamese.py:740-915``):
per qubit, evaluate the (unnormalized) density on a grid with
- the current qubit carrying grid measurement operators,
- already-sampled qubits carrying their sampled-value operators,
- future qubits carrying identity (traced out),
then invert the empirical CDF with linear interpolation and refresh the
persistent operator for the sampled qubit.

TPU-first: ONE jitted step serves every qubit (the qubit index is a traced
scalar selecting grid/persistent/identity per slot with ``jnp.where``), so
the whole sampler compiles once; the S×G grid batch rides the MXU.

Note: the reference squares the Born probability a second time before the
CDF (``abs_square`` applied to an already-squared value,
``engine_siamese.py:343-349`` + ``:858``), i.e. samples from P².
``density_power=2`` reproduces that; the default 1 samples from P.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph
from ..ops.contract import abs_square, make_siamese_fn
from ..ops.features import measurement_matrices

__all__ = ["sample"]


def sample(
    graph: CircuitGraph,
    params,
    states: Sequence[jax.Array],
    num_samples: int,
    K: int,
    key: jax.Array,
    bounds: Tuple[float, float] = (-5.0, 5.0),
    grid_size: int = 200,
    density_power: int = 1,
    dtype=jnp.complex64,
) -> jax.Array:
    """Draw ``(num_samples, nqubits)`` continuous samples from the model."""
    nq = graph.nqubits
    if any(r != K for r in graph.output_ranks):
        raise ValueError(
            f"K={K} must equal every qubit's output rank {graph.output_ranks}"
        )
    S, G = num_samples, grid_size
    grid_x = np.linspace(bounds[0], bounds[1], G, dtype=np.float32)

    # grid measurement operators, shared across qubits: [G, K, K]
    mx_grid = measurement_matrices(jnp.asarray(grid_x)[:, None], K)[:, 0]
    mx_grid = mx_grid.astype(dtype)

    ident = np.broadcast_to(np.eye(K, dtype=np.dtype(dtype)), (S, K, K))

    siamese = make_siamese_fn(
        graph, with_states=True, states_batched=False, measure_extra_dims=1
    )

    # params/states must be ARGUMENTS (not closure captures): captured
    # device arrays fail jit lowering on the axon TPU backend (CLAUDE.md)
    @partial(jax.jit, static_argnames=())
    def step(params, states, q, persistent, subkey, mx_grid, grid_x_d):
        # assemble per-qubit (S, G, K, K) operators
        grid_b = jnp.broadcast_to(mx_grid[None], (S, G, K, K))
        measures = []
        for i in range(nq):
            past = jnp.broadcast_to(persistent[i][:, None], (S, G, K, K))
            future = jnp.broadcast_to(
                jnp.asarray(ident)[:, None], (S, G, K, K)
            )
            m = jnp.where(i == q, grid_b, jnp.where(i < q, past, future))
            measures.append(m.reshape(S * G, K, K))
        raw = siamese(params, states, measures)
        dens = abs_square(raw) if jnp.iscomplexobj(raw) else raw
        if density_power == 2:
            dens = dens * dens
        dens = jnp.clip(dens.reshape(S, G), min=0.0)
        cdf = jnp.cumsum(dens, axis=1)
        cdf = cdf / (cdf[:, -1:] + 1e-10)
        u = jax.random.uniform(subkey, (S, 1), jnp.float32)
        idx = jnp.sum((cdf < u).astype(jnp.int32), axis=1)
        idx = jnp.clip(idx, max=G - 2)[:, None]
        cdf_l = jnp.take_along_axis(cdf, idx, axis=1)
        cdf_r = jnp.take_along_axis(cdf, idx + 1, axis=1)
        x_l = grid_x_d[idx[:, 0]][:, None]
        x_r = grid_x_d[idx[:, 0] + 1][:, None]
        frac = (u - cdf_l) / (cdf_r - cdf_l + 1e-10)
        y = x_l + frac * (x_r - x_l)  # (S, 1)
        mx_y = measurement_matrices(y, K)[:, 0].astype(dtype)  # (S, K, K)
        persistent = persistent.at[q].set(mx_y)
        return y[:, 0], persistent

    persistent = jnp.asarray(
        np.broadcast_to(
            np.eye(K, dtype=np.dtype(dtype)), (nq, S, K, K)
        ).copy()
    )
    samples = np.zeros((S, nq), np.float32)
    grid_x_d = jnp.asarray(grid_x)
    states_t = tuple(jnp.asarray(s) for s in states)
    for q in range(nq):
        key, subkey = jax.random.split(key)
        y, persistent = step(
            params, states_t, q, persistent, subkey, mx_grid, grid_x_d
        )
        samples[:, q] = np.asarray(y)
    return jnp.asarray(samples)
