"""Autoregressive sampling via numerical inverse-CDF.

Rebuild of ``EngineSiamese.sample`` (``tneq_qc/core/engine_siamese.py:740-915``):
per qubit, evaluate the (unnormalized) density on a grid, invert the
empirical CDF with linear interpolation, and refresh the persistent
measurement operator for the sampled qubit.

TPU-first and memory-bounded: per qubit the siamese network is contracted
ONCE with the current qubit's measurement legs left open — giving an
environment ``E[s, k, l]`` — and the density at every grid point is then the
tiny inner product ``E[s,k,l]·Mx_grid[g,k,l]`` (the siamese value is linear
in each measurement operand).  The reference instead re-contracts the full
network for every grid point as an S·G batch
(``engine_siamese.py:799-847``), which at its default ``grid_size=1000``
materializes tens of GB of per-qubit operator stacks at 32 qubits; here the
largest live tensor is the ``[S, G]`` density matrix (VERDICT r1 weak #4 /
next #10).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.dsl import CircuitGraph
from ..ops.contract import abs_square, make_siamese_env_fn
from ..ops.features import measurement_matrices

__all__ = ["sample"]


@functools.lru_cache(maxsize=512)
def _env_step_program(graph: CircuitGraph, q: int, rescale: bool, S: int,
                      G: int, K: int, density_power: int, dtype_name: str):
    """Jitted per-qubit env+draw program, cached by (graph, qubit, static
    config) so repeated ``sample()`` calls reuse compiled programs instead
    of re-jitting every qubit's whole-network contraction each call.

    params/states ride through as ARGUMENTS (not closure captures):
    captured device arrays fail jit lowering on the axon TPU backend
    (CLAUDE.md channel protocol)."""
    env_fn = make_siamese_env_fn(graph, q, rescale=rescale)
    dtype = jnp.dtype(dtype_name)
    nq = graph.nqubits

    @jax.jit
    def step(params, states, persistent, subkey, mx_grid, grid_x_d):
        measures = [persistent[i] for i in range(nq)]  # open slot unused
        env = env_fn(params, states, measures)  # [S, K, K] ([K, K] if nq==1)
        if rescale:
            env, _ = env  # scale cancels in the per-sample CDF normalization
        if env.ndim == 2:
            env = jnp.broadcast_to(env[None], (S,) + env.shape)
        v = jnp.einsum("skl,gkl->sg", env, mx_grid)
        dens = abs_square(v) if jnp.iscomplexobj(v) else v
        if density_power == 2:
            dens = dens * dens
        dens = jnp.clip(dens, min=0.0)
        cdf = jnp.cumsum(dens, axis=1)
        cdf = cdf / (cdf[:, -1:] + 1e-10)
        u = jax.random.uniform(subkey, (S, 1), jnp.float32)
        idx = jnp.sum((cdf < u).astype(jnp.int32), axis=1)
        idx = jnp.clip(idx, max=G - 2)[:, None]
        cdf_l = jnp.take_along_axis(cdf, idx, axis=1)
        cdf_r = jnp.take_along_axis(cdf, idx + 1, axis=1)
        x_l = grid_x_d[idx[:, 0]][:, None]
        x_r = grid_x_d[idx[:, 0] + 1][:, None]
        # clip: a zero-density (flat-CDF) bin makes the raw ratio unbounded
        frac = jnp.clip((u - cdf_l) / (cdf_r - cdf_l + 1e-10), 0.0, 1.0)
        y = x_l + frac * (x_r - x_l)  # (S, 1)
        return y[:, 0], measurement_matrices(y, K)[:, 0].astype(dtype)

    return step


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
    rescale=None,
    chain=None,
    fused: bool = True,
) -> jax.Array:
    """Draw ``(num_samples, nqubits)`` continuous samples from the model.

    ``density_power=2`` reproduces the reference's double Born square
    (``engine_siamese.py:343-349`` + ``:858``, i.e. sampling from P²);
    the default 1 samples from P.

    ``rescale``: execute the per-qubit environment through the per-step
    rescaled pairwise executor — float32-safe at 30+ qubits, where the
    dense contraction under/overflows (the per-qubit CDF is
    scale-invariant, so the log-scale cancels in the normalization).
    ``None`` = auto (on from 16 qubits).

    MPS chains dispatch to the O(1)-compile left-to-right sweep sampler
    (``infer/chain_sampling.py``: a handful of compiled programs instead
    of one whole-network env program per qubit) — pass ``chain=False``
    to force the generic path, ``chain=True`` to require the sweep
    sampler (raises if the graph is not a canonical MPS chain).

    ``fused`` (uniform chains only): run the whole sweep as ONE compiled
    program — one device round-trip per `sample` call instead of one per
    qubit.  ``fused=False`` keeps the per-site dispatch, whose draws are
    bit-identical to this generic sampler (see ``chain_sampling``).
    """
    nq = graph.nqubits
    if any(r != K for r in graph.output_ranks):
        raise ValueError(
            f"K={K} must equal every qubit's output rank {graph.output_ranks}"
        )
    if chain is None or chain:
        from .chain_sampling import chain_sample, supports_chain_sampling

        supported = supports_chain_sampling(graph)
        if chain and not supported:
            raise ValueError(
                "chain=True requires a canonical MPS-chain graph "
                "(ops.mps_sweep.is_mps_chain layout)"
            )
        if supported:
            return chain_sample(
                graph, params, states, num_samples, K, key,
                bounds=bounds, grid_size=grid_size,
                density_power=density_power, dtype=dtype, fused=fused,
            )
    if rescale is None:
        rescale = nq >= 16
    S, G = num_samples, grid_size
    grid_x = np.linspace(bounds[0], bounds[1], G, dtype=np.float32)

    # grid measurement operators, shared across qubits and samples: [G, K, K]
    mx_grid = measurement_matrices(jnp.asarray(grid_x)[:, None], K)[:, 0]
    mx_grid = mx_grid.astype(dtype)

    # one jitted program per qubit (the open-leg position changes the
    # equation); each compiles a single S-batch siamese contraction.
    # Cached at module level — building them here would recompile every
    # qubit's whole-network env program on EVERY sample() call.
    steps = [
        _env_step_program(graph, q, bool(rescale), S, G, K,
                          density_power, jnp.dtype(dtype).name)
        for q in range(nq)
    ]

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
        y, mx_y = steps[q](
            params, states_t, persistent, subkey, mx_grid, grid_x_d
        )
        persistent = persistent.at[q].set(mx_y)
        samples[:, q] = np.asarray(y)
    return jnp.asarray(samples)
