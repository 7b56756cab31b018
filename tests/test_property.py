"""Property tests: siamese contraction vs dense ground truth on RANDOM
topologies (not just the MPS/brick-wall families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.graph import parse_graph, random_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.ops.contract import make_siamese_fn, make_with_inputs_fn


def dense_born(psi: np.ndarray, measures, batch: int) -> np.ndarray:
    """Σ ψ[k]·(⊗M_q)[k,l]·conj(ψ)[l] — M's first index pairs with the ket,
    matching the siamese equation (and the reference's middle-block layout,
    einsum_strategy.py:516: batch + ket-out symbol + bra symbol)."""
    out = np.empty(batch, dtype=np.complex128)
    nq = psi.ndim
    for b in range(batch):
        m = np.conj(psi).astype(np.complex128)
        for q in range(nq):
            mq = np.asarray(measures[q][b], dtype=np.complex128)
            m = np.moveaxis(
                np.tensordot(mq, m, axes=([1], [q])), 0, q
            )
        out[b] = np.tensordot(psi.astype(np.complex128), m, axes=nq)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_siamese_matches_dense_on_random_graph(seed):
    rng = np.random.default_rng(seed)
    src = random_graph(4, 3, rng=rng, min_rank=2, max_rank=3)
    g = parse_graph(src)
    params = init_params(g, jax.random.PRNGKey(seed), jnp.complex64)

    states = [
        jnp.asarray(
            (rng.normal(size=r) + 1j * rng.normal(size=r)).astype(np.complex64)
        )
        for r in g.input_ranks
    ]
    B = 2
    measures = [
        jnp.asarray(
            (rng.normal(size=(B, r, r)) + 1j * rng.normal(size=(B, r, r)))
            .astype(np.complex64)
        )
        for r in g.output_ranks
    ]

    got = np.asarray(make_siamese_fn(g)(params, states, measures))

    psi = np.asarray(
        make_with_inputs_fn(g, batched=False)(params, states)
    )
    expect = dense_born(psi, [np.asarray(m) for m in measures], B)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_scaled_matches_plain_on_random_graph(seed):
    from tneq_tpu.ops.scaling import scaled_siamese_fn

    rng = np.random.default_rng(seed)
    g = parse_graph(random_graph(3, 3, rng=rng, min_rank=2, max_rank=4))
    params = init_params(g, jax.random.PRNGKey(seed), jnp.complex64)
    states = [
        jnp.asarray(rng.normal(size=r).astype(np.float32)).astype(jnp.complex64)
        for r in g.input_ranks
    ]
    measures = [
        jnp.asarray(rng.normal(size=(2, r, r)).astype(np.float32)).astype(
            jnp.complex64
        )
        for r in g.output_ranks
    ]
    plain = np.asarray(make_siamese_fn(g)(params, states, measures))
    raw, ls = scaled_siamese_fn(g)(params, states, measures)
    got = np.asarray(raw) * np.exp(float(ls))
    np.testing.assert_allclose(got, plain, rtol=1e-3, atol=1e-6)
