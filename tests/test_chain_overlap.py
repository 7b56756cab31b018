"""Fused MPS-chain overlap (ops/chain_overlap.py): M-form + Pallas sweep.

Parity targets: the einsum-form rescaled scan in train/network_fit.py
(values AND gradients — the fused path must train, not just evaluate).
Pallas kernels run in interpreter mode on the CPU test mesh.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tneq_tpu.graph import mps_graph, parse_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.ops.chain_overlap import (
    chain_pair_to_mv,
    fused_chain_log_overlap,
    fused_chain_supported,
    mv_chain_log_overlap,
    mv_chain_log_overlap_pallas,
)
from tneq_tpu.train.network_fit import (
    _chain_cores,
    _chain_log_overlap,
    _normalize,
    network_log_fidelity,
)


def _chains(n, dim, seed=0, dtype=jnp.float32):
    g = parse_graph(mps_graph(n, dim=dim))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    p = _normalize(init_params(g, k1, dtype))
    t = _normalize(init_params(g, k2, dtype))
    return g, _chain_cores(g, p), _chain_cores(g, t)


class TestMForm:
    def test_matches_einsum_scan(self):
        _, pc, tc = _chains(6, 3)
        ref = _chain_log_overlap(pc, tc)
        got = mv_chain_log_overlap(*chain_pair_to_mv(pc, tc))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_matches_einsum_scan_selfoverlap(self):
        _, pc, _ = _chains(8, 4, seed=3)
        ref = _chain_log_overlap(pc, pc)
        got = mv_chain_log_overlap(*chain_pair_to_mv(pc, pc))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_two_qubit_no_mids(self):
        _, pc, tc = _chains(2, 3)
        ref = _chain_log_overlap(pc, tc)
        got = mv_chain_log_overlap(*chain_pair_to_mv(pc, tc))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_gradients_match(self):
        _, pc, tc = _chains(6, 3)

        def loss_ref(mids):
            return _chain_log_overlap((pc[0], mids, pc[2]), tc)

        def loss_mv(mids):
            return mv_chain_log_overlap(
                *chain_pair_to_mv((pc[0], mids, pc[2]), tc)
            )

        g_ref = jax.grad(loss_ref)(pc[1])
        g_mv = jax.grad(loss_mv)(pc[1])
        np.testing.assert_allclose(g_mv, g_ref, rtol=2e-4, atol=1e-6)

    def test_complex_supported_by_mv(self):
        _, pc, tc = _chains(5, 3, dtype=jnp.complex64)
        ref = _chain_log_overlap(pc, tc)
        got = mv_chain_log_overlap(*chain_pair_to_mv(pc, tc))
        np.testing.assert_allclose(got, ref, rtol=1e-5)


class TestPallasSweep:
    """Interpret-mode kernel parity (bond 16 -> S=256, the headline shape)."""

    def test_value_matches(self):
        _, pc, tc = _chains(5, 16)
        v0, M, w = chain_pair_to_mv(pc, tc)
        ref = mv_chain_log_overlap(v0, M, w)
        got = mv_chain_log_overlap_pallas(v0, M, w, interpret=True)
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_gradients_match(self):
        _, pc, tc = _chains(5, 16)

        def loss_ref(mids):
            return mv_chain_log_overlap(
                *chain_pair_to_mv((pc[0], mids, pc[2]), tc)
            )

        def loss_pl(mids):
            return mv_chain_log_overlap_pallas(
                *chain_pair_to_mv((pc[0], mids, pc[2]), tc), interpret=True
            )

        v_ref, g_ref = jax.value_and_grad(loss_ref)(pc[1])
        v_pl, g_pl = jax.value_and_grad(loss_pl)(pc[1])
        np.testing.assert_allclose(v_pl, v_ref, rtol=1e-5)
        np.testing.assert_allclose(g_pl, g_ref, rtol=2e-4, atol=1e-6)

    def test_gradients_match_all_slots(self):
        """Boundary cores and the bra side get cotangents too (oo-style
        self-overlap doubles the parameter's appearances)."""
        _, pc, _ = _chains(4, 16, seed=5)

        def loss_ref(triple):
            return mv_chain_log_overlap(*chain_pair_to_mv(triple, triple))

        def loss_pl(triple):
            return mv_chain_log_overlap_pallas(
                *chain_pair_to_mv(triple, triple), interpret=True
            )

        g_ref = jax.grad(loss_ref)(pc)
        g_pl = jax.grad(loss_pl)(pc)
        for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)

    def test_jit_and_scan_embeddable(self):
        """The fused overlap compiles inside jit (fit-loop embedding)."""
        _, pc, tc = _chains(4, 16)

        @jax.jit
        def f(mids):
            return mv_chain_log_overlap_pallas(
                *chain_pair_to_mv((pc[0], mids, pc[2]), tc), interpret=True
            )

        ref = mv_chain_log_overlap(*chain_pair_to_mv(pc, tc))
        np.testing.assert_allclose(f(pc[1]), ref, rtol=1e-5)


class TestDispatch:
    def test_supported_gates(self):
        _, pc, tc = _chains(5, 16)
        assert fused_chain_supported(pc, use_pallas=True)
        # S = 9 is not a lane multiple
        _, pc3, _ = _chains(5, 3)
        assert not fused_chain_supported(pc3, use_pallas=True)
        # complex is XLA-only
        _, pcc, _ = _chains(5, 16, dtype=jnp.complex64)
        assert not fused_chain_supported(pcc, use_pallas=True)
        # no mids
        _, pc2, _ = _chains(2, 16)
        assert not fused_chain_supported(pc2, use_pallas=True)

    def test_env_force_off(self, monkeypatch):
        monkeypatch.setenv("TNEQ_CHAIN_PALLAS", "0")
        _, pc, _ = _chains(5, 16)
        assert not fused_chain_supported(pc)

    def test_network_log_fidelity_fused_parity(self, monkeypatch):
        """TNEQ_CHAIN_PALLAS=1 routes network_log_fidelity through the
        fused path; result matches the default XLA scan."""
        g = parse_graph(mps_graph(6, dim=16))
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        p = init_params(g, k1, jnp.float32)
        t = init_params(g, k2, jnp.float32)
        ref = network_log_fidelity(g, p, t)
        monkeypatch.setenv("TNEQ_CHAIN_PALLAS", "1")
        got = network_log_fidelity(g, p, t)
        np.testing.assert_allclose(got, ref, rtol=1e-4)

        ref_g = jax.grad(
            lambda p: -network_log_fidelity(g, p, t)
        )(p)
        monkeypatch.setenv("TNEQ_CHAIN_PALLAS", "")
        monkeypatch.setenv("TNEQ_CHAIN_PALLAS", "1")
        got_g = jax.grad(
            lambda p: -network_log_fidelity(g, p, t)
        )(p)
        for n in ref_g:
            np.testing.assert_allclose(
                got_g[n], ref_g[n], rtol=5e-4, atol=1e-6
            )


class TestLargeN:
    def test_32q_finite(self):
        """The headline scale: finite fused log-overlap at 32 qubits."""
        _, pc, tc = _chains(32, 16)
        v0, M, w = chain_pair_to_mv(pc, tc)
        ref = mv_chain_log_overlap(v0, M, w)
        got = mv_chain_log_overlap_pallas(v0, M, w, interpret=True)
        assert np.isfinite(float(got))
        np.testing.assert_allclose(got, ref, rtol=1e-4)
