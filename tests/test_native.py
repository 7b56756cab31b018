"""Native C++ pathfinder tests: correctness vs numpy einsum, cost model."""

import numpy as np
import pytest

from tneq_tpu.native import find_path, native_available, path_cost
from tneq_tpu.native.path import parse_equation

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable (no g++?)"
)


class TestPathfinder:
    def test_parse_equation(self):
        ops, sizes, out = parse_equation("ij,jk->ik", [(2, 3), (3, 4)])
        assert ops == [[0, 1], [1, 2]]
        assert sizes == [2.0, 3.0, 4.0]
        assert out == [0, 2]

    def test_parse_mismatch_raises(self):
        with pytest.raises(ValueError):
            parse_equation("ij,jk->ik", [(2, 3), (5, 4)])

    def test_path_valid_and_correct_chain(self):
        eq = "ab,bc,cd,de->ae"
        shapes = [(2, 3), (3, 4), (4, 5), (5, 6)]
        path = find_path(eq, shapes)
        assert path is not None and len(path) == 3
        rng = np.random.default_rng(0)
        arrs = [rng.normal(size=s) for s in shapes]
        got = np.einsum(eq, *arrs, optimize=['einsum_path'] + path)
        expect = np.einsum(eq, *arrs, optimize=True)
        np.testing.assert_allclose(got, expect, rtol=1e-10)

    def test_path_correct_on_siamese_network(self):
        """The real workload: a brick-wall siamese equation."""
        import jax, jax.numpy as jnp
        from tneq_tpu.graph import parse_graph, wall_graph
        from tneq_tpu.model.qctn import init_params
        from tneq_tpu.ops.einsum_spec import siamese_spec

        g = parse_graph(wall_graph(4, layers=4, dim=2))
        spec = siamese_spec(g, with_states=True, states_batched=False)
        params = init_params(g, jax.random.PRNGKey(0), jnp.float32)
        B, K = 3, 2
        rng = np.random.default_rng(1)
        states = [rng.normal(size=(2,)).astype(np.float32) for _ in range(4)]
        measures = [rng.normal(size=(B, K, K)).astype(np.float32) for _ in range(4)]
        arrs = []
        for kind, key in spec.operands:
            if kind == "core":
                arrs.append(np.asarray(params[key]))
            elif kind == "core_conj":
                arrs.append(np.asarray(params[key]))
            elif kind in ("state", "state_conj"):
                arrs.append(states[key])
            else:
                arrs.append(measures[key])
        shapes = [a.shape for a in arrs]
        path = find_path(spec.equation, shapes)
        assert path is not None and len(path) == len(arrs) - 1
        got = np.einsum(spec.equation, *arrs, optimize=['einsum_path'] + path)
        expect = np.einsum(spec.equation, *arrs, optimize="greedy")
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_outer_product_network(self):
        eq = "a,b->ab"
        path = find_path(eq, [(3,), (4,)])
        a, b = np.arange(3.0), np.arange(4.0)
        got = np.einsum(eq, a, b, optimize=['einsum_path'] + path)
        np.testing.assert_allclose(got, np.outer(a, b))

    def test_repeated_pair_contact(self):
        eq = "ab,ab->"
        path = find_path(eq, [(2, 3), (2, 3)])
        x = np.ones((2, 3))
        assert np.einsum(eq, x, x, optimize=['einsum_path'] + path) == 6.0

    def test_cost_model_orders_structures(self):
        """A chain contraction should cost less than a dense all-to-all."""
        chain = path_cost("ab,bc,cd->ad", [(8, 8)] * 3)
        dense = path_cost("abc,abd,acd,bcd->", [(8, 8, 8)] * 4)
        assert chain is not None and dense is not None
        assert chain < dense

    def test_integration_with_contract(self):
        """Large-network contraction goes through the native path and
        matches the small-network (opt_einsum) result."""
        import jax, jax.numpy as jnp
        from tneq_tpu.graph import parse_graph, wall_graph
        from tneq_tpu.model.qctn import init_params
        from tneq_tpu.ops import contract_cores
        from tneq_tpu.ops import contract as contract_mod

        g = parse_graph(wall_graph(4, layers=4, dim=2))  # 6 cores < threshold
        params = init_params(g, jax.random.PRNGKey(2), jnp.float32)
        t_default = np.asarray(contract_cores(g, params))
        old = contract_mod._NATIVE_PATH_MIN_OPERANDS
        try:
            contract_mod._NATIVE_PATH_MIN_OPERANDS = 1  # force native path
            contract_mod._cached_native_path.cache_clear()
            t_native = np.asarray(contract_cores(g, params))
        finally:
            contract_mod._NATIVE_PATH_MIN_OPERANDS = old
        np.testing.assert_allclose(t_native, t_default, rtol=1e-4, atol=1e-6)


class TestDPPath:
    def test_dp_correct_on_chain(self):
        eq = "ab,bc,cd,de,ef->af"
        shapes = [(2, 8), (8, 2), (2, 8), (8, 2), (2, 8)]
        path = find_path(eq, shapes, method="dp")
        assert path is not None and len(path) == 4
        rng = np.random.default_rng(0)
        arrs = [rng.normal(size=s) for s in shapes]
        got = np.einsum(eq, *arrs, optimize=['einsum_path'] + path)
        expect = np.einsum(eq, *arrs, optimize=True)
        np.testing.assert_allclose(got, expect, rtol=1e-10)

    def test_dp_no_worse_than_greedy(self):
        """DP path cost <= greedy path cost on a siamese network."""
        import jax, jax.numpy as jnp
        from tneq_tpu.graph import parse_graph, mps_graph
        from tneq_tpu.ops.einsum_spec import siamese_spec

        g = parse_graph(mps_graph(4, dim=3))
        spec = siamese_spec(g, with_states=True, states_batched=False)
        shapes = []
        for kind, key in spec.operands:
            if kind in ("core", "core_conj"):
                shapes.append(g.shapes[key])
            elif kind in ("state", "state_conj"):
                shapes.append((g.input_ranks[key],))
            else:
                shapes.append((8, 3, 3))

        def path_flops(path):
            import opt_einsum as oe
            _, info = oe.contract_path(
                spec.equation, *shapes, shapes=True,
                optimize=path,
            )
            return info.opt_cost

        p_dp = find_path(spec.equation, shapes, method="dp")
        p_gr = find_path(spec.equation, shapes, method="greedy")
        assert p_dp is not None and p_gr is not None
        assert path_flops(p_dp) <= path_flops(p_gr)

    def test_dp_matches_optimal_small(self):
        """On a tiny network DP must equal opt_einsum's optimal cost."""
        import opt_einsum as oe

        eq = "ab,bc,cd->ad"
        shapes = [(50, 2), (2, 50), (50, 3)]
        p_dp = find_path(eq, shapes, method="dp")
        _, info_dp = oe.contract_path(eq, *shapes, shapes=True, optimize=p_dp)
        _, info_opt = oe.contract_path(eq, *shapes, shapes=True,
                                       optimize="optimal")
        assert info_dp.opt_cost == info_opt.opt_cost

    def test_auto_dispatch(self):
        # small -> dp, huge -> greedy; both valid
        eq = "ab,bc->ac"
        assert find_path(eq, [(2, 2), (2, 2)], method="auto") is not None
