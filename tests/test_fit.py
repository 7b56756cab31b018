"""Fidelity-fit and symmetry-breaking experiment tests (small scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.apps.symmetry_breaking import (
    SymmetryBreakingConfig,
    make_experiment,
    symmetry_breaking,
    target_tensor_init,
    validate_target_tensor,
)
from tneq_tpu.graph import incidence_to_graph, parse_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.ops import contract_cores
from tneq_tpu.optim import sgdg
from tneq_tpu.train import identity_cores, make_masked_fidelity_fit


@pytest.fixture(scope="module")
def exp4():
    cfg = SymmetryBreakingConfig(n_qubits=4, n_cells=3, validate_steps=2000,
                                 prune_steps=2000)
    return make_experiment(cfg)


class TestIdentityMasking:
    def test_masked_full_equals_reduced_graph(self, exp4):
        """The central design claim: identity-substituted full network ==
        network with those cores removed from the graph."""
        mask_list = [0, 4, 6, 8]
        key = jax.random.PRNGKey(1)
        params = init_params(exp4.graph, key, jnp.complex64)
        idents = identity_cores(exp4.graph, jnp.complex64)
        mask = exp4.mask_vector(mask_list)
        eff = {
            n: mask[i] * params[n] + (1 - mask[i]) * idents[n]
            for i, n in enumerate(exp4.graph.core_names)
        }
        t_full = np.asarray(contract_cores(exp4.graph, eff, order="qubit"))

        inc = exp4.incidence.copy()
        inc[:, mask_list] = 0
        reduced = parse_graph(incidence_to_graph(inc))
        reduced_params = {n: params[n] for n in reduced.core_names}
        t_red = np.asarray(contract_cores(reduced, reduced_params, order="qubit"))
        np.testing.assert_allclose(t_full, t_red, atol=1e-5)

    def test_identity_cores_shapes(self, exp4):
        idents = identity_cores(exp4.graph)
        for c in exp4.graph.cores:
            assert idents[c.name].shape == c.shape

    def test_identity_cores_nonsquare_raises(self):
        g = parse_graph("-2-A-3-\n-2-A-3-")  # in_dim 4 != out_dim 9
        with pytest.raises(ValueError):
            identity_cores(g)


class TestFidelityFit:
    def test_converges_and_early_exits(self, exp4):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        target = target_tensor_init(exp4, [0, 4, 6, 8], k1)
        ok, fid, steps = validate_target_tensor(exp4, target, k2)
        assert ok, f"fit did not converge: fidelity={fid}"
        assert steps < 2000  # early exit well before the cap

    def test_fit_is_reusable_across_masks(self, exp4):
        """One compiled program serves different mask vectors."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        target = target_tensor_init(exp4, [0, 4], k1)
        params = init_params(exp4.graph, k2, jnp.complex64)
        r_full = exp4.prune_fit(params, exp4.mask_vector([]), target)
        params2 = init_params(exp4.graph, k3, jnp.complex64)
        r_masked = exp4.prune_fit(params2, exp4.mask_vector([0]), target)
        assert np.isfinite(float(r_full.infidelity))
        assert np.isfinite(float(r_masked.infidelity))

    def test_impossible_target_does_not_converge(self, exp4):
        """A random (non-network) dense target should not be fit to 1e-3."""
        rng = np.random.default_rng(3)
        shape = (2,) * (2 * exp4.cfg.n_qubits)
        bad = jnp.asarray(
            rng.normal(size=shape) + 1j * rng.normal(size=shape), jnp.complex64
        )
        params = init_params(exp4.graph, jax.random.PRNGKey(4), jnp.complex64)
        res = exp4.prune_fit(params, exp4.mask_vector([]), bad)
        assert float(res.infidelity) > 1e-3


class TestSymmetryBreaking:
    def test_row_would_empty(self, exp4):
        all_on_row0 = [c for c in range(exp4.graph.ncores)
                       if exp4.incidence[0, c] > 0]
        assert exp4.row_would_empty(all_on_row0)
        assert not exp4.row_would_empty([0])

    def test_small_experiment_prunes_masked_cores(self):
        """On a tiny circuit the pruning loop should recover at least one
        of the target-masked (redundant) cores."""
        cfg = SymmetryBreakingConfig(
            n_qubits=4, n_cells=2, validate_steps=3000, prune_steps=3000,
            max_outer_iterations=1,
        )
        exp = make_experiment(cfg)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        target_mask = [0, 4]
        target = target_tensor_init(exp, target_mask, k1)
        ok, fid, _ = validate_target_tensor(exp, target, k2)
        assert ok
        pruned, attempts = symmetry_breaking(exp, target, k3, verbose=False)
        assert attempts >= 1
        assert len(pruned) >= 1


class TestBatchedSweep:
    def test_batched_recovers_planted_mask(self):
        """The vmapped candidate sweep prunes exactly the target-masked cores."""
        from tneq_tpu.apps.symmetry_breaking import (
            symmetry_breaking_batched,
        )

        cfg = SymmetryBreakingConfig(
            n_qubits=4, n_cells=2, validate_steps=3000, prune_steps=2000,
        )
        exp = make_experiment(cfg)
        key = jax.random.PRNGKey(0)
        ok = False
        for _ in range(6):
            key, k1, k2 = jax.random.split(key, 3)
            target = target_tensor_init(exp, [0, 4], k1)
            ok, fid, _, fitted = validate_target_tensor(
                exp, target, k2, return_params=True
            )
            if ok:
                break
        assert ok
        key, sub = jax.random.split(key)
        pruned, count = symmetry_breaking_batched(
            exp, target, sub, warm_params=fitted, verbose=False
        )
        assert len(pruned) >= 2  # at least the two planted cores' worth


class TestDenseHostLoop:
    def test_step_scope_matches_fit_scope(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tneq_tpu.graph import build_brick_wall_incidence, incidence_to_graph, parse_graph
        from tneq_tpu.model.qctn import init_params
        from tneq_tpu.ops.contract import contract_cores
        from tneq_tpu.optim import sgdg
        from tneq_tpu.train.fit import make_masked_fidelity_fit

        g = parse_graph(incidence_to_graph(build_brick_wall_incidence(4, 2)))
        params = init_params(g, jax.random.PRNGKey(0), jnp.complex64)
        target = contract_cores(
            g, init_params(g, jax.random.PRNGKey(1), jnp.complex64)
        )
        mask = jnp.ones((g.ncores,), jnp.float32)
        results = {}
        for scope in ("fit", "step", "chunk"):
            fit = make_masked_fidelity_fit(
                g, sgdg(0.1, momentum=0.9, stiefel=True),
                max_steps=60, tol=1e-3, jit_scope=scope,
            )
            res = fit(params, mask, target)
            results[scope] = (float(res.infidelity), int(res.steps))
        np.testing.assert_allclose(
            results["fit"][0], results["step"][0], rtol=1e-4, atol=1e-6
        )
        assert results["fit"][1] == results["step"][1]
        # sync_every=1 chunk == one step per dispatch: identical trajectory
        np.testing.assert_allclose(
            results["fit"][0], results["chunk"][0], rtol=1e-4, atol=1e-6
        )
        assert results["fit"][1] == results["chunk"][1]

    def test_chunk_scope_amortizes_and_converges(self):
        from tneq_tpu.graph import (
            build_brick_wall_incidence,
            incidence_to_graph,
            parse_graph,
        )
        from tneq_tpu.model.qctn import init_params
        from tneq_tpu.ops.contract import contract_cores
        from tneq_tpu.train.fit import make_masked_fidelity_fit

        g = parse_graph(incidence_to_graph(build_brick_wall_incidence(4, 2)))
        params = init_params(g, jax.random.PRNGKey(0), jnp.complex64)
        target = contract_cores(g, params)  # exactly representable target
        mask = jnp.ones((g.ncores,), jnp.float32)
        fit = make_masked_fidelity_fit(
            g, sgdg(0.1, momentum=0.9, stiefel=True),
            max_steps=400, tol=1e-3, jit_scope="chunk", sync_every=8,
        )
        res = fit(params, mask, target)
        assert float(res.infidelity) < 1e-3
        assert int(res.steps) % 8 == 0  # chunk granularity

    def test_batched_matches_sequential_host_fit(self):
        """fit.batched with identical mask rows reproduces the unbatched
        trajectory lane-for-lane (chunk_steps=1 == per-step lockstep)."""
        from tneq_tpu.graph import (
            build_brick_wall_incidence,
            incidence_to_graph,
            parse_graph,
        )
        from tneq_tpu.model.qctn import init_params
        from tneq_tpu.ops.contract import contract_cores
        from tneq_tpu.train.fit import make_masked_fidelity_fit

        g = parse_graph(incidence_to_graph(build_brick_wall_incidence(4, 2)))
        params = init_params(g, jax.random.PRNGKey(0), jnp.complex64)
        target = contract_cores(
            g, init_params(g, jax.random.PRNGKey(1), jnp.complex64)
        )
        fit = make_masked_fidelity_fit(
            g, sgdg(0.1, momentum=0.9, stiefel=True),
            max_steps=40, tol=1e-8, jit_scope="step",
        )
        mask = jnp.ones((g.ncores,), jnp.float32)
        ref = fit(params, mask, target)
        masks = jnp.stack([mask, mask])
        res = fit.batched(params, masks, target, chunk_steps=1)
        assert int(res.steps) == int(ref.steps)
        got = np.asarray(res.infidelity)
        np.testing.assert_allclose(got[0], got[1], rtol=1e-6)
        np.testing.assert_allclose(
            got[0], float(ref.infidelity), rtol=1e-4, atol=1e-7
        )
