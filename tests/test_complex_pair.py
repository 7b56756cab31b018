"""Complex-as-real (pair) lowering tests: contraction, fidelity, optimizer.

The pair path must match the complex path bit-for-bit up to f32 noise —
it is the mechanism that puts the reference's complex circuits
(``backend_pytorch.py:52-97``) on a TPU whose plugin rejects complex64.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tneq_tpu.graph import (
    build_brick_wall_incidence,
    incidence_to_graph,
    mps_graph,
    parse_graph,
)
from tneq_tpu.model.qctn import init_params
from tneq_tpu.ops.complex_pair import (
    from_pair,
    make_pair_core_only_fn,
    make_pair_log_abs_overlap_fn,
    make_pair_siamese_fn,
    pair_abs2,
    pair_einsum,
    pair_fidelity,
    pair_tree,
    to_pair,
)
from tneq_tpu.ops.contract import (
    abs_square,
    contract_cores,
    make_siamese_fn,
    make_two_network_fn,
)


def _cx(rng, shape):
    return jnp.asarray(
        rng.normal(size=shape) + 1j * rng.normal(size=shape), jnp.complex64
    )


class TestPairPrimitives:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        z = _cx(rng, (3, 4))
        np.testing.assert_allclose(
            np.asarray(from_pair(to_pair(z))), np.asarray(z), atol=1e-6
        )

    def test_pair_einsum_matches_complex(self):
        rng = np.random.default_rng(1)
        a, b = _cx(rng, (3, 4)), _cx(rng, (4, 5))
        want = jnp.einsum("ab,bc->ac", a, b)
        got = from_pair(pair_einsum("ab,bc->ac", to_pair(a), to_pair(b)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_pair_abs2(self):
        rng = np.random.default_rng(2)
        z = _cx(rng, (5,))
        np.testing.assert_allclose(
            np.asarray(pair_abs2(to_pair(z))),
            np.abs(np.asarray(z)) ** 2,
            rtol=1e-5,
        )


class TestPairContraction:
    def test_core_only_matches(self):
        g = parse_graph(incidence_to_graph(build_brick_wall_incidence(4, 2)))
        params = init_params(g, jax.random.PRNGKey(0), jnp.complex64)
        want = contract_cores(g, params)
        got = from_pair(make_pair_core_only_fn(g)(pair_tree(params)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )

    def test_siamese_matches(self):
        from tneq_tpu.ops.features import measurement_matrices
        from tneq_tpu.train.trainer import basis_states

        g = parse_graph(mps_graph(4, dim=2))
        params = init_params(g, jax.random.PRNGKey(1), jnp.complex64)
        states = basis_states(g, dtype=jnp.complex64)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
        mx = measurement_matrices(x, 2).astype(jnp.complex64)
        measures = [mx[:, q] for q in range(4)]
        want = abs_square(make_siamese_fn(g)(params, states, measures))
        pfn = make_pair_siamese_fn(g)
        got = pair_abs2(
            pfn(
                pair_tree(params),
                [to_pair(s) for s in states],
                [to_pair(m) for m in measures],
            )
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
        )

    def test_pair_fidelity_matches(self):
        from tneq_tpu.train.losses import fidelity

        rng = np.random.default_rng(4)
        o, t = _cx(rng, (2, 2, 2)), _cx(rng, (2, 2, 2))
        np.testing.assert_allclose(
            float(pair_fidelity(to_pair(o), to_pair(t))),
            float(fidelity(o, t)),
            rtol=1e-5,
        )

    def test_pair_log_overlap_matches(self):
        g = parse_graph(incidence_to_graph(build_brick_wall_incidence(4, 3)))
        p = init_params(g, jax.random.PRNGKey(2), jnp.complex64)
        t = init_params(g, jax.random.PRNGKey(3), jnp.complex64)
        dense = make_two_network_fn(g, g, conj_target=True)
        want = float(jnp.log(jnp.abs(dense(p, t))))
        fn = make_pair_log_abs_overlap_fn(g)
        got = float(fn(pair_tree(p), pair_tree(t)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_jit_and_grad_real_only(self):
        """The pair path must lower with no complex ops at all."""
        g = parse_graph(mps_graph(3, dim=2))
        params = pair_tree(init_params(g, jax.random.PRNGKey(4), jnp.complex64))
        fn = make_pair_core_only_fn(g)

        @jax.jit
        def loss(p):
            return jnp.sum(pair_abs2(fn(p)))

        val = loss(params)
        grads = jax.grad(loss)(params)
        assert np.isfinite(float(val))
        for v in grads.values():
            assert v.dtype == jnp.float32
            assert np.isfinite(np.asarray(v)).all()
        # no complex dtype anywhere in the lowered HLO
        hlo = jax.jit(loss).lower(params).as_text()
        assert "c64" not in hlo and "complex" not in hlo


class TestPairStiefelParity:
    def _setup(self):
        g = parse_graph(incidence_to_graph(build_brick_wall_incidence(4, 2)))
        params = init_params(g, jax.random.PRNGKey(5), jnp.complex64)
        target = contract_cores(
            g, init_params(g, jax.random.PRNGKey(6), jnp.complex64)
        )
        return g, params, target

    def test_multistep_parity_with_complex_sgdg(self):
        from tneq_tpu.ops.contract import make_core_only_fn
        from tneq_tpu.optim.pair_stiefel import pair_sgdg
        from tneq_tpu.optim.stiefel import sgdg
        from tneq_tpu.train.losses import fidelity

        g, params, target = self._setup()
        core_fn = make_core_only_fn(g)
        pair_core_fn = make_pair_core_only_fn(g)

        opt_c = sgdg(0.05, momentum=0.9, stiefel=True, seed=7)
        opt_p = pair_sgdg(0.05, momentum=0.9, stiefel=True, seed=7)

        def loss_c(p):
            return 1.0 - fidelity(core_fn(p), target)

        t_pair = to_pair(target)

        def loss_p(p):
            return 1.0 - pair_fidelity(pair_core_fn(p), t_pair)

        pc = params
        pp = pair_tree(params)
        sc = opt_c.init(pc)
        sp = opt_p.init(pp)
        with jax.default_matmul_precision("highest"):
            for step in range(5):
                lc, gc = jax.value_and_grad(loss_c)(pc)
                lp, gp = jax.value_and_grad(loss_p)(pp)
                np.testing.assert_allclose(float(lc), float(lp), rtol=2e-4,
                                           atol=1e-5)
                uc, sc = opt_c.update(gc, sc, pc)
                up, sp = opt_p.update(gp, sp, pp)
                pc = jax.tree.map(lambda a, b: a + b, pc, uc)
                pp = jax.tree.map(lambda a, b: a + b, pp, up)
        for n in pc:
            np.testing.assert_allclose(
                np.asarray(pc[n]),
                np.asarray(from_pair(pp[n])),
                rtol=1e-3,
                atol=1e-4,
            )

    def test_pair_qr_retraction_orthonormal(self):
        from tneq_tpu.optim.pair_stiefel import pair_h, pair_matmul, pair_qr_retraction

        rng = np.random.default_rng(8)
        x = to_pair(_cx(rng, (3, 7)))
        q = pair_qr_retraction(x)
        qqh = pair_matmul(q, pair_h(q))
        np.testing.assert_allclose(np.asarray(qqh[0]), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(qqh[1]), 0.0 * qqh[1], atol=1e-5)

    def test_pair_qr_matches_complex_qr(self):
        from tneq_tpu.optim.pair_stiefel import pair_qr_retraction
        from tneq_tpu.optim.stiefel import qr_retraction

        rng = np.random.default_rng(9)
        z = _cx(rng, (3, 7))
        want = qr_retraction(z)
        got = from_pair(pair_qr_retraction(to_pair(z)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


class TestPairExperiment:
    """The complex flagship in pair mode: end-to-end pruning loop on
    real-only ops, matching the complex path's behavior."""

    def test_pair_fit_matches_complex_fit(self):
        from tneq_tpu.apps.symmetry_breaking import (
            SymmetryBreakingConfig,
            make_experiment,
            target_tensor_init,
            validate_target_tensor,
        )

        key = jax.random.PRNGKey(3)
        results = {}
        for pair in (False, True):
            cfg = SymmetryBreakingConfig(
                n_qubits=4, n_cells=2, validate_steps=400, prune_steps=400,
                complex_as_real=pair,
            )
            exp = make_experiment(cfg)
            k1, k2 = jax.random.split(key)
            target = target_tensor_init(exp, [2], k1)
            ok, fid, steps = validate_target_tensor(exp, target, k2)
            results[pair] = (ok, fid, steps)
        # same seeds -> same trajectory: fidelity and step count agree
        assert results[False][0] == results[True][0]
        np.testing.assert_allclose(
            results[False][1], results[True][1], rtol=1e-3, atol=1e-4
        )

    def test_pair_network_fit_converges(self):
        from tneq_tpu.optim.pair_stiefel import pair_sgdg
        from tneq_tpu.train.network_fit import make_masked_network_fidelity_fit

        g = parse_graph(incidence_to_graph(build_brick_wall_incidence(4, 3)))
        fit = make_masked_network_fidelity_fit(
            g, pair_sgdg(1e-2, momentum=0.9, stiefel=True),
            max_steps=400, tol=1e-3, complex_as_real=True,
        )
        t = pair_tree(init_params(g, jax.random.PRNGKey(11), jnp.complex64))
        mask = jnp.ones((g.ncores,), jnp.float32)
        tmask = mask.at[4].set(0.0)
        res = fit(t, tmask, t, tmask)  # identical nets -> immediate converge
        assert float(res.infidelity) < 1e-3
        res2 = fit(t, mask, t, tmask)  # warm from target, one core masked
        assert np.isfinite(float(res2.infidelity))
