"""Backend shim, manifold extras, metrics writer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.backend import JaxBackend, create_backend, get_default_backend
from tneq_tpu.optim.manifold import (
    cayley_step,
    polar_retraction,
    skew,
    stiefel_project_tangent,
    sym,
    sphere_exp,
)
from tneq_tpu.utils.metrics import MetricsWriter


class TestBackendShim:
    def test_factory_and_default(self):
        b = create_backend("jax", dtype=jnp.float32)
        assert b.backend_info["type"] == "jax"
        assert get_default_backend() is get_default_backend()

    def test_torch_backend_request_errors(self):
        with pytest.raises(ValueError):
            create_backend("pytorch")

    def test_ops_surface(self):
        b = JaxBackend(dtype=jnp.float32)
        x = b.convert_to_tensor([[1.0, 2.0], [3.0, 4.0]])
        assert b.einsum("ij,jk->ik", x, b.eye(2)).shape == (2, 2)
        assert float(b.mean(x)) == 2.5
        assert not b.is_complex(x)
        assert b.abs_square(b.convert_to_tensor([3.0]))[0] == 9.0

    def test_init_random_core_orthogonal(self):
        b = JaxBackend(dtype=jnp.complex64)
        q = b.init_random_core([2, 2, 2, 2])
        m = np.asarray(q).reshape(4, 4)
        np.testing.assert_allclose(m.conj().T @ m, np.eye(4), atol=1e-5)

    def test_value_and_grad(self):
        b = JaxBackend(dtype=jnp.float32)
        f = b.compute_value_and_grad(lambda x: jnp.sum(x**2))
        v, g = f(jnp.asarray([1.0, 2.0]))
        assert float(v) == 5.0
        np.testing.assert_allclose(np.asarray(g), [2.0, 4.0])


class TestManifold:
    def test_sym_skew_decomposition(self):
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(sym(y) + skew(y)), np.asarray(y), atol=1e-6
        )

    def test_polar_retraction_orthonormal(self):
        rng = np.random.default_rng(1)
        t = jnp.asarray(rng.normal(size=(2, 5)), jnp.float32)
        q = polar_retraction(t)
        np.testing.assert_allclose(
            np.asarray(q @ q.T), np.eye(2), atol=1e-5
        )

    def test_tangent_projection_idempotent(self):
        rng = np.random.default_rng(2)
        y = polar_retraction(jnp.asarray(rng.normal(size=(2, 5)), jnp.float32))
        g = jnp.asarray(rng.normal(size=(2, 5)), jnp.float32)
        t1 = stiefel_project_tangent(y, g)
        t2 = stiefel_project_tangent(y, t1)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)

    def test_sphere_exp_stays_unit(self):
        y = jnp.asarray([[1.0, 0.0, 0.0]])
        h = jnp.asarray([[0.0, 0.5, 0.0]])
        out = sphere_exp(y, h)
        assert float(jnp.linalg.norm(out)) == pytest.approx(1.0, abs=1e-5)

    def test_cayley_preserves_orthogonality(self):
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
        w = skew(w)
        x = jnp.eye(3)
        y = cayley_step(x, w, 0.3)
        np.testing.assert_allclose(
            np.asarray(y.T @ y), np.eye(3), atol=1e-5
        )


class TestMetrics:
    def test_jsonl_writer(self, tmp_path):
        import json

        with MetricsWriter(tmp_path) as w:
            w.scalar("loss", 1.5, 0)
            w.scalars({"loss": 1.2, "fid": 0.3}, 1)
        lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 3
        rec = json.loads(lines[-1])
        assert rec["tag"] == "fid" and rec["step"] == 1
