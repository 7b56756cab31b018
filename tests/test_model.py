"""QCTN model tests: init, set_cores, checkpoint interop, surgery with weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.graph import mps_graph, parse_graph
from tneq_tpu.model import QCTN
from tneq_tpu.ops import contract_cores


class TestQCTN:
    def test_init_shapes_and_dtype(self):
        q = QCTN(mps_graph(4, dim=3))
        assert q.nqubits == 4 and q.ncores == 3
        for name in q.cores:
            assert q.params[name].shape == q.graph.shapes[name]
            assert q.params[name].dtype == jnp.complex64

    def test_real_dtype(self):
        q = QCTN(mps_graph(3, dim=2), dtype=jnp.float32)
        assert q.params[q.cores[0]].dtype == jnp.float32

    def test_deterministic_init(self):
        q1 = QCTN(mps_graph(3, dim=2), key=jax.random.PRNGKey(7))
        q2 = QCTN(mps_graph(3, dim=2), key=jax.random.PRNGKey(7))
        for n in q1.cores:
            np.testing.assert_array_equal(np.asarray(q1.params[n]), np.asarray(q2.params[n]))

    def test_set_cores_list_strict(self):
        q = QCTN(mps_graph(3, dim=2), dtype=jnp.float32)
        new = [jnp.ones(q.graph.shapes[n]) for n in q.cores]
        q.set_cores(new)
        np.testing.assert_array_equal(np.asarray(q.params[q.cores[0]]), 1.0)
        with pytest.raises(ValueError):
            q.set_cores(new[:1])

    def test_set_cores_reshape_on_numel_match(self):
        q = QCTN(mps_graph(3, dim=2), dtype=jnp.float32)
        shape = q.graph.shapes[q.cores[0]]
        flat = jnp.arange(int(np.prod(shape)), dtype=jnp.float32)
        q.set_cores({q.cores[0]: flat}, strict=False)
        assert q.params[q.cores[0]].shape == shape

    def test_set_cores_size_mismatch_raises(self):
        q = QCTN(mps_graph(3, dim=2), dtype=jnp.float32)
        with pytest.raises(ValueError):
            q.set_cores({q.cores[0]: jnp.ones((100,))}, strict=False)

    def test_save_load_roundtrip_complex(self, tmp_path):
        q = QCTN(mps_graph(3, dim=2))
        path = tmp_path / "cores.safetensors"
        q.save_cores(path, metadata={"graph_type": "mps"})
        q2 = QCTN(mps_graph(3, dim=2), key=jax.random.PRNGKey(99))
        meta = q2.load_cores(path)
        assert meta["graph_type"] == "mps"
        for n in q.cores:
            np.testing.assert_allclose(
                np.asarray(q.params[n]), np.asarray(q2.params[n]), atol=1e-7
            )

    def test_safetensors_reference_naming(self, tmp_path):
        """Complex cores stored as core_<name>_real / _imag (qctn.py:919-923)."""
        from safetensors import safe_open

        q = QCTN("-2-A-2-\n-2-B-2-")
        path = tmp_path / "c.safetensors"
        q.save_cores(path)
        with safe_open(str(path), framework="numpy") as f:
            keys = set(f.keys())
        assert keys == {"core_A_real", "core_A_imag", "core_B_real", "core_B_imag"}

    def test_from_pretrained(self, tmp_path):
        src = mps_graph(3, dim=2)
        q = QCTN(src)
        path = tmp_path / "c.safetensors"
        q.save_cores(path)
        q2 = QCTN.from_pretrained(src, path)
        t1 = np.asarray(contract_cores(q.graph, q.params))
        t2 = np.asarray(contract_cores(q2.graph, q2.params))
        np.testing.assert_allclose(t1, t2, atol=1e-6)

    def test_load_strict_missing_raises(self, tmp_path):
        q = QCTN("-2-A-2-")
        path = tmp_path / "c.safetensors"
        q.save_cores(path)
        q2 = QCTN("-2-A-2-B-2-")
        with pytest.raises(KeyError):
            q2.load_cores(path, strict=True)
        q2.load_cores(path, strict=False)  # lenient keeps B's random init

    def test_split_merge_weights_carried(self):
        src = mps_graph(4, dim=3)
        q = QCTN(src)
        q1, q2 = q.split(2)
        assert set(q1.cores) | set(q2.cores) == set(q.cores)
        for n in q1.cores:
            np.testing.assert_array_equal(np.asarray(q1.params[n]), np.asarray(q.params[n]))
        merged = q1.merge_with(q2)
        assert merged.ncores == q.ncores
        # merged cores (renamed) carry the original weights
        vals = sorted(float(jnp.abs(v).sum()) for v in merged.params.values())
        orig = sorted(float(jnp.abs(v).sum()) for v in q.params.values())
        np.testing.assert_allclose(vals, orig, rtol=1e-6)
