"""Auxiliary subsystem tests: callbacks, profiling, health checks, crossover,
QCTN contraction conveniences, merge/split demo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.genetic import Individual
from tneq_tpu.graph import mps_graph, parse_graph
from tneq_tpu.model import QCTN
from tneq_tpu.parallel import check_mesh_health, make_mesh
from tneq_tpu.utils import CallbackList, ExperimentRecorder, StepTimer


class TestCallbacks:
    def test_fire_order_and_error_isolation(self):
        events = []
        cbs = CallbackList()
        cbs.on("step", lambda **k: events.append(("a", k["n"])))
        cbs.on("step", lambda **k: 1 / 0)
        cbs.on("step", lambda **k: events.append(("b", k["n"])))
        cbs.fire("step", n=1)
        assert events == [("a", 1), ("b", 1)]
        assert len(cbs.errors) == 1

    def test_recorder_json_and_pickle(self, tmp_path):
        rec = ExperimentRecorder(tmp_path)
        p1 = rec.record("exp", {"a": 1})
        assert p1.suffix == ".json" and rec.load(p1) == {"a": 1}
        p2 = rec.record("exp", {"s": {1, 2}})  # set: picklable, not JSON
        assert p2.suffix == ".pkl"
        assert rec.load(p2) == {"s": {1, 2}}


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        with t.span("forward"):
            pass
        with t.span("forward"):
            pass
        s = t.summary()
        assert s["forward"]["count"] == 2
        assert "forward" in str(t)


class TestHealth:
    def test_mesh_health_ok(self):
        mesh = make_mesh({"x": 4, "y": 2})
        report = check_mesh_health(mesh, verbose=False)
        assert report["ok"]
        assert set(report["axes"]) == {"x", "y"}
        for axis in report["axes"].values():
            for prim in ("all_gather", "psum", "ppermute"):
                assert axis[prim]["ok"]


class TestCrossover:
    def test_crossover_produces_valid_children(self):
        rng = np.random.default_rng(0)
        a = Individual.create_full_connection("a", tn_size=4, rng=rng)
        b = Individual.create_random("b", tn_size=4, init_sparsity=0.3, rng=rng)
        c1, c2 = a.crossover(b)
        parse_graph(c1.graph.to_dsl())
        parse_graph(c2.graph.to_dsl())
        assert c1.parents == ("a", "b")

    def test_crossover_dim_mismatch_raises(self):
        a = Individual.create_full_connection("a", tn_size=3)
        b = Individual.create_full_connection("b", tn_size=4)
        with pytest.raises(ValueError):
            a.crossover(b)


class TestQCTNConveniences:
    def test_contract_methods(self):
        q = QCTN(mps_graph(3, dim=2))
        t = q.contract_core_only(order="qubit")
        assert t.shape == (2,) * 6
        states = [jnp.asarray([1.0 + 0j, 0.0])] * 3
        out = q.contract_with_inputs(states)
        assert out.shape == (2, 2, 2)
        eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.complex64), (2, 2, 2))
        p = q.contract_with_self(states, [eye] * 3)
        np.testing.assert_allclose(np.asarray(p), 1.0, atol=1e-5)
        q2 = QCTN(mps_graph(3, dim=2), key=jax.random.PRNGKey(5))
        ov = q.contract_with_qctn(q2, conj_target=True)
        assert np.isfinite(complex(ov).real)


class TestMergeSplitDemo:
    def test_demo_runs(self, capsys):
        from tneq_tpu.apps.merge_split_demo import main

        rc = main(["--num-qubits", "6", "--graph-types", "mps"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "carried" in out


class TestTpuChannel:
    def test_patient_first_fetch_on_cpu(self):
        from tneq_tpu.utils import patient_first_fetch, tpu_ready

        dt = patient_first_fetch(budget_s=60)
        assert dt < 60
        assert tpu_ready(budget_s=60)

    def test_alarm_state_restored(self):
        import signal
        from tneq_tpu.utils import patient_first_fetch

        marker = []
        old = signal.signal(signal.SIGALRM, lambda *a: marker.append(1))
        try:
            patient_first_fetch(budget_s=60)
            assert signal.getsignal(signal.SIGALRM) is not old  # our lambda
        finally:
            signal.signal(signal.SIGALRM, old)

    def test_channel_poisoned_on_failure(self, monkeypatch):
        import jax.numpy as jnp
        import pytest as _pytest
        from tneq_tpu.utils import ChannelPoisoned
        from tneq_tpu.utils import tpu_channel

        def boom(*a, **k):
            raise RuntimeError("UNIMPLEMENTED: TPU backend error")

        monkeypatch.setattr(jnp, "ones", boom)
        with _pytest.raises(ChannelPoisoned):
            tpu_channel.patient_first_fetch(budget_s=30)
        assert not tpu_channel.tpu_ready(budget_s=30)
