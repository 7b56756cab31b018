"""App CLI smoke tests (fast configs)."""

import json

import numpy as np


def test_train_single_node_cli(tmp_path, capsys):
    from tneq_tpu.apps.train_single_node import main

    stats = main([
        "--num-qubits", "4", "--dim", "2", "--steps", "12",
        "--batch-size", "8", "--graph-type", "mps",
        "--save", str(tmp_path / "m.safetensors"),
    ])
    assert stats.steps == 12
    assert (tmp_path / "m.safetensors").exists()


def test_train_single_node_profile(tmp_path):
    from tneq_tpu.apps.train_single_node import main

    main([
        "--num-qubits", "3", "--dim", "2", "--steps", "4",
        "--batch-size", "4", "--graph-type", "mps",
        "--profile", str(tmp_path / "prof"),
    ])
    assert any((tmp_path / "prof").rglob("*"))


def test_structure_search_cli(tmp_path):
    from tneq_tpu.apps.structure_search import main

    r = main([
        "--tn-size", "3", "--population", "3", "--generations", "1",
        "--train-steps", "30", "--save", str(tmp_path / "s.json"),
    ])
    assert r["fitness"] is not None
    assert json.loads((tmp_path / "s.json").read_text())["graph"]


def test_structure_search_template_graph():
    """--template-graph starts the population at a different topology
    than the goal (structure recovery: bond-1 candidates vs a bond-2
    goal; mutations with --tn-rank 2 can grow bonds toward the goal)."""
    from tneq_tpu.apps.structure_search import main
    from tneq_tpu.graph.generators import mps_graph

    goal = mps_graph(4, 2, phys=2)
    tmpl = mps_graph(4, 1, phys=2)
    r = main([
        "--tn-size", "4", "--tn-rank", "2", "--goal-graph=" + goal,
        "--template-graph=" + tmpl, "--population", "3",
        "--generations", "2", "--evaluate-repeat", "1", "--elitism", "1",
        "--train-steps", "40", "--loss", "log_fidelity", "--seed", "3",
    ])
    assert r["fitness"] is not None
    # elitism keeps the per-generation best monotone (non-increasing)
    hist = [h["best_fitness"] for h in r["history"]]
    assert hist[-1] <= hist[0] + 1e-9


def test_distributed_trainer_cli(tmp_path):
    from tneq_tpu.parallel.trainer import main

    stats = main([
        "--num-qubits", "4", "--graph-type", "wall", "--steps", "6",
        "--model-axis", "1",
    ])
    assert stats.steps == 6
    assert np.isfinite(stats.final_loss)
