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


def test_distributed_trainer_cli(tmp_path):
    from tneq_tpu.parallel.trainer import main

    stats = main([
        "--num-qubits", "4", "--graph-type", "wall", "--steps", "6",
        "--model-axis", "1",
    ])
    assert stats.steps == 6
    assert np.isfinite(stats.final_loss)
