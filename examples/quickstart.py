"""Quickstart: define, train, and query a QCTN (see docs/API.md)."""
import jax
import jax.numpy as jnp
import numpy as np

from tneq_tpu import QCTN
from tneq_tpu.graph import wall_graph
from tneq_tpu.engine import EngineSiamese
from tneq_tpu.train.trainer import Trainer, TrainingConfig, basis_states

model = QCTN(wall_graph(4, layers=4, dim=2), key=jax.random.PRNGKey(0))
engine = EngineSiamese()
states = basis_states(model.graph)

x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 4)), jnp.float32)
trainer = Trainer(model.graph, config=TrainingConfig(
    method="sgdg", learning_rate=1e-2, momentum=0.9, max_steps=100))
params, stats = trainer.fit(model.params, [x], states=states)
print(f"loss {stats.losses[0]:.4f} -> {stats.final_loss:.4f}")

model.params = params
mx, _ = engine.generate_data(x[:4], K=2)
print("P(x):", np.asarray(
    engine.contract_with_compiled_strategy(model, states, mx)))
samples = engine.sample(model, states, num_samples=16, K=2, grid_size=64)
print("samples:", np.asarray(samples).shape)
