"""Headline benchmark: Stiefel fidelity-training throughput on the 8-qubit
x 5-cell brick-wall QCTN (the symmetry-breaking inner loop).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

vs_baseline = JAX/TPU steps-per-second divided by an equivalent
torch-CPU implementation of the same forward+backward+update step (the
reference framework is pure torch-CPU; BASELINE.md publishes no framework
numbers, so the baseline is measured in-process).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_QUBITS = 8
N_CELLS = 5
BENCH_STEPS = 400
TORCH_STEPS = 10
TARGET_MASK = [2, 3, 5, 8, 9, 12, 13, 14, 15, 17, 18, 20, 21, 23, 25, 26, 29,
               31, 32, 33]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    from tneq_tpu.apps.symmetry_breaking import (
        SymmetryBreakingConfig,
        make_experiment,
        target_tensor_init,
    )
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.ops.contract import make_core_only_fn
    from tneq_tpu.optim import sgdg
    from tneq_tpu.train.losses import fidelity

    log(f"jax devices: {jax.devices()}")
    cfg = SymmetryBreakingConfig(n_qubits=N_QUBITS, n_cells=N_CELLS)
    exp = make_experiment(cfg)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    target = target_tensor_init(exp, TARGET_MASK, k1)
    params = init_params(exp.graph, k2, jnp.complex64)

    core_fn = make_core_only_fn(exp.graph)
    optimizer = sgdg(1.0, momentum=0.9, stiefel=True)

    # NOTE: target must be an argument (not a closure capture): the axon TPU
    # backend cannot host-copy captured device arrays during lowering.
    def loss_fn(p, target):
        return 1.0 - fidelity(core_fn(p), target)

    @jax.jit
    def run(params, target):
        def body(carry, _):
            params, opt_state = carry
            l, g = jax.value_and_grad(loss_fn)(params, target)
            updates, opt_state = optimizer.update(g, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), l

        (params, _), losses = jax.lax.scan(
            body, (params, optimizer.init(params)), None, length=BENCH_STEPS
        )
        return params, losses

    log("compiling jax fit step...")
    t0 = time.time()
    out = run(params, target)
    jax.block_until_ready(out)
    log(f"compile+first run: {time.time() - t0:.1f}s")

    t0 = time.time()
    out = run(params, target)
    jax.block_until_ready(out)
    dt = time.time() - t0
    sps = BENCH_STEPS / dt
    final_infid = float(out[1][-1])
    log(f"jax: {BENCH_STEPS} steps in {dt:.2f}s -> {sps:.1f} steps/s "
        f"(final 1-F={final_infid:.4f})")
    return sps


def bench_torch_cpu() -> float:
    """Equivalent torch-CPU step: same einsum network, fidelity loss,
    backward, momentum update (cheaper than the reference's full SGDG —
    a conservative baseline)."""
    import torch

    from tneq_tpu.ops.einsum_spec import core_only_spec
    from tneq_tpu.graph import build_brick_wall_incidence, incidence_to_graph, parse_graph

    graph = parse_graph(
        incidence_to_graph(build_brick_wall_incidence(N_QUBITS, N_CELLS, 2))
    )
    spec = core_only_spec(graph)
    gen = torch.Generator().manual_seed(0)
    params = [
        torch.nn.Parameter(
            torch.randn(c.shape, generator=gen, dtype=torch.complex64)
        )
        for c in graph.cores
    ]
    target = torch.randn(
        tuple([2] * (2 * N_QUBITS)), generator=gen, dtype=torch.complex64
    )
    bufs = [torch.zeros_like(p) for p in params]

    def step():
        out = torch.einsum(spec.equation, *params)
        o = out.reshape(-1)
        t = target.reshape(-1)
        ov = torch.vdot(t, o)
        num = ov.abs() ** 2
        den = (torch.vdot(t, t).real * torch.vdot(o, o).real).clamp_min(1e-12)
        loss = 1.0 - num / den
        for p in params:
            if p.grad is not None:
                p.grad = None
        loss.backward()
        with torch.no_grad():
            for p, b in zip(params, bufs):
                b.mul_(0.9).add_(p.grad.conj())
                p.add_(b, alpha=-1.0)

    step()  # warmup
    t0 = time.time()
    for _ in range(TORCH_STEPS):
        step()
    dt = time.time() - t0
    sps = TORCH_STEPS / dt
    log(f"torch-cpu: {TORCH_STEPS} steps in {dt:.2f}s -> {sps:.1f} steps/s")
    return sps


def main():
    jax_sps = bench_jax()
    try:
        torch_sps = bench_torch_cpu()
        vs = jax_sps / torch_sps if torch_sps > 0 else float("nan")
    except Exception as e:  # torch baseline is best-effort
        log(f"torch baseline failed: {e}")
        vs = float("nan")
    print(json.dumps({
        "metric": f"stiefel_fidelity_train_steps_per_sec_{N_QUBITS}q{N_CELLS}c",
        "value": round(jax_sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }))


if __name__ == "__main__":
    main()
