"""Headline benchmark: Stiefel fidelity-training throughput on the 8-qubit
x 5-cell brick-wall QCTN (the symmetry-breaking inner loop).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...}

vs_baseline = steps-per-second divided by an equivalent torch-CPU
implementation of the same forward+backward+update step (the reference
framework is pure torch-CPU; BASELINE.md publishes no framework numbers, so
the baseline is measured in-process).

Every accelerator interaction runs under a SIGALRM guard that exits cleanly:
a SIGKILLed process wedges this container's TPU tunnel for a long time.
"""

from __future__ import annotations

import json
import signal
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


class BenchTimeout(Exception):
    pass


def _alarm(seconds: int):
    def handler(signum, frame):
        raise BenchTimeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def _warm_channel(jnp, tries: int = 8, sleep_s: int = 20) -> bool:
    """Absorb the tunnel's reconnect stall with a trivial fetch.

    The axon readback link flaps: the first device->host fetch after idle
    either blocks ~80s while the tunnel reconnects or fails fast with
    UNIMPLEMENTED, after which the channel usually works.  Retry a 1-element
    fetch until it sticks; everything after rides the warmed channel.
    """
    for i in range(tries):
        try:
            v = float(jnp.ones((1,)).sum())
            log(f"channel warm after attempt {i + 1} (fetch={v})")
            return True
        except Exception as e:
            log(f"warm attempt {i + 1}/{tries}: {type(e).__name__}: "
                f"{str(e)[:60]}")
            time.sleep(sleep_s)
    return False


def bench_jax(device_budget_s: int = 600, force_cpu: bool = False) -> tuple:
    import jax
    import jax.numpy as jnp

    from tneq_tpu.graph import (
        build_brick_wall_incidence,
        incidence_to_graph,
        parse_graph,
    )
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.ops.contract import make_core_only_fn
    from tneq_tpu.optim import sgdg
    from tneq_tpu.train.losses import fidelity

    if force_cpu:
        cpu = jax.devices("cpu")[0]
        ctx = jax.default_device(cpu)
        device = "cpu"
    else:
        import contextlib

        ctx = contextlib.nullcontext()
        device = jax.devices()[0].platform
    log(f"jax devices: {jax.devices()} (force_cpu={force_cpu})")
    graph = parse_graph(
        incidence_to_graph(build_brick_wall_incidence(N_QUBITS, N_CELLS, 2))
    )
    core_fn = make_core_only_fn(graph)
    optimizer = sgdg(1.0, momentum=0.9, stiefel=True)

    # NOTE: target must be an argument (not a closure capture): the axon TPU
    # backend cannot host-copy captured device arrays during lowering.
    def loss_fn(p, target):
        with jax.default_matmul_precision("highest"):
            return 1.0 - fidelity(core_fn(p), target)

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
        return losses[-1]

    _alarm(device_budget_s)
    try:
      with ctx:
        if not force_cpu and device != "cpu" and not _warm_channel(jnp):
            signal.alarm(0)
            return None, device
        # build everything on device inside the guard (incl. the PRNG key:
        # it must live on the same backend as everything downstream)
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        target_params = init_params(graph, k1, jnp.complex64)
        mask = np.ones(graph.ncores, np.float32)
        mask[TARGET_MASK] = 0.0
        from tneq_tpu.train.fit import identity_cores

        idents = identity_cores(graph, jnp.complex64)
        eff = {
            n: jnp.asarray(mask[i], jnp.complex64) * target_params[n]
            + jnp.asarray(1 - mask[i], jnp.complex64) * idents[n]
            for i, n in enumerate(graph.core_names)
        }
        target = core_fn(eff)
        params = init_params(graph, k2, jnp.complex64)

        # AOT-compile then time ONE execution synchronized by the scalar
        # fetch: this backend's block_until_ready does not actually wait,
        # and re-executing the same program can hang (CLAUDE.md), so the
        # usual warmup-then-retime pattern is wrong here and the fetch is
        # the only reliable completion barrier.
        log("AOT-compiling jax fit step...")
        t0 = time.time()
        compiled = jax.jit(run).lower(params, target).compile()
        log(f"compile: {time.time() - t0:.1f}s")

        t0 = time.time()
        out = compiled(params, target)
        final_infid = float(out)  # device->host fetch = completion barrier
        dt = time.time() - t0
        signal.alarm(0)
    except BenchTimeout:
        log("jax benchmark timed out (accelerator tunnel wedged?)")
        return None, device
    except Exception as e:
        # e.g. the axon tunnel's readback stream erroring UNIMPLEMENTED
        log(f"jax benchmark failed on {device}: {type(e).__name__}: {e}")
        signal.alarm(0)
        return None, device
    sps = BENCH_STEPS / dt
    log(f"jax[{device}]: {BENCH_STEPS} steps in {dt:.2f}s -> {sps:.1f} steps/s "
        f"(final 1-F={final_infid:.4f})")
    return sps, device


def bench_torch_cpu() -> float:
    """Equivalent torch-CPU step: same einsum network, fidelity loss,
    backward, momentum update (cheaper than the reference's full SGDG —
    a conservative baseline)."""
    import torch

    from tneq_tpu.ops.einsum_spec import core_only_spec
    from tneq_tpu.graph import (
        build_brick_wall_incidence,
        incidence_to_graph,
        parse_graph,
    )

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

    import opt_einsum as oe

    # torch.einsum only accepts [a-zA-Z] subscripts; the 35-core network
    # needs more symbols, so contract via opt_einsum's torch backend (which
    # remaps per pairwise step) with a precomputed expression — the same
    # approach the reference uses (EinsumStrategy + contract_expression)
    expr = oe.contract_expression(
        spec.equation, *[c.shape for c in graph.cores], optimize="greedy"
    )

    def step():
        out = expr(*params, backend="torch")
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
    jax_sps, device = bench_jax()
    if jax_sps is None and device != "cpu":
        log("first accelerator attempt failed; retrying once after 20s...")
        time.sleep(20)
        jax_sps, device = bench_jax()
    if jax_sps is None:
        # accelerator tunnel wedged: measure the same fit on the CPU backend
        # (honest framework number, clearly labeled) — CPU computations do
        # not touch the wedged tunnel
        log("retrying benchmark on the CPU backend...")
        try:
            jax_sps, _ = bench_jax(device_budget_s=300, force_cpu=True)
            device = "cpu(tpu-tunnel-wedged)"
        except Exception as e:
            log(f"cpu fallback failed: {e}")
            jax_sps = None
    try:
        _alarm(180)
        torch_sps = bench_torch_cpu()
        signal.alarm(0)
    except (Exception, BenchTimeout) as e:
        log(f"torch baseline failed: {e}")
        torch_sps = None

    if jax_sps is None:
        # accelerator unreachable: report the torch baseline as the value
        # with an explicit flag so the record is honest
        print(json.dumps({
            "metric": f"stiefel_fidelity_train_steps_per_sec_{N_QUBITS}q{N_CELLS}c",
            "value": round(torch_sps, 2) if torch_sps else 0.0,
            "unit": "steps/s",
            "vs_baseline": 1.0 if torch_sps else None,
            "device": "cpu-fallback-accelerator-unreachable",
        }))
        return
    vs = (jax_sps / torch_sps) if torch_sps else None
    print(json.dumps({
        "metric": f"stiefel_fidelity_train_steps_per_sec_{N_QUBITS}q{N_CELLS}c",
        "value": round(jax_sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "device": device,
    }))


if __name__ == "__main__":
    main()
