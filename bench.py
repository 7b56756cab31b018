"""Headline benchmark: network-fidelity training throughput on a 32-qubit
bond-dimension-16 MPS circuit (the framework's target scale; the
symmetry-breaking experiment's ``--fidelity-mode network`` inner loop).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N, ...}

vs_baseline = steps-per-second divided by an equivalent torch-CPU
implementation of the same forward+backward+update step (the reference
framework is pure torch-CPU; BASELINE.md publishes no framework numbers, so
the baseline is measured in-process).

Accelerator-channel protocol (measured on this container's axon tunnel,
2026-08-16): the FIRST device op of a fresh process either blocks up to
~150s then succeeds — after which the process is healthy — or fails fast
with UNIMPLEMENTED, after which the PJRT client is poisoned and every later
op fails too.  complex64 ops are entirely unsupported by the current
plugin.  So TPU attempts run in fresh subprocesses (one patient first
fetch, float32 workload, clean internal alarms — a SIGKILLed client wedges
the tunnel), and the parent falls back to the CPU backend if no attempt
lands.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

N_QUBITS = 32
BOND_DIM = 16
BENCH_STEPS = 200
TORCH_STEPS = 10
LR = 1e-3
METRIC = f"network_fidelity_train_steps_per_sec_{N_QUBITS}q_dim{BOND_DIM}"

CHILD_BUDGET_S = 1100  # whole child attempt (first fetch has blocked 897s
                       # and then SUCCEEDED in a degraded phase, 2026-08-19;
                       # killing a slow-but-healthy first fetch wastes the
                       # round's one driver-run measurement)
TPU_ATTEMPTS = 3


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class BenchTimeout(Exception):
    pass


def _alarm(seconds: int):
    def handler(signum, frame):
        raise BenchTimeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def _build_step_fn(n_steps=BENCH_STEPS):
    """The measured program: ``n_steps`` gradient steps of the log-space
    network-fidelity loss (train/network_fit.py) on a 32q MPS, f32."""
    import jax
    import jax.numpy as jnp

    from tneq_tpu.graph import mps_graph, parse_graph
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.train.network_fit import network_log_fidelity

    g = parse_graph(mps_graph(N_QUBITS, dim=BOND_DIM))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    target = init_params(g, k1, jnp.float32)
    # start near the target (perturbed copy) so the fit converges and the
    # reported loss is meaningful; random-vs-random 32q networks have
    # overlap ~0 where the log-fidelity gradient is noise
    params = {
        n: t + 0.01 * jax.random.normal(jax.random.fold_in(k2, i), t.shape)
        for i, (n, t) in enumerate(sorted(target.items()))
    }

    def loss(p, t):
        return -network_log_fidelity(g, p, t)

    def steps(p, t):
        def body(c, _):
            l, gr = jax.value_and_grad(loss)(c, t)
            return jax.tree.map(lambda a, b: a - LR * b, c, gr), l

        return jax.lax.scan(body, p, None, length=n_steps)[1][-1]

    return steps, params, target


def _measure(force_cpu: bool) -> tuple:
    """AOT-compile then time ONE execution with the final scalar fetch as
    the completion barrier (this tunnel's block_until_ready does not wait,
    and re-executing one compiled program has hung it before)."""
    import jax

    if force_cpu:
        import contextlib

        jax.config.update("jax_platforms", "cpu")
        ctx = contextlib.nullcontext()
        device = "cpu"
    else:
        import contextlib

        ctx = contextlib.nullcontext()
        device = jax.devices()[0].platform
    log(f"devices: {jax.devices()} (force_cpu={force_cpu})")

    with ctx:
        if not force_cpu and device != "cpu":
            import jax.numpy as jnp

            t0 = time.time()
            v = float(jnp.ones((4,)).sum())  # patient first fetch
            log(f"first fetch: {v} ({time.time() - t0:.1f}s)")
        steps, params, target = _build_step_fn()
        t0 = time.time()
        compiled = jax.jit(steps).lower(params, target).compile()
        log(f"AOT compile: {time.time() - t0:.1f}s")
        t0 = time.time()
        out = float(compiled(params, target))  # fetch = completion barrier
        dt = time.time() - t0
        from tneq_tpu.bench._measure import remeasure_steps

        n_timed = BENCH_STEPS
        n2 = remeasure_steps(BENCH_STEPS, dt) if (
            not force_cpu and device != "cpu") else None
        if n2 is not None:
            # the one-time dispatch+fetch round-trip dominates a 200-step
            # scan — re-measure with a scan long enough that device exec
            # is >=90% of the wall (shared rule: bench/_measure.py)
            n_timed = n2
            log(f"fast program ({dt:.2f}s/{BENCH_STEPS} steps): "
                f"re-measuring with a {n_timed}-step scan")
            steps2, p2, t2 = _build_step_fn(n_timed)
            compiled2 = jax.jit(steps2).lower(p2, t2).compile()
            t0 = time.time()
            out = float(compiled2(p2, t2))
            dt = time.time() - t0
    sps = n_timed / dt
    log(f"jax[{device}]: {n_timed} steps in {dt:.2f}s -> "
        f"{sps:.1f} steps/s (loss={out:.4f})")
    return sps, device


def tpu_attempt() -> int:
    """Child-process entry: one clean-exit TPU measurement."""
    try:
        import atexit

        from tneq_tpu.bench._tpulock import TpuBusy, acquire

        try:
            release = acquire("bench.py tpu_attempt")
        except TpuBusy as e:
            log(f"TPU channel BUSY: {e} — refusing a second client")
            return 4
        atexit.register(release)
    except ImportError:
        pass
    try:
        _alarm(CHILD_BUDGET_S)
        sps, device = _measure(force_cpu=False)
        signal.alarm(0)
    except BenchTimeout:
        log("tpu attempt timed out (clean exit; never SIGKILL this tunnel)")
        return 2
    except Exception as e:
        log(f"tpu attempt failed: {type(e).__name__}: {str(e)[:100]}")
        return 1
    print(f"RESULT {json.dumps({'sps': sps, 'device': device})}", flush=True)
    return 0


def _step_flops():
    """Exact FLOPs of one headline gradient step (3 overlaps, fwd+bwd);
    None if the model fails (accounting must never sink the bench)."""
    try:
        from tneq_tpu.bench.flops import network_fidelity_step_flops
        from tneq_tpu.graph import mps_graph, parse_graph

        g = parse_graph(mps_graph(N_QUBITS, dim=BOND_DIM))
        return float(network_fidelity_step_flops(g, "float32", gradient=True))
    except Exception as e:
        log(f"flop accounting failed: {e}")
        return None


def bench_torch_cpu() -> float:
    """Equivalent torch-CPU step: same two-network contraction (via
    opt_einsum's torch backend, as the reference's EinsumStrategy does),
    same max-abs core normalization, log-fidelity loss, backward, SGD."""
    import torch

    import opt_einsum as oe

    from tneq_tpu.graph import mps_graph, parse_graph
    from tneq_tpu.ops.einsum_spec import two_network_spec

    g = parse_graph(mps_graph(N_QUBITS, dim=BOND_DIM))
    spec = two_network_spec(g, g)
    gen = torch.Generator().manual_seed(0)
    targets = [torch.randn(c.shape, generator=gen) for c in g.cores]
    params = [
        torch.nn.Parameter(t + 0.01 * torch.randn(t.shape, generator=gen))
        for t in targets
    ]
    shapes = [c.shape for c in g.cores]
    expr = oe.contract_expression(
        spec.equation, *(shapes + shapes), optimize="greedy"
    )
    tiny = 1e-30

    def norm(ts):
        return [t / t.detach().abs().max().clamp_min(tiny) for t in ts]

    def step():
        p = norm(params)
        t = norm(targets)
        ov = expr(*(p + t), backend="torch")
        oo = expr(*(p + p), backend="torch")
        tt = expr(*(t + t), backend="torch")
        loss = -(torch.log(ov**2 + tiny) - torch.log(oo.abs() + tiny)
                 - torch.log(tt.abs() + tiny))
        for q in params:
            if q.grad is not None:
                q.grad = None
        loss.backward()
        with torch.no_grad():
            for q in params:
                q.add_(q.grad, alpha=-LR)

    step()  # warmup
    t0 = time.time()
    for _ in range(TORCH_STEPS):
        step()
    dt = time.time() - t0
    sps = TORCH_STEPS / dt
    log(f"torch-cpu: {TORCH_STEPS} steps in {dt:.2f}s -> {sps:.1f} steps/s")
    return sps


def main():
    # if another TPU client is live (a protocol child, a probe), wait for
    # it to finish rather than racing it onto the tunnel — the driver runs
    # this unattended at round end, possibly while background experiment
    # lanes are still mid-restart (one flagship restart holds the lock up
    # to ~55 min), so busy-waits must not consume measurement attempts
    try:
        from tneq_tpu.bench._tpulock import (
            clear_priority, holder, request_priority,
        )
    except ImportError:
        def holder():
            return None

        def request_priority(tag):
            return None

        def clear_priority():
            return None

    # post the bench-priority flag IMMEDIATELY (and refresh it every poll):
    # cooperating lane drivers (flagship_protocol, run_all --isolate,
    # register_cli'd one-shots) finish their in-flight child and pause
    # instead of spawning the next one — without this, back-to-back
    # restarts can hold the channel past any reasonable wait deadline and
    # this run would record a CPU fallback as the round's number
    request_priority("bench.py driver run")

    jax_sps, device = None, None
    # lane children now yield MID-RUN at their next fit-chunk boundary
    # (install_lane_yield, VERDICT r4 #1): expected wait is ~one chunk
    # dispatch + teardown, not a whole 7-55 min restart.  2400s bounds the
    # wait well inside the driver window while still covering a degraded
    # channel's slow teardown + our own patient first fetch
    deadline = time.time() + 2400
    attempts = 0
    while attempts < TPU_ATTEMPTS and time.time() < deadline:
        request_priority("bench.py driver run")  # keep the flag fresh
        live = holder()
        if live is not None:
            log(f"TPU channel held by pid={live.get('pid')} "
                f"tag={live.get('tag')!r}; waiting "
                f"({int(deadline - time.time())}s left)")
            time.sleep(60)
            continue
        env = dict(os.environ)
        # our own measurement children must not refuse on our flag
        env["TNEQ_TPU_PRIORITY_OK"] = "1"
        if attempts == TPU_ATTEMPTS - 1:
            # safety net: if the fused Pallas chain path is what is
            # failing (remote-compile rejection, kernel fault), the last
            # attempt falls back to the XLA scan path rather than losing
            # the TPU entirely
            env["TNEQ_CHAIN_PALLAS"] = "0"
            log("(final attempt: fused chain kernel disabled)")
        log(f"--- TPU attempt {attempts + 1}/{TPU_ATTEMPTS} "
            f"(fresh subprocess) ---")
        # TERM-only bound: the child's alarm exits first unless it is
        # wedged in backend init (alarm-proof) — then the parent TERMs it;
        # subprocess.run(timeout=) would SIGKILL and wedge the tunnel
        from tneq_tpu.bench._subproc import run_term_bounded

        r = run_term_bounded(
            [sys.executable, os.path.abspath(__file__), "--tpu-attempt"],
            timeout=CHILD_BUDGET_S + 120, env=env, capture_stderr=True,
        )
        sys.stderr.write(r.stderr)
        if getattr(r, "abandoned", False):
            # the child survived both TERMs (wedged in alarm-proof backend
            # init) and is STILL RUNNING — spawning another attempt would
            # put two clients on the tunnel (CLAUDE.md: serialize TPU
            # access), so stop trying and fall back to CPU
            log("child wedged and abandoned (still alive); no further "
                "TPU attempts this run")
            break
        if r.returncode == 4:
            # lost the lock race to a client that appeared after our
            # holder() check — a busy channel is not a failed measurement
            log("child found the channel busy; waiting, not counting "
                "an attempt")
            time.sleep(60)
            continue
        if r.returncode == -15:
            log("child exceeded its budget and died to SIGTERM")
            attempts += 1
            continue
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                d = json.loads(line[len("RESULT "):])
                jax_sps, device = d["sps"], d["device"]
        if jax_sps is not None:
            break
        attempts += 1
        time.sleep(15)

    # release the lanes before the (channel-free) CPU fallback / reporting
    clear_priority()

    if jax_sps is None:
        log("accelerator unreachable; measuring on the CPU backend")
        try:
            _alarm(420)
            jax_sps, _ = _measure(force_cpu=True)
            signal.alarm(0)
            device = "cpu(tpu-tunnel-wedged)"
        except (BenchTimeout, Exception) as e:
            log(f"cpu fallback failed: {e}")
            jax_sps = None

    try:
        _alarm(420)
        torch_sps = bench_torch_cpu()
        signal.alarm(0)
    except (BenchTimeout, Exception) as e:
        log(f"torch baseline failed: {e}")
        torch_sps = None

    flops_per_step = _step_flops()

    if jax_sps is None:
        print(json.dumps({
            "metric": METRIC,
            "value": round(torch_sps, 2) if torch_sps else 0.0,
            "unit": "steps/s",
            "vs_baseline": 1.0 if torch_sps else None,
            "device": "cpu-fallback-accelerator-unreachable",
        }))
        return
    vs = (jax_sps / torch_sps) if torch_sps else None
    rec = {
        "metric": METRIC,
        "value": round(jax_sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "device": device,
    }
    if flops_per_step:
        tflops = jax_sps * flops_per_step / 1e12
        rec["flops_per_step"] = flops_per_step
        rec["tflops"] = round(tflops, 4)
        from tneq_tpu.bench.flops import mxu_utilization, practical_utilization

        rec["mxu_util"] = round(mxu_utilization(tflops, "float32"), 6)
        rec["practical_util"] = round(practical_utilization(tflops), 6)
    print(json.dumps(rec))


if __name__ == "__main__":
    if "--tpu-attempt" in sys.argv:
        sys.exit(tpu_attempt())
    main()
