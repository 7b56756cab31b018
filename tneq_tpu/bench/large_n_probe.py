"""TPU probe: network-fidelity training + sampling BEYOND the reference's
reachable scale (64/128 qubits).

The reference's dense/raw-overlap paths stop near ~24-30 qubits (float32
under/overflow, per-qubit env programs); this framework's log-space chain
scan (``train/network_fit``) and O(1)-compile sweep sampler
(``infer/chain_sampling``) have per-qubit cost and constant program size,
so 64q/128q run the same way 32q does.  This probe records that on the
real TPU: fit steps/s at n qubits + one fused-sweep sampling call.

Channel protocol (CLAUDE.md): fresh process, one patient first fetch
under an alarm, float32, clean exits only.  Prints ONE JSON line.

Usage: ``timeout -s TERM 1700 python -m tneq_tpu.bench.large_n_probe
[--qubits N] [--dim D] [--out FILE]``
"""
import argparse
import json
import os
import signal
import sys
import time


def _bail(sig, frm):
    print("ALARM", flush=True)
    os._exit(2)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=64)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(1500)

    import numpy as np

    import tneq_tpu  # noqa: F401  (honors TNEQ_PLATFORM before any device op)
    from ._tpulock import register_cli

    register_cli(f"large_n_probe q={args.qubits}")
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    v = float(jnp.ones((4,)).sum())
    print(f"first fetch {v} ({time.time() - t0:.0f}s)", file=sys.stderr,
          flush=True)
    device = jax.devices()[0].platform

    from tneq_tpu.graph import mps_graph, parse_graph
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.train.network_fit import network_log_fidelity

    n, D = args.qubits, args.dim
    g = parse_graph(mps_graph(n, D, phys=2))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # host numpy constants: the axon backend cannot host-copy captured
    # device arrays during jit lowering
    target = jax.tree.map(np.asarray, init_params(g, k1, jnp.float32))
    params = {
        nm: t + 0.01 * np.random.default_rng(i).normal(
            size=t.shape).astype(np.float32)
        for i, (nm, t) in enumerate(sorted(target.items()))
    }

    def loss(p, t):
        return -network_log_fidelity(g, p, t)

    def make_steps(n_steps):
        def steps(p, t):
            def body(c, _):
                l, gr = jax.value_and_grad(loss)(c, t)
                return jax.tree.map(lambda a, b: a - 1e-3 * b, c, gr), l

            return jax.lax.scan(body, p, None, length=n_steps)[1][-1]

        return steps

    t0 = time.time()
    compiled = jax.jit(make_steps(args.steps)).lower(params, target).compile()
    print(f"fit compile {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    out = float(compiled(params, target))  # final fetch = completion barrier
    dt = time.time() - t0
    from tneq_tpu.bench._measure import remeasure_steps

    n_timed = args.steps
    n2 = remeasure_steps(args.steps, dt) if device != "cpu" else None
    if n2 is not None:
        # round-trip-dominated: re-measure with a scan long enough that
        # device exec is >=90% of the wall (shared rule: bench/_measure.py)
        n_timed = n2
        print(f"fast program ({dt:.2f}s): re-measuring {n_timed} steps",
              file=sys.stderr, flush=True)
        c2 = jax.jit(make_steps(n_timed)).lower(params, target).compile()
        t0 = time.time()
        out = float(c2(params, target))
        dt = time.time() - t0
    sps = n_timed / dt
    print(f"{n}q dim-{D} fit: {n_timed} steps in {dt:.2f}s -> "
          f"{sps:.1f} steps/s (-logF={out:.4f})", file=sys.stderr, flush=True)

    # one fused-sweep sampling call (cold includes its handful of compiles)
    from tneq_tpu.infer.sampling import sample

    K = g.output_ranks[0]
    states = [np.eye(K, dtype=np.float32)[0] for _ in range(n)]
    t0 = time.time()
    s = sample(g, target, states, num_samples=args.samples, K=K,
               key=jax.random.PRNGKey(3), dtype=jnp.float32)
    s_host = np.asarray(s)
    t_cold = time.time() - t0
    t0 = time.time()
    s2 = sample(g, target, states, num_samples=args.samples, K=K,
                key=jax.random.PRNGKey(4), dtype=jnp.float32)
    np.asarray(s2)
    t_warm = time.time() - t0
    finite = bool(np.isfinite(s_host).all())
    print(f"{n}q sample x{args.samples}: cold {t_cold:.1f}s, warm "
          f"{t_warm:.2f}s, finite={finite}", file=sys.stderr, flush=True)

    rec = {
        "metric": f"large_n_network_fit_{n}q_dim{D}",
        "value": round(sps, 2),
        "unit": "steps/s",
        "device": device,
        "steps_timed": n_timed,
        "final_neg_logF": round(out, 6),
        "sample_cold_s": round(t_cold, 2),
        "sample_warm_s": round(t_warm, 3),
        "sample_finite": finite,
        "samples": args.samples,
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    signal.alarm(0)
    return 0 if finite else 1


if __name__ == "__main__":
    raise SystemExit(main())
