"""TPU probe: 30-qubit MPS inverse-CDF sampling via the chain sweep sampler.

Round 3 measured the O(1)-compile chain sampler (``infer/chain_sampling.py``)
at 4.5 s for 32 draws x 30 qubits on the CPU backend; this probe records the
same workload on the real TPU (the sampler dispatches a HANDFUL of compiled
per-site programs, so the tunnel round-trip — not compute — dominates;
reference counterpart: ``engine_siamese.py:740-915`` dense per-qubit env,
which cannot reach 30 qubits at all).

Channel protocol (CLAUDE.md): fresh process, one patient first fetch under an
alarm, clean exits only.  Prints ONE JSON line on success.

Usage: ``python -m tneq_tpu.bench.sample_probe [--qubits N] [--samples S]``
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
    p = argparse.ArgumentParser()
    p.add_argument("--qubits", type=int, default=30)
    p.add_argument("--dim", type=int, default=2)
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--grid", type=int, default=100)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args(argv)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(1500)

    import numpy as np

    import tneq_tpu  # noqa: F401  (honors TNEQ_PLATFORM before any device op)
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    v = float(jnp.ones((4,)).sum())
    print(f"first fetch {v} ({time.time() - t0:.0f}s)", file=sys.stderr,
          flush=True)

    from tneq_tpu.graph import mps_graph, parse_graph
    from tneq_tpu.infer.sampling import sample
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.train.trainer import basis_states

    g = parse_graph(mps_graph(args.qubits, dim=args.dim))
    params = init_params(g, jax.random.PRNGKey(0), jnp.float32)
    params = {k: 8.0 * v for k, v in params.items()}
    states = basis_states(g, dtype=jnp.float32)
    kw = dict(num_samples=args.samples, K=args.dim,
              key=jax.random.PRNGKey(1), grid_size=args.grid,
              dtype=jnp.float32)

    # cold: includes every per-site compile; warm: same programs cached
    t0 = time.time()
    out = sample(g, params, states, **kw)
    arr = np.asarray(out)
    cold_s = time.time() - t0
    t0 = time.time()
    out = sample(g, params, states,
                 key=jax.random.PRNGKey(2),
                 **{k: v for k, v in kw.items() if k != "key"})
    arr2 = np.asarray(out)
    warm_s = time.time() - t0

    ok = (arr.shape == (args.samples, args.qubits)
          and np.isfinite(arr).all() and np.isfinite(arr2).all())
    rec = {
        "probe": "chain_sampler_tpu",
        "device": jax.devices()[0].platform,
        "qubits": args.qubits,
        "dim": args.dim,
        "num_samples": args.samples,
        "grid_size": args.grid,
        "cold_s": round(cold_s, 2),
        "warm_s": round(warm_s, 2),
        "finite": bool(ok),
        "distinct_values": int(len(np.unique(arr.round(3)))),
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    signal.alarm(0)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
