"""Pallas fused-chain kernel: win-or-shelve decision bench (VERDICT r3 #7).

The fused whole-sweep kernel measured at parity with the XLA scan on the
single-chain 32q dim-16 gradient step (CHAIN_KERNEL_r03.json: 344 direct /
295 mform / 312 pallas steps/s) — that workload is latency-bound and XLA
already pipelines it.  The kernel's roofline-favored regime is instead
SMALL-D, LARGE-BATCH forward sweeps: many independent chains per dispatch
(the chain sampler's per-site marginal evaluation over a G-point grid is
exactly this shape).  This driver times, on the real TPU:

- ``direct``: vmapped per-site einsum scan
  (``train/network_fit._chain_log_overlap``);
- ``mform``:  vmapped M-form XLA matvec scan (same math as the kernel);
- ``pallas``: vmapped fused whole-sweep kernel
  (``ops/chain_overlap.mv_chain_log_overlap_pallas``).

over (D, batch) grid points, forward only.  Decision rule (VERDICT): keep
the kernel if it beats the best XLA variant by >20% anywhere real,
otherwise mark it experimental in PARITY.md and stop maintaining it.

Channel protocol: fresh process, one patient first fetch under an alarm,
clean exit.  Pallas on the tunnel REQUIRES remote compile
(PALLAS_AXON_REMOTE_COMPILE=1, set here).  Prints ONE JSON line.

Usage: ``timeout -s TERM 2000 python -m tneq_tpu.bench.pallas_decision
[--qubits 32] [--configs 16x64,16x512,32x64] [--out FILE]``
"""

from __future__ import annotations

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
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--qubits", type=int, default=32)
    ap.add_argument("--configs", type=str, default="16x64,16x512,32x64",
                    help="comma list of DxB (bond dim x batch lanes); "
                         "kernel needs D*D %% 128 == 0, i.e. D in {16,32}")
    ap.add_argument("--repeats", type=int, default=300,
                    help="sweeps per timed dispatch (lax.scan)")
    ap.add_argument("--budget", type=int, default=1900)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(args.budget)
    os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")

    import numpy as np

    import tneq_tpu  # noqa: F401
    from ._tpulock import register_cli

    register_cli("pallas_decision")
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    v = float(jnp.ones((4,)).sum())
    print(f"first fetch {v} ({time.time() - t0:.0f}s)", file=sys.stderr,
          flush=True)
    device = jax.devices()[0].platform

    from tneq_tpu.graph import mps_graph, parse_graph
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.ops.chain_overlap import (
        chain_pair_to_mv,
        mv_chain_log_overlap,
        mv_chain_log_overlap_pallas,
    )
    from tneq_tpu.train.network_fit import _chain_cores, _chain_log_overlap

    n = args.qubits
    R = args.repeats
    results = []
    for spec in args.configs.split(","):
        D, B = (int(x) for x in spec.lower().split("x"))
        g = parse_graph(mps_graph(n, D, phys=2))
        rng = np.random.default_rng(0)
        # one base chain per lane, perturbed per lane (host numpy: the
        # axon backend cannot host-copy captured device arrays)
        base = jax.tree.map(
            np.asarray, init_params(g, jax.random.PRNGKey(0), jnp.float32)
        )
        stacked = {
            k: np.stack([
                v2 + 0.01 * rng.normal(size=v2.shape).astype(np.float32)
                for _ in range(B)
            ])
            for k, v2 in base.items()
        }
        names = g.core_names
        first = stacked[names[0]]
        mids = np.stack([stacked[nm] for nm in names[1:-1]], axis=1)
        last = stacked[names[-1]]

        def triple(f, m, l):
            return (f, m, l)

        def run_variant(name, one_lane):
            """one_lane(first, mids, last, i) -> scalar log-overlap; timed
            as R scan iterations of the vmapped form (iteration index
            folded into the lanes to defeat CSE)."""
            lanes = jax.vmap(one_lane, in_axes=(0, 0, 0, None))

            def body(acc, i):
                out = lanes(first_j, mids_j, last_j,
                            1.0 + 1e-6 * i.astype(jnp.float32))
                return acc + jnp.sum(out), None

            def timed():
                acc, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32),
                    jnp.arange(R, dtype=jnp.int32),
                )
                return acc

            first_j, mids_j, last_j = (jnp.asarray(first), jnp.asarray(mids),
                                       jnp.asarray(last))
            t0 = time.time()
            compiled = jax.jit(timed).lower().compile()
            compile_s = time.time() - t0
            t0 = time.time()
            val = float(compiled())  # final fetch = completion barrier
            wall = time.time() - t0
            sweeps = R * B
            return {
                "variant": name, "compile_s": round(compile_s, 1),
                "wall_s": round(wall, 3),
                "sweeps_per_sec": round(sweeps / wall, 1),
                "value": val,
            }

        def direct_lane(f, m, l, scale):
            a = (f * scale, m, l)
            return _chain_log_overlap(a, a)

        def mform_lane(f, m, l, scale):
            a = (f * scale, m, l)
            return mv_chain_log_overlap(*chain_pair_to_mv(a, a))

        def pallas_lane(f, m, l, scale):
            a = (f * scale, m, l)
            # interpret=None: compiled kernel on TPU, interpret elsewhere
            # (lets the CPU smoke test drive the same code path)
            return mv_chain_log_overlap_pallas(*chain_pair_to_mv(a, a),
                                               interpret=None)

        row = {"bond_dim": D, "batch": B, "qubits": n, "repeats": R}
        for name, lane in [("direct", direct_lane), ("mform", mform_lane),
                           ("pallas", pallas_lane)]:
            try:
                r = run_variant(name, lane)
            except Exception as e:
                r = {"variant": name,
                     "error": f"{type(e).__name__}: {str(e)[:150]}"}
            row[name] = r
            print(f"D={D} B={B} {name}: {r}", file=sys.stderr, flush=True)
        ok = [k for k in ("direct", "mform", "pallas")
              if "sweeps_per_sec" in row[k]]
        if "pallas" in ok:
            best_xla = max(
                (row[k]["sweeps_per_sec"] for k in ok if k != "pallas"),
                default=None,
            )
            if best_xla:
                row["pallas_speedup_vs_best_xla"] = round(
                    row["pallas"]["sweeps_per_sec"] / best_xla, 3
                )
        results.append(row)

    wins = [r.get("pallas_speedup_vs_best_xla") for r in results
            if r.get("pallas_speedup_vs_best_xla")]
    best = max(wins) if wins else None
    rec = {
        "metric": "pallas_fused_chain_best_speedup",
        "value": best,
        "unit": "x vs best XLA variant (>1.2 = keep)",
        "device": device,
        "decision": ("keep" if best and best > 1.2 else "shelve"),
        "grid": results,
    }
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
