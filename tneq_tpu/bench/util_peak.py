"""MXU-utilization operating point: a REAL training step at large bond dim.

The ≥50%-MXU north star (BASELINE.md) cannot be met by the physics-regime
bond dims (D≤16: contraction width ~4–64 starves the 128-wide MXU — the
ceiling analysis in docs/ROUND2.md); it IS met by the same training step at
large D, where the transfer-matrix contractions become [D,D]x[D,4D] matmuls.
This runner measures the ACTUAL network-fidelity gradient step (the
``train/network_fit.py`` loss, same code path as the headline bench) across
a bond-dimension sweep and reports achieved TFLOP/s + fraction of the
measured practical peak per dtype — the measured evidence VERDICT r2
missing #2 asked for, replacing the extrapolated claim.

Channel protocol (CLAUDE.md): fresh subprocess per attempt, one patient
first fetch, internal alarms, clean exits, f32/bf16 only.

Usage: ``python -m tneq_tpu.bench.util_peak [--cpu] [--dims 64,256,512]``
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

CHILD_BUDGET_S = 2400


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class Timeout(Exception):
    pass


def _alarm(seconds: int):
    def handler(signum, frame):
        raise Timeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)


def measure(dims, n_qubits: int, dtype_name: str, flop_budget: float,
            phys: int = 2):
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    from tneq_tpu.bench.flops import (
        mxu_utilization,
        network_fidelity_step_flops,
        practical_utilization,
    )
    from tneq_tpu.graph import mps_graph, parse_graph
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.train.network_fit import network_log_fidelity

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    results = []
    for dim in dims:
        # physical legs stay small (default 2); only the BOND grows — the
        # canonical MPS whose transfer steps are [D,D]x[D,phys^2·D]
        # matmuls (a dim-coupled boundary grows cores as dim^4 and OOMs
        # the compiler past D=64)
        g = parse_graph(mps_graph(n_qubits, dim=dim, phys=min(phys, dim)))
        fl = network_fidelity_step_flops(g, dtype_name, gradient=True)
        # fixed FLOP budget per sweep point -> every point times a
        # comparable chunk of device work regardless of D
        steps_n = int(max(3, min(2000, flop_budget / fl)))
        k1, k2 = jrandom.split(jrandom.PRNGKey(0))
        target = init_params(g, k1, jnp.float32)
        params = {
            n: t + 0.01 * jrandom.normal(jrandom.fold_in(k2, i), t.shape)
            for i, (n, t) in enumerate(sorted(target.items()))
        }
        if dtype_name == "bfloat16":
            target = {k: v.astype(dtype) for k, v in target.items()}
            params = {k: v.astype(dtype) for k, v in params.items()}

        def loss(p, t):
            return -network_log_fidelity(g, p, t)

        def run(p, t):
            def body(c, _):
                l, gr = jax.value_and_grad(loss)(c, t)
                return jax.tree.map(lambda a, b: a - 1e-3 * b, c, gr), l

            return jax.lax.scan(body, p, None, length=steps_n)[1][-1]

        try:
            t0 = time.time()
            compiled = jax.jit(run).lower(params, target).compile()
            compile_s = time.time() - t0
            t0 = time.time()
            out = float(compiled(params, target))  # scalar fetch = barrier
            dt = time.time() - t0
        except Exception as e:
            # one dim failing (e.g. a remote-compile helper OOM) must not
            # sink the sweep; record and continue with the next point
            log(f"D={dim} failed: {type(e).__name__}: {str(e)[:120]}")
            results.append({"bond_dim": dim, "error": f"{type(e).__name__}"})
            continue
        sps = steps_n / dt
        tflops = sps * fl / 1e12
        rec = {
            "bond_dim": dim,
            "steps": steps_n,
            "steps_per_sec": round(sps, 3),
            "flops_per_step": fl,
            "tflops": round(tflops, 3),
            "mxu_util": round(mxu_utilization(tflops, dtype_name), 4),
            "practical_util": round(practical_utilization(tflops), 4),
            "compile_s": round(compile_s, 1),
            "wall_s": round(dt, 2),
            "final_loss": out,
        }
        log(f"D={dim}: {rec['tflops']} TFLOP/s "
            f"({100 * rec['mxu_util']:.1f}% of the bf16 MXU peak, "
            f"{100 * rec['practical_util']:.1f}% of the measured "
            f"chained-matmul ceiling), "
            f"{rec['steps_per_sec']} steps/s, compile {compile_s:.0f}s")
        results.append(rec)
    return results


def attempt(args) -> int:
    try:
        _alarm(CHILD_BUDGET_S)
        import jax
        import jax.numpy as jnp

        dev = jax.devices()[0].platform
        if dev != "cpu":
            t0 = time.time()
            v = float(jnp.ones((4,)).sum())
            log(f"first fetch: {v} ({time.time() - t0:.1f}s)")
        dims = [int(d) for d in args.dims.split(",")]
        results = measure(dims, args.n_qubits, args.dtype, args.flop_budget,
                          phys=args.phys)
        measured = [r for r in results if "mxu_util" in r]
        if not measured:
            raise RuntimeError("no sweep point measured")
        best = max(measured, key=lambda r: r["mxu_util"])
        rec = {
            "bench": "util_peak",
            "workload": f"network_fidelity_grad_step_{args.n_qubits}q_mps_phys{args.phys}",
            "dtype": args.dtype,
            "device": dev,
            "sweep": results,
            "peak_tflops": best["tflops"],
            "peak_mxu_util": best["mxu_util"],
            "peak_practical_util": best["practical_util"],
            "peak_bond_dim": best["bond_dim"],
        }
        signal.alarm(0)
    except Timeout:
        log("util_peak attempt timed out (clean exit)")
        return 2
    except Exception as e:
        log(f"util_peak attempt failed: {type(e).__name__}: {str(e)[:200]}")
        return 1
    print("RESULT " + json.dumps(rec), flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--dims", type=str, default="16,64,256,512,1024")
    p.add_argument("--n-qubits", type=int, default=16)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--phys", type=int, default=2,
                   help="physical (boundary) leg rank; bonds carry --dims")
    p.add_argument("--flop-budget", type=float, default=4e13,
                   help="timed FLOPs per sweep point (sets the step count)")
    p.add_argument("--attempt", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.attempt:
        if args.cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        return attempt(args)

    cmd = [sys.executable, "-m", "tneq_tpu.bench.util_peak", "--attempt",
           "--dims", args.dims, "--n-qubits", str(args.n_qubits),
           "--dtype", args.dtype, "--flop-budget", str(args.flop_budget),
           "--phys", str(args.phys)]
    if args.cpu:
        cmd.append("--cpu")
    env = dict(os.environ)
    if args.cpu:
        env["TNEQ_PLATFORM"] = "cpu"
    # stream the child's stderr live (long runs were previously silent
    # until completion); only stdout (the RESULT line) is captured
    from ._subproc import run_term_bounded

    r = run_term_bounded(cmd, timeout=CHILD_BUDGET_S + 120, env=env)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line[len("RESULT "):])
            return 0
    print(json.dumps({"ok": False, "rc": r.returncode}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
