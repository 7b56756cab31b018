"""32q chunk-amortization probe: end-to-end vs device-exec per step.

VERDICT r2 next #3's done-criterion: with K-step on-device chunks the 32q
fit end-to-end time should approach the device-exec time (round 2's
per-step host loop paid ~3x in tunnel round-trips: 4.8 s/step wall over
1.6-1.8 s/step device).

Method: build ONE masked network-fidelity fit (32q x 5c brick wall, f32,
row-sweep overlaps), prepare the target once, then time M dispatches of
the jitted K-step chunk for K in ``--chunks``.  Per-step wall vs K
separates the per-dispatch round-trip cost t_rt from the per-step device
cost t_exec:  wall/step = t_exec + t_rt / K.

Channel protocol per CLAUDE.md.  Prints ONE JSON line.
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


def run(args) -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from tneq_tpu.graph import (
        build_brick_wall_incidence,
        incidence_to_graph,
        parse_graph,
    )
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.optim import sgdg
    from tneq_tpu.train.network_fit import make_masked_network_fidelity_fit

    g = parse_graph(
        incidence_to_graph(build_brick_wall_incidence(args.n_qubits, 5))
    )
    fit = make_masked_network_fidelity_fit(
        g, sgdg(1e-2, momentum=0.9, stiefel=True),
        max_steps=10**9, tol=1e-3, dtype=jnp.float32, jit_scope="chunk",
    )
    params = init_params(g, jax.random.PRNGKey(0), jnp.float32)
    mask = jnp.ones((g.ncores,), jnp.float32)
    tmask = mask.at[3].set(0.0)

    t0 = time.time()
    target_eff_n, log_tt = fit.prepare(params, tmask)
    log_tt = float(log_tt)  # force completion
    prep_s = time.time() - t0
    log(f"prepare: {prep_s:.1f}s (log_tt={log_tt:.3f})")

    results = []
    for K in args.chunks:
        chunk = fit.chunk(K)
        opt_state = fit.make_opt_state(params)
        p = params
        t0 = time.time()
        p, opt_state, nlf = chunk(p, opt_state, mask, target_eff_n, log_tt)
        first = float(nlf)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.dispatches):
            p, opt_state, nlf = chunk(p, opt_state, mask, target_eff_n, log_tt)
            nlf_f = float(nlf)  # fetch = per-dispatch completion barrier
        dt = time.time() - t0
        steps = args.dispatches * K
        rec = {
            "K": K,
            "dispatches": args.dispatches,
            "steps": steps,
            "s_per_step": round(dt / steps, 3),
            "s_per_dispatch": round(dt / args.dispatches, 3),
            "compile_s": round(compile_s, 1),
            "nlf": nlf_f,
        }
        log(f"K={K}: {rec['s_per_step']} s/step end-to-end "
            f"({rec['s_per_dispatch']} s/dispatch, compile+1st "
            f"{compile_s:.0f}s, nlf {first:.3f}->{nlf_f:.3f})")
        results.append(rec)

    rec = {
        "bench": "chunk_probe",
        "config": f"{args.n_qubits}q5c_masked_network_fit_f32",
        "device": jax.devices()[0].platform,
        "prepare_s": round(prep_s, 1),
        "results": results,
    }
    # two-point separation: wall/step = t_exec + t_rt/K
    if len(results) >= 2:
        a, b = results[0], results[-1]
        if a["K"] != b["K"]:
            t_exec = (
                b["s_per_step"] * (1 / a["K"]) - a["s_per_step"] * (1 / b["K"])
            ) / (1 / a["K"] - 1 / b["K"])
            t_rt = (a["s_per_step"] - t_exec) * a["K"]
            rec["t_exec_per_step_s"] = round(t_exec, 3)
            rec["t_roundtrip_per_dispatch_s"] = round(t_rt, 3)
            rec["e2e_over_exec_at_max_K"] = round(
                b["s_per_step"] / max(t_exec, 1e-9), 2
            )
    return rec


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
        rec = run(args)
        signal.alarm(0)
    except Timeout:
        log("chunk_probe timed out (clean exit)")
        return 2
    except Exception as e:
        log(f"chunk_probe failed: {type(e).__name__}: {str(e)[:200]}")
        return 1
    print("RESULT " + json.dumps(rec), flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--n-qubits", type=int, default=32)
    p.add_argument("--chunks", type=int, nargs="+", default=[1, 16])
    p.add_argument("--dispatches", type=lambda s: max(1, int(s)), default=4)
    p.add_argument("--attempt", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.attempt:
        if args.cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        return attempt(args)

    cmd = [sys.executable, "-m", "tneq_tpu.bench.chunk_probe", "--attempt",
           "--n-qubits", str(args.n_qubits),
           "--dispatches", str(args.dispatches),
           "--chunks"] + [str(k) for k in args.chunks]
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
