"""Single-attempt opportunistic TPU benchmark (superseded by bench.py).

Measured tunnel protocol (2026-08-16, see CLAUDE.md): the FIRST device op
of a fresh process either blocks (observed 2s-282s) and then succeeds —
after which the process is healthy — or fails fast with ``UNIMPLEMENTED``,
after which the PJRT client is POISONED: every later op in that process
fails too, so in-process retries are useless.  complex64 ops are entirely
unsupported by the current plugin; keep TPU workloads float32/bfloat16.

This module makes ONE attempt under that protocol (patient first fetch,
then build + AOT-compile + a single timed execution with the final scalar
fetch as the completion barrier) and exits 0/1.  Loop it from a shell or
parent process for retries — ``bench.py`` at the repo root does exactly
that and is the canonical benchmark entry point.

Run: ``python -m tneq_tpu.bench.window_bench [--steps 400]``.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time


def log(msg: str) -> None:
    print(f"{time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


class _Timeout(Exception):
    pass


def _alarm(secs: int):
    def handler(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(secs)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--fetch-budget", type=int, default=950,
                    help="seconds to wait on the first (handshake) fetch "
                         "(a degraded-phase first fetch has taken 897s and "
                         "then succeeded, 2026-08-19)")
    args = ap.parse_args(argv)

    if os.environ.get("TNEQ_PLATFORM") != "cpu":
        # a CPU-forced run never touches the tunnel: no lock needed (and
        # taking one would false-BUSY against a live TPU client — seen as
        # a suite failure while a probe was running, docs/ROUND4.md)
        import atexit

        from ._tpulock import TpuBusy, acquire

        try:
            release = acquire("window_bench")
        except TpuBusy as e:
            log(f"TPU channel BUSY: {e} — refusing a second client")
            return 2
        atexit.register(release)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..graph import build_brick_wall_incidence, incidence_to_graph, parse_graph
    from ..model.qctn import init_params
    from ..ops.contract import make_core_only_fn
    from ..optim import sgdg
    from ..train.fit import identity_cores
    from ..train.losses import fidelity

    device = jax.devices()[0].platform
    log(f"devices: {jax.devices()}")

    try:
        _alarm(args.fetch_budget)
        t0 = time.time()
        v = float(jnp.ones((4,)).sum())
        signal.alarm(0)
        log(f"first fetch: {v} ({time.time() - t0:.1f}s) — channel healthy")
    except (_Timeout, Exception) as e:
        signal.alarm(0)
        log(f"first fetch failed ({type(e).__name__}); process is poisoned "
            "— exiting (retry = new process)")
        return 1

    # float32 variant of the 8q5c symmetry-breaking inner loop (complex64
    # is unsupported by the current tunnel plugin)
    steps = args.steps
    graph = parse_graph(incidence_to_graph(build_brick_wall_incidence(8, 5, 2)))
    core_fn = make_core_only_fn(graph)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    t_params = init_params(graph, k1, jnp.float32)
    mask = np.ones(graph.ncores, np.float32)
    mask[: graph.ncores // 2] = 0.0
    idents = identity_cores(graph, jnp.float32)
    eff = {
        n: jnp.asarray(mask[i], jnp.float32) * t_params[n]
        + jnp.asarray(1 - mask[i], jnp.float32) * idents[n]
        for i, n in enumerate(graph.core_names)
    }
    target = core_fn(eff)
    params = init_params(graph, k2, jnp.float32)
    opt = sgdg(1.0, momentum=0.9, stiefel=True)

    def run(params, target):
        def body(carry, _):
            p, s = carry
            with jax.default_matmul_precision("highest"):
                l, g = jax.value_and_grad(
                    lambda p, t: 1.0 - fidelity(core_fn(p), t)
                )(p, target)
            u, s = opt.update(g, s, p)
            return (jax.tree.map(lambda a, b: a + b, p, u), s), l

        return jax.lax.scan(
            body, (params, opt.init(params)), None, length=steps
        )[1][-1]

    try:
        _alarm(420)
        t0 = time.time()
        compiled = jax.jit(run).lower(params, target).compile()
        log(f"AOT compile: {time.time() - t0:.1f}s")
        t0 = time.time()
        infid = float(compiled(params, target))
        dt = time.time() - t0
        signal.alarm(0)
    except (_Timeout, Exception) as e:
        signal.alarm(0)
        log(f"measurement failed ({type(e).__name__}: {str(e)[:60]})")
        return 1

    log(f"TPU: {steps} steps in {dt:.3f}s (1-F={infid:.4f})")
    print(json.dumps({
        "metric": "stiefel_fidelity_train_steps_per_sec_8q5c_f32",
        "value": round(steps / dt, 2),
        "unit": "steps/s",
        "vs_baseline": None,
        "device": device,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
