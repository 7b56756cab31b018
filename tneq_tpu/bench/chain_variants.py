"""TPU probe: chain-overlap variant head-to-head at the headline scale.

Times the 32q dim-16 network-log-fidelity gradient scan (bench.py's
measured program) with each of the three chain-overlap executors:

- ``direct``: the default per-site einsum ``lax.scan``
  (``train/network_fit._chain_log_overlap``);
- ``mform``:  M-form transfer matrices + XLA matvec scan
  (``ops/chain_overlap.mv_chain_log_overlap``);
- ``pallas``: M-form + the fused whole-sweep Pallas kernel
  (``ops/chain_overlap.mv_chain_log_overlap_pallas``).

Measured 2026-08-17 (recorded in ``CHAIN_KERNEL_r03.json``): direct 344,
mform 295, pallas 312 steps/s — which is why the direct scan is the
default and the fused kernel is opt-in (``TNEQ_CHAIN_PALLAS=1``).

Usage: ``python -m tneq_tpu.bench.chain_variants`` (channel protocol:
fresh process, one patient first fetch, internal alarm, clean exit).
"""
import os
import signal
import time


def _bail(sig, frm):
    print("ALARM", flush=True)
    os._exit(2)


def main() -> int:
    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(1800)

    import numpy as np

    import jax
    import jax.numpy as jnp

    t0 = time.time()
    v = float(jnp.ones((4,)).sum())
    print(f"first fetch {v} ({time.time()-t0:.0f}s)", flush=True)

    from tneq_tpu.graph import mps_graph, parse_graph
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.ops.chain_overlap import (
        chain_pair_to_mv,
        mv_chain_log_overlap,
        mv_chain_log_overlap_pallas,
    )
    from tneq_tpu.train.network_fit import _chain_cores, _chain_log_overlap, _normalize

    g = parse_graph(mps_graph(32, dim=16))
    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    # host numpy constants (the axon backend cannot host-copy captured
    # device arrays during lowering)
    t = jax.tree.map(np.asarray, init_params(g, k1, jnp.float32))
    p = {
        n: v2 + 0.01 * np.random.default_rng(i).normal(size=v2.shape).astype(np.float32)
        for i, (n, v2) in enumerate(sorted(t.items()))
    }
    lr = 1e-3
    n_steps = 2000

    def make_steps(overlap3):
        def loss(pp, tt):
            pn, tn = _normalize(pp), _normalize(tt)
            pc, tc = _chain_cores(g, pn), _chain_cores(g, tn)
            return -(2.0 * overlap3(pc, tc) - overlap3(pc, pc)
                     - overlap3(tc, tc))

        def steps(pp, tt):
            def body(c, _):
                l, gr = jax.value_and_grad(loss)(c, tt)
                return jax.tree.map(lambda a, b: a - lr * b, c, gr), l

            return jax.lax.scan(body, pp, None, length=n_steps)[1][-1]

        return steps

    from tneq_tpu.train.network_fit import _chain_log_overlap_batched

    def make_steps_batched(nb):
        """nb=2: ov+oo in ONE batched scan, tt separate (loop-invariant,
        hoisted by XLA); nb=3: all three in one batched scan."""

        def loss(pp, tt):
            pn, tn = _normalize(pp), _normalize(tt)
            pc, tc = _chain_cores(g, pn), _chain_cores(g, tn)
            if nb == 2:
                lv, lo = _chain_log_overlap_batched([(pc, tc), (pc, pc)])
                lt = _chain_log_overlap(tc, tc)
            else:
                lv, lo, lt = _chain_log_overlap_batched(
                    [(pc, tc), (pc, pc), (tc, tc)])
            return -(2.0 * lv - lo - lt)

        def steps(pp, tt):
            def body(c, _):
                l, gr = jax.value_and_grad(loss)(c, tt)
                return jax.tree.map(lambda a, b: a - lr * b, c, gr), l

            return jax.lax.scan(body, pp, None, length=n_steps)[1][-1]

        return steps

    variants = [
        ("direct", _chain_log_overlap),
        ("mform", lambda a, b: mv_chain_log_overlap(*chain_pair_to_mv(a, b))),
        ("pallas", lambda a, b: mv_chain_log_overlap_pallas(
            *chain_pair_to_mv(a, b), interpret=False)),
        ("direct-b2", None),
        ("direct-b3", None),
    ]
    for name, ov in variants:
        try:
            if name == "direct-b2":
                fn = make_steps_batched(2)
            elif name == "direct-b3":
                fn = make_steps_batched(3)
            else:
                fn = make_steps(ov)
            t0 = time.time()
            compiled = jax.jit(fn).lower(p, t).compile()
            tc_ = time.time() - t0
            t0 = time.time()
            out = float(compiled(p, t))  # final fetch = completion barrier
            dt = time.time() - t0
            print(f"{name}: compile {tc_:.1f}s, {n_steps} steps in {dt:.2f}s"
                  f" -> {n_steps/dt:.1f} steps/s (loss={out:.4f})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
