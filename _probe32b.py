import sys, time, signal, os
def bail(sig, frm):
    print("ALARM", flush=True); os._exit(2)
signal.signal(signal.SIGALRM, bail)
signal.alarm(4000)

import jax, jax.numpy as jnp, numpy as np
t0=time.time(); v = float(jnp.ones((4,)).sum()); print(f"first fetch {v} ({time.time()-t0:.0f}s)", flush=True)

from tneq_tpu.graph import parse_graph, build_brick_wall_incidence, incidence_to_graph
from tneq_tpu.model.qctn import init_params
from tneq_tpu.optim import sgdg
from tneq_tpu.train.network_fit import make_masked_network_fidelity_fit

g = parse_graph(incidence_to_graph(build_brick_wall_incidence(32, 5)))
p = jax.tree.map(np.asarray, init_params(g, jax.random.PRNGKey(0), jnp.float32))
t = {n: v2 + 0.01*np.random.default_rng(1).normal(size=v2.shape).astype(np.float32) for n, v2 in p.items()}
fit = make_masked_network_fidelity_fit(
    g, sgdg(1e-2, momentum=0.9, stiefel=True), max_steps=500, tol=1e-3,
    dtype=jnp.float32, jit_scope="step")
mask = np.ones((g.ncores,), np.float32)
tmask = mask.copy(); tmask[::7] = 0.0
# warm-start from the (perturbed) target so the fit actually converges
t0=time.time()
res = fit(t, jnp.asarray(mask), t, jnp.asarray(tmask))
dt = time.time()-t0
steps = int(res.steps)
print(f"host-loop fit: {steps} steps in {dt:.1f}s -> {steps/max(dt,1e-9):.2f} steps/s, infid={float(res.infidelity):.3e}", flush=True)
