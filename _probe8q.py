import sys, time, signal, os
def bail(sig, frm):
    print("ALARM", flush=True); os._exit(2)
signal.signal(signal.SIGALRM, bail)
signal.alarm(2400)
import jax, jax.numpy as jnp, numpy as np
if "cpu" in sys.argv:
    # BEFORE any jax op: backends are cached after first use, so a fetch
    # here would pin the axon backend for the whole process
    jax.config.update("jax_platforms", "cpu")
    print("platform: cpu", flush=True)
else:
    t0=time.time(); v=float(jnp.ones((2,)).sum()); print(f"fetch {v} ({time.time()-t0:.0f}s)", flush=True)
from tneq_tpu.apps.symmetry_breaking import (SymmetryBreakingConfig, make_experiment,
    target_tensor_init, validate_target_tensor)
import sys as _sys
pair = "pair" in _sys.argv
scope = "step" if "step" in _sys.argv else "fit"
cfg = SymmetryBreakingConfig(n_qubits=8, n_cells=5,
                             dtype=jnp.complex64 if pair else jnp.float32,
                             complex_as_real=pair,
                             validate_steps=1500 if pair else 4000,
                             fit_jit_scope=scope)
print("scope:", scope, flush=True)
print("mode:", "pair" if pair else "f32", flush=True)
exp = make_experiment(cfg)
tm = [2,3,5,8,9,12,13,14,15,17,18,20,21,23,25,26,29,31,32,33]
key = jax.random.PRNGKey(0)
for t in range(3):
    key, k1, k2 = jax.random.split(key, 3)
    tgt = target_tensor_init(exp, tm, k1)
    t0=time.time()
    ok, fid, steps = validate_target_tensor(exp, tgt, k2)
    print(f"try {t}: fid={fid:.6f} steps={steps} ok={ok} ({time.time()-t0:.0f}s)", flush=True)
    if ok:
        break
