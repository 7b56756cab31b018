"""Two-process jax.distributed dry run on CPU devices.

Exercises ``parallel/multihost.py`` initialization END TO END (not just
env-var parsing): the parent spawns 2 worker processes, each with 4 virtual
CPU devices; workers call ``initialize_multihost()`` (coordinator handshake
over TCP), build the GLOBAL 8-device ``data x model`` mesh, and run one
jitted sliced-siamese training step on globally-sharded arrays — the same
program ``__graft_entry__.dryrun_multichip`` runs single-process.  This is
the rebuild's analogue of the reference's real multi-process launch path
(``comm_factory.py:203-243`` auto-detect + ``distributed_trainer.py`` MPI
startup).

Run: ``python -m tneq_tpu.bench.multiproc_dryrun`` (parent mode); prints one
JSON line ``{"ok": true, "n_processes": 2, "n_devices": 8, "loss": ...}``.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

__all__ = ["main", "worker"]

N_PROCESSES = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker() -> int:
    """Child-process entry (env prepared by the parent)."""
    import numpy as np

    from tneq_tpu.parallel.multihost import (
        initialize_multihost,
        is_main_process,
    )

    ok = initialize_multihost()
    assert ok, "initialize_multihost() found no coordinator settings"

    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    assert len(devs) == N_PROCESSES * LOCAL_DEVICES, devs
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tneq_tpu.graph import parse_graph, wall_graph
    from tneq_tpu.model.qctn import init_params
    from tneq_tpu.ops import measurement_matrices
    from tneq_tpu.ops.contract import abs_square
    from tneq_tpu.optim import sgdg
    from tneq_tpu.parallel import make_mesh, make_sliced_siamese_fn
    from tneq_tpu.train.losses import nll_loss
    from tneq_tpu.train.trainer import basis_states

    mesh = make_mesh({"data": 4, "model": 2}, devices=devs)
    graph = parse_graph(wall_graph(4, layers=2, dim=2))

    # params must reach jit as host (numpy) values: every process holds the
    # same copy and GSPMD replicates them; process-local device arrays are
    # not valid global inputs in multi-controller JAX
    params = jax.tree.map(
        np.asarray, init_params(graph, jax.random.PRNGKey(0), jnp.complex64)
    )
    states = [np.asarray(s) for s in basis_states(graph, dtype=jnp.complex64)]
    optimizer = sgdg(0.05, momentum=0.9, stiefel=True)
    contraction = make_sliced_siamese_fn(
        graph, mesh, model_axis="model", data_axis="data"
    )

    def loss_fn(params, measures):
        raw = contraction(params, [jnp.asarray(s) for s in states], measures)
        return nll_loss(abs_square(raw))

    @jax.jit
    def train_step(params, x):
        mx = measurement_matrices(x, 2).astype(jnp.complex64)
        measures = [mx[:, q] for q in range(graph.nqubits)]
        opt_state = optimizer.init(params)
        loss, grads = jax.value_and_grad(loss_fn)(params, measures)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, loss

    # batch globally sharded over 'data': each process contributes its half
    global_batch = 8
    local = np.asarray(
        np.random.default_rng(jax.process_index()).normal(
            size=(global_batch // N_PROCESSES, graph.nqubits)
        ),
        np.float32,
    )
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )
    new_params, loss = train_step(params, x)
    jax.block_until_ready(loss)
    val = float(loss)
    assert np.isfinite(val), val
    if is_main_process():
        print(
            "RESULT "
            + json.dumps({
                "ok": True,
                "n_processes": N_PROCESSES,
                "n_devices": len(devs),
                "mesh": dict(mesh.shape),
                "loss": val,
            }),
            flush=True,
        )
    return 0


def main() -> int:
    port = _free_port()
    procs = []
    for rank in range(N_PROCESSES):
        env = dict(os.environ)
        env.update({
            "TNEQ_PLATFORM": "cpu",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": str(N_PROCESSES),
            "JAX_PROCESS_ID": str(rank),
        })
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "tneq_tpu.bench.multiproc_dryrun",
                 "--worker"],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    result = None
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            rc = 1
        if p.returncode != 0:
            rc = 1
            sys.stderr.write(f"--- worker {i} rc={p.returncode} ---\n{err}\n")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                result = json.loads(line[len("RESULT "):])
    if result is None:
        result = {"ok": False, "n_processes": N_PROCESSES}
        rc = rc or 1
    print(json.dumps(result))
    return rc


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.exit(worker())
    sys.exit(main())
