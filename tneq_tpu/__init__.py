"""tneq_tpu — TPU-native Quantum Circuit Tensor Network (QCTN) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``yuchencong/quantum_circuits_symmetry_breaking_based_on_tneq-qc``:

- ASCII graph-DSL circuit description -> immutable :class:`CircuitGraph`
  (reference: ``tneq_qc/core/qctn.py:456-760``)
- Siamese Born-rule contraction engine with Hermite-polynomial feature maps
  (reference: ``tneq_qc/core/engine_siamese.py``)
- Riemannian (Stiefel / Cayley) optimizers as optax-style transforms
  (reference: ``tneq_qc/optim/stiefel_optimizer_complex.py``)
- Probability / sampling inference APIs
- Mesh-sharded data/model parallelism via ``jax.sharding`` (replaces the
  reference's MPI / torch.distributed stack, ``tneq_qc/distributed/``)
- Genetic circuit-structure search (replaces the MPI overlord/agent farm,
  ``tneq_qc/distributed/mpi_*.py``)
- The symmetry-breaking pruning experiment (``symmetry_breaking_quantum.py``)

Design: one contraction engine, pure functions, static shapes, everything hot
inside ``jax.jit``; no translation of the reference's torch/MPI patterns.
"""

__version__ = "0.1.0"

import os as _os

# This container's axon tunnel rejects locally-AOT-compiled Pallas kernels
# (libtpu version mismatch); its remote-compile path must be opted into via
# env var BEFORE the first kernel compile.  Harmless everywhere else.
_os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")

if _os.environ.get("TNEQ_PLATFORM"):
    # Honor an explicit platform request even where site hooks force a
    # different jax_platforms value after the JAX_PLATFORMS env var was
    # already consumed (e.g. this container's accelerator tunnel shim).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TNEQ_PLATFORM"])

if _os.environ.get("TNEQ_COMPILE_CACHE"):
    # Opt-in persistent XLA compilation cache.  The channel protocol runs
    # every TPU attempt in a FRESH subprocess (CLAUDE.md), so without this
    # each attempt repays the same 20-40 s of compiles; with it, retries
    # and repeated probes reuse the serialized executables.
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir", _os.environ["TNEQ_COMPILE_CACHE"]
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from .graph import CircuitGraph, Edge, CoreSpec, parse_graph
from .model import QCTN
