"""TPU benchmark suite — the analogue of the reference's ``tools/`` stages.

Reference seven-stage Fugaku audit (``tools/run_all_fugaku_tests.sh``):
env audit, compute peak, memory bandwidth, intra-node, communication, IO +
TN workload, inter-node.  Here each stage is a function returning a JSON
record, targeting the TPU equivalents: MXU matmul peak, HBM bandwidth,
transpose cost, ICI collective latency/bandwidth over the mesh, checkpoint
IO, and end-to-end QCTN contraction throughput.

Run: ``python -m tneq_tpu.bench.run_all [--stages 1,2,...] [--out DIR]``.
"""

from .microbench import (
    stage_env_audit,
    stage_matmul_peak,
    stage_dtype_policy,
    stage_memory_bandwidth,
    stage_transpose_cost,
    stage_collectives,
    stage_checkpoint_io,
    stage_tn_workload,
    stage_large_network,
    ALL_STAGES,
)

__all__ = [
    "stage_env_audit",
    "stage_matmul_peak",
    "stage_dtype_policy",
    "stage_memory_bandwidth",
    "stage_transpose_cost",
    "stage_collectives",
    "stage_checkpoint_io",
    "stage_tn_workload",
    "stage_large_network",
    "ALL_STAGES",
]
