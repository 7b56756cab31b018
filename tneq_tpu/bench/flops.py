"""Exact FLOP accounting for contraction workloads.

The reference's benchmark tooling always reports achieved GFLOPS against a
theoretical peak (``tools/stage2_compute_benchmark/test_single_cmg_peak.py:1-60``);
round 1 of this rebuild reported only steps/s.  This module provides the
missing FLOP model so every bench stage can report achieved TFLOP/s and
%-of-peak (the BASELINE.md >=50% MXU north-star metric).

Conventions:
- one real multiply-add = 2 FLOPs;
- a complex multiply-add = 8 real FLOPs (4 mult + 4 add);
- a pairwise einsum step costs ``2 * prod(union-of-index sizes)``;
- a gradient step costs ``3x`` the forward contraction (each pairwise
  product's VJP is two products of the same size — the deep-learning
  fwd:bwd = 1:2 rule, exact for multilinear contractions).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "einsum_flops",
    "overlap_flops",
    "network_fidelity_step_flops",
    "PEAK_TFLOPS",
    "mxu_utilization",
]

# Single-chip peaks for utilization reporting.  The v5e MXU computes in
# bf16 (~197 TFLOP/s theoretical); under JAX's DEFAULT matmul precision,
# float32 (and complex64, via real pairs) arrays are ALSO fed through
# single-pass bf16 MXU ops with f32 accumulation, so their utilization
# denominator is the same 197 — measured proof: the D=256 f32 training
# step sustains 66.9 TFLOP/s (MXU_r03.json), far above the 50 TFLOP/s
# that round 1's HIGHEST-precision chained-matmul probe measured and
# round 2 wrongly used as the f32 denominator.  "highest" precision f32
# runs ~6 bf16 passes per product (peak ≈ 197/6).  The measured
# practical ceiling of chained large matmuls on this chip is
# MEASURED_MATMUL_TFLOPS (docs/ROUND1.md) — utilization against it is
# the honest "fraction of what this chip actually delivers" number.
PEAK_TFLOPS: Dict[str, float] = {
    "bfloat16": 197.0,
    "float32": 197.0,
    "complex64": 197.0,
}
PEAK_TFLOPS_HIGHEST: Dict[str, float] = {
    "bfloat16": 197.0,
    "float32": 197.0 / 6.0,
    "complex64": 197.0 / 6.0,
}
# precision='high' = bf16x3 (3 passes per product, ~f32 accuracy)
PEAK_TFLOPS_HIGH: Dict[str, float] = {
    "bfloat16": 197.0,
    "float32": 197.0 / 3.0,
    "complex64": 197.0 / 3.0,
}
# chained 8192^2 bf16 matmuls measured on this chip (round 1/2)
MEASURED_MATMUL_TFLOPS = 133.5


def _complex_factor(dtype) -> float:
    return 4.0 if np.issubdtype(np.dtype(dtype), np.complexfloating) else 1.0


def einsum_flops(
    equation: str,
    shapes: Sequence[Tuple[int, ...]],
    path: Optional[Sequence[Tuple[int, int]]] = None,
    dtype=np.float32,
) -> float:
    """Exact FLOPs of executing ``equation`` along ``path`` (default: the
    same memory-guarded path the runtime uses, so the count matches what
    actually runs)."""
    from ..ops.pairwise import choose_path, path_flops

    shapes = tuple(tuple(int(d) for d in s) for s in shapes)
    if path is None:
        path = choose_path(equation, shapes)
    return path_flops(equation, shapes, list(path)) * _complex_factor(dtype)


def overlap_flops(graph, dtype=np.float32) -> float:
    """Forward FLOPs of one two-network overlap ⟨A, B⟩ of ``graph`` with
    itself, counted along the path that actually executes: the rescaled
    transfer-matrix SCAN for uniform MPS chains (= the linear sweep path),
    else the pairwise executor's chosen path
    (``ops/pairwise.make_log_abs_overlap_fn``)."""
    from ..ops.einsum_spec import two_network_spec
    from ..ops.mps_sweep import is_mps_chain
    from ..ops.pairwise import _linear_path, row_major_core_order

    spec = two_network_spec(graph, graph)
    lhs, rhs = spec.equation.split("->")
    subs = lhs.split(",")
    n = graph.ncores
    order = row_major_core_order(graph)
    perm = []
    for k in order:
        perm.extend((k, n + k))
    equation = ",".join(subs[p] for p in perm) + "->" + rhs
    shapes = []
    for k in order:
        s = graph.cores[k].shape
        shapes.extend((s, s))
    path = _linear_path(len(shapes)) if is_mps_chain(graph) else None
    return einsum_flops(equation, shapes, path=path, dtype=dtype)


def network_fidelity_step_flops(
    graph, dtype=np.float32, gradient: bool = True
) -> float:
    """FLOPs of one network-fidelity training step.

    Forward = 3 overlaps (⟨p,t⟩, ⟨p,p⟩, ⟨t,t⟩).  The gradient step counts
    only what the measured program actually executes: ⟨t,t⟩ is
    loop-invariant (hoisted out of the training scan, and never
    differentiated), so per step fwd = 2 overlaps and bwd = 2·2 overlaps —
    the 6x model ``flagship.py``/``microbench.py`` use.  (The previous 9x
    model charged all 3 overlaps a backward and inflated tflops/mxu_util
    ~1.5x — ADVICE r2.)
    """
    ov = overlap_flops(graph, dtype)
    if not gradient:
        return 3.0 * ov
    return 6.0 * ov


def siamese_flops(
    graph, batch: int, dtype=np.float32, gradient: bool = False
) -> float:
    """Forward FLOPs of the batched siamese Born-rule contraction."""
    from ..ops.einsum_spec import siamese_spec

    spec = siamese_spec(graph, with_states=True, states_batched=False)
    shapes = []
    for kind, key in spec.operands:
        if kind in ("core", "core_conj"):
            shapes.append(graph.shapes[key])
        elif kind in ("state", "state_conj"):
            shapes.append((graph.input_ranks[key],))
        else:
            r = graph.output_ranks[key]
            shapes.append((batch, r, r))
    fwd = einsum_flops(spec.equation, shapes, dtype=dtype)
    return fwd * (3.0 if gradient else 1.0)


def mxu_utilization(
    tflops_achieved: float, dtype=np.float32, precision: str = "default"
) -> float:
    """Fraction of the single-chip MXU peak for this dtype/precision.

    ``precision='default'`` (JAX default: single-pass bf16 MXU for every
    dtype) divides by the bf16 theoretical peak; ``'high'`` by the 3-pass
    bf16x3 peak; ``'highest'`` by the 6-pass-f32 peak.
    """
    key = np.dtype(dtype).name
    table = {
        "highest": PEAK_TFLOPS_HIGHEST,
        "high": PEAK_TFLOPS_HIGH,
    }.get(precision, PEAK_TFLOPS)
    peak = table.get(key, table["float32"])
    return tflops_achieved / peak


def practical_utilization(tflops_achieved: float) -> float:
    """Fraction of this chip's MEASURED chained-matmul throughput
    (133.5 TFLOP/s bf16) — what the hardware demonstrably delivers when
    fed pure large matmuls."""
    return tflops_achieved / MEASURED_MATMUL_TFLOPS
