"""QCTN merge/split demo: dynamic circuit-topology restructuring.

Rebuild of ``examples/example_qctn_merge_split.py``: split MPS / tree /
brick-wall circuits at core boundaries, merge them back, and verify the
weights carried across (printed as contraction-norm fingerprints instead of
the reference's matplotlib heatmaps — no display in this runtime).
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..graph.generators import example_graph
from ..model.qctn import QCTN

__all__ = ["main"]


def _fingerprint(q: QCTN) -> float:
    return float(
        sum(float(jnp.abs(v).sum()) for v in q.params.values())
    )


def demo(graph_type: str, n: int, dim: int, split_idx: Optional[int]) -> bool:
    src = example_graph(n, graph_type, dim)
    model = QCTN(src, key=jax.random.PRNGKey(0))
    print(f"=== {graph_type}: {model.nqubits} qubits, {model.ncores} cores ===")
    print(src)
    try:
        left, right = model.split(split_idx)
    except ValueError as e:
        # interleaved layouts legitimately refuse to split (reference
        # behavior, qctn.py:1347-1353) — informational, not a failure
        print(f"split not possible: {e}")
        return True
    print(f"split -> left {left.ncores} cores {list(left.cores)}, "
          f"right {right.ncores} cores {list(right.cores)}")
    merged = left.merge_with(right)
    print(f"merged -> {merged.ncores} cores on {merged.nqubits} qubits")

    fp_orig = _fingerprint(model)
    fp_merged = _fingerprint(merged)
    ok = abs(fp_orig - fp_merged) < 1e-3 * max(1.0, abs(fp_orig))
    print(f"weight fingerprint: original={fp_orig:.6f} merged={fp_merged:.6f} "
          f"({'carried' if ok else 'MISMATCH'})")
    return ok


def main(argv: Optional[Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(description="QCTN merge/split demo")
    p.add_argument("--num-qubits", type=int, default=6)
    p.add_argument("--dim", type=int, default=3)
    p.add_argument("--split-idx", type=int, default=None)
    p.add_argument("--graph-types", nargs="*",
                   default=["mps", "tree"])
    args = p.parse_args(argv)
    results = [
        demo(g, args.num_qubits, args.dim, args.split_idx)
        for g in args.graph_types
    ]
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
