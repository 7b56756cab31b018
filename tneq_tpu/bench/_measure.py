"""Shared timing heuristics for the TPU-tunnel probes.

One definition so bench.py and the probes measure under the same rule —
artifacts produced by different runners stay comparable.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["REMEASURE_FAST_S", "remeasure_steps"]

# A timed program that finishes faster than this is dominated by the one
# dispatch+fetch round-trip, not device execution.
REMEASURE_FAST_S = 2.0


def remeasure_steps(base_steps: int, dt: float,
                    cap: int = 20000, floor: int = 1000) -> Optional[int]:
    """Scan length for a second timing pass when the first program outran
    the tunnel round-trip (``dt < REMEASURE_FAST_S``): long enough that
    device exec is >=90 % of the wall.  ``None`` = no re-measure needed."""
    if dt >= REMEASURE_FAST_S:
        return None
    return min(cap, max(floor, int(base_steps * 8.0 / dt)))
