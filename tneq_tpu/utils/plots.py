"""Visual diagnostics: marginal-probability heatmap + sampling scatter PNGs.

Parity with the reference's plotting diagnostics
(``tests/test_probabilities.py:197-341``): ``test_heatmap_marginal``
renders P(q0, q1) over a 2-D value grid as a ``hot`` heatmap, and
``test_sampling`` scatters the first two coordinates of inverse-CDF
samples.  This runtime has no display, so everything renders through the
Agg backend straight to PNG files.

Usage::

    from tneq_tpu.utils.plots import marginal_heatmap_png, sampling_scatter_png
    marginal_heatmap_png(graph, params, "heatmap.png")
    sampling_scatter_png(samples, "scatter.png")
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["marginal_grid", "marginal_heatmap_png", "sampling_scatter_png"]


def _plt():
    import matplotlib

    matplotlib.use("Agg")  # no display in this runtime
    import matplotlib.pyplot as plt

    return plt


def marginal_grid(
    graph,
    params,
    qubits: Tuple[int, int] = (0, 1),
    edge_size: int = 100,
    K: Optional[int] = None,
    bounds: Tuple[float, float] = (-5.0, 5.0),
    states: Optional[Sequence] = None,
    dtype=None,
) -> np.ndarray:
    """``(edge_size, edge_size)`` marginal probability P(x_q0, x_q1) over a
    uniform value grid (reference grid construction:
    ``test_probabilities.py:219-237`` — cell-centered, step = span/edge).

    Identity operators trace out every other qubit, exactly the
    reference's ``calculate_marginal_probability`` call over ``[0, 1]``.
    """
    from ..infer import marginal_probability
    from ..ops import generate_data
    from ..train.trainer import basis_states

    qa, qb = qubits
    lo, hi = bounds
    if K is None:
        K = graph.output_ranks[qa]
    if dtype is None:
        dtype = params[graph.core_names[0]].dtype
    step = (hi - lo) / edge_size
    centers = lo + step * (np.arange(edge_size) + 0.5)
    # row-major grid: row dx = value of qubit qa, column dy = qubit qb
    xa = np.repeat(centers, edge_size)
    xb = np.tile(centers, edge_size)
    B = edge_size * edge_size
    x = np.zeros((B, 2), np.float32)
    x[:, 0], x[:, 1] = xa, xb
    mx_list, _ = generate_data(jnp.asarray(x), K, dtype=dtype)
    if states is None:
        states = basis_states(graph, dtype=dtype)
    states = [jnp.broadcast_to(jnp.asarray(s, dtype), (B,) + tuple(np.shape(s)))
              for s in states]
    p = marginal_probability(
        graph, params, states, [mx_list[0], mx_list[1]], [qa, qb]
    )
    return np.asarray(p, np.float64).reshape(edge_size, edge_size)


def marginal_heatmap_png(
    graph,
    params,
    out_path: str,
    qubits: Tuple[int, int] = (0, 1),
    edge_size: int = 100,
    K: Optional[int] = None,
    bounds: Tuple[float, float] = (-5.0, 5.0),
    states: Optional[Sequence] = None,
) -> np.ndarray:
    """Render the 2-qubit marginal heatmap to ``out_path``; returns the
    grid (reference: ``test_heatmap_marginal``, hot colormap + colorbar)."""
    heatmap = marginal_grid(graph, params, qubits, edge_size, K, bounds,
                            states)
    plt = _plt()
    fig = plt.figure()
    plt.imshow(heatmap, cmap="hot", interpolation="nearest")
    plt.colorbar()
    plt.title(f"Marginal Probability Heatmap (q{qubits[0]}, q{qubits[1]})")
    fig.savefig(out_path)
    plt.close(fig)
    return heatmap


def sampling_scatter_png(
    samples,
    out_path: str,
    bounds: Tuple[float, float] = (-5.0, 5.0),
    qubits: Tuple[int, int] = (0, 1),
) -> None:
    """Scatter plot of two coordinates of ``(S, nqubits)`` samples
    (reference: ``test_sampling`` plotting block,
    ``test_probabilities.py:308-330``)."""
    s = np.asarray(samples)
    if s.ndim != 2 or s.shape[1] <= max(qubits):
        raise ValueError(f"samples shape {s.shape} lacks qubits {qubits}")
    plt = _plt()
    fig = plt.figure(figsize=(8, 8))
    plt.scatter(s[:, qubits[0]], s[:, qubits[1]], alpha=0.6, s=10, c="blue",
                edgecolors="none")
    plt.xlim(*bounds)
    plt.ylim(*bounds)
    plt.title(f"Sampled Points (N={s.shape[0]})\nQubits {qubits[0]}, "
              f"{qubits[1]}")
    plt.xlabel(f"Qubit {qubits[0]}")
    plt.ylabel(f"Qubit {qubits[1]}")
    plt.axhline(0, color="grey", linewidth=0.5)
    plt.axvline(0, color="grey", linewidth=0.5)
    plt.grid(True, alpha=0.3)
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
