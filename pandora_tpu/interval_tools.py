"""Interval regularization over ambiguous segment groups.

Host-side re-implementation of the reference interval tools
(interval_tools.py:37-96 + cpp/src/interval_tools.cpp:32-235): detect
ambiguous row segments from a min-filtered ambiguity map, build the
depth-limited vertical adjacency closure between segments, and replace each
segment's interval bounds by quantiles over its connected group.

The problem is tiny (n_segments² booleans) and irregular, so it stays on
the host in NumPy like the reference keeps it in C++ — it is not part of
the per-pixel TPU hot path.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def create_connected_graph(
    border_left: np.ndarray, border_right: np.ndarray, depth: int
) -> np.ndarray:
    """Depth-limited transitive closure of the segment vertical-overlap
    adjacency (interval_tools.cpp:32-118)."""
    n = border_left.shape[0]
    if depth == 0:
        return np.eye(n, dtype=bool)

    conn = np.zeros((n, n), dtype=bool)
    for i in range(n):
        row_i = border_left[i, 0]
        for k in range(i + 1, n):
            if border_left[k, 0] == row_i:
                continue
            if border_left[k, 0] > row_i + 1:
                break
            if border_left[k, 1] <= border_right[i, 1] and border_right[k, 1] >= border_left[i, 1]:
                conn[i, k] = True
                conn[k, i] = True

    out = conn.copy()
    for _ in range(1, depth):
        # one BFS expansion step for every source row at once
        out = out | ((out.astype(np.float32) @ conn.astype(np.float32)) > 0)
    np.fill_diagonal(out, True)
    return out


def _cpp_quantile(sorted_vals: np.ndarray, q: float) -> float:
    """Linear-interpolation quantile exactly as interval_tools.cpp:199-216."""
    nb = len(sorted_vals) - 1
    idx = int(q * nb)
    t = q * nb - idx
    if idx >= nb:
        return float(sorted_vals[idx])
    return float(sorted_vals[idx] * (1.0 - t) + sorted_vals[idx + 1] * t)


def graph_regularization(
    interval_inf: np.ndarray,
    interval_sup: np.ndarray,
    border_left: np.ndarray,
    border_right: np.ndarray,
    graph: np.ndarray,
    quantile: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Replace each segment's bounds by group quantiles
    (interval_tools.cpp:120-235)."""
    inf_reg = interval_inf.copy()
    sup_reg = interval_sup.copy()
    mask = np.zeros(interval_inf.shape, dtype=bool)
    p = 1.0 - quantile
    n = graph.shape[0]
    for i in range(n):
        members = np.nonzero(graph[i])[0]
        agg_inf = []
        agg_sup = []
        for j in members:
            r = border_left[j, 0]
            c0, c1 = border_left[j, 1], border_right[j, 1]
            vals_inf = interval_inf[r, c0 : c1 + 1]
            vals_sup = interval_sup[r, c0 : c1 + 1]
            agg_inf.append(vals_inf[~np.isnan(vals_inf)])
            agg_sup.append(vals_sup[~np.isnan(vals_sup)])
        agg_inf = np.sort(np.concatenate(agg_inf)) if agg_inf else np.array([])
        agg_sup = np.sort(np.concatenate(agg_sup)) if agg_sup else np.array([])
        if agg_inf.size > 0:
            inf_q = _cpp_quantile(agg_inf, p)
            sup_q = _cpp_quantile(agg_sup, quantile)
        else:
            inf_q = sup_q = np.nan
        r = border_left[i, 0]
        c0, c1 = border_left[i, 1], border_right[i, 1]
        inf_reg[r, c0 : c1 + 1] = inf_q
        sup_reg[r, c0 : c1 + 1] = sup_q
        mask[r, c0 : c1 + 1] = True
    return inf_reg, sup_reg, mask


def interval_regularization(
    interval_inf: np.ndarray,
    interval_sup: np.ndarray,
    ambiguity: np.ndarray,
    ambiguity_threshold: float,
    ambiguity_kernel_size: int,
    vertical_depth: int = 0,
    quantile_regularization: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full regularization driver (interval_tools.py:37-96): min-filter the
    ambiguity along columns, extract below-threshold segments, connect them
    vertically, regularize by group quantiles."""
    n_row, _ = ambiguity.shape
    pad = ambiguity_kernel_size // 2
    padded = np.hstack([np.ones((n_row, pad)), ambiguity, np.ones((n_row, pad))])
    windows = np.lib.stride_tricks.sliding_window_view(padded, ambiguity_kernel_size, axis=1)
    minimized = np.nanmin(windows, axis=-1)

    minimized[:, -1] = 1
    border = np.diff(
        np.hstack([np.ones((n_row, 1)), minimized >= ambiguity_threshold]), axis=-1
    )
    border_left = np.argwhere(border == -1)
    border_right = np.argwhere(border == 1)
    border_right[:, 1] -= 1

    graph = create_connected_graph(
        border_left.astype(np.int32), border_right.astype(np.int32), vertical_depth
    )
    return graph_regularization(
        np.asarray(interval_inf),
        np.asarray(interval_sup),
        border_left,
        border_right,
        graph,
        quantile_regularization,
    )
