"""Interval-tools hand matrices ported from the reference suite
(tests/test_interval_tools.py): connection-matrix construction, graph
regularization by group quantiles, and the full interval_regularization
driver — expected arrays are the reference's own ground truths."""

import numpy as np

from pandora_tpu import interval_tools

BORDER_LEFT = np.array(
    [[0, 1], [0, 6], [1, 3], [2, 1], [3, 4], [3, 7], [4, 8], [5, 2], [5, 7], [6, 8]]
)
BORDER_RIGHT = np.array(
    [[0, 4], [0, 8], [1, 6], [2, 3], [3, 5], [3, 8], [4, 8], [5, 3], [5, 8], [6, 8]]
)
GT_CONNECTION = np.array(
    [
        [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
        [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
        [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
        [1, 1, 1, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1, 1, 0, 1, 0],
        [0, 0, 0, 0, 0, 1, 1, 0, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 1, 0, 0],
        [0, 0, 0, 0, 0, 1, 1, 0, 1, 1],
        [0, 0, 0, 0, 0, 0, 1, 0, 1, 1],
    ],
    bool,
)
GT_MASK_MODIF = np.array(
    [
        [0, 1, 1, 1, 1, 0, 1, 1, 1, 0],
        [0, 0, 0, 1, 1, 1, 1, 0, 0, 0],
        [0, 1, 1, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 1, 1, 0, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 0],
        [0, 0, 1, 1, 0, 0, 0, 1, 1, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 0],
    ],
    np.bool_,
)
GT_INF = np.array(
    [
        [1.0, 3.3, 3.3, 3.3, 3.3, 6.0, 3.3, 3.3, 3.3, 10.0],
        [11.0, 12.0, 13.0, 3.3, 3.3, 3.3, 3.3, 18.0, 19.0, 20.0],
        [21.0, 3.3, 3.3, 3.3, 25.0, 26.0, 27.0, 28.0, 29.0, 30.0],
        [31.0, 32.0, 33.0, 34.0, 35.1, 35.1, 37.0, 38.4, 38.4, 40.0],
        [41.0, 42.0, 43.0, 44.0, 45.0, 46.0, 47.0, 48.0, 38.5, 50.0],
        [51.0, 52.0, 53.1, 53.1, 55.0, 56.0, 57.0, 38.5, 38.5, 60.0],
        [61.0, 62.0, 63.0, 64.0, 65.0, 66.0, 67.0, 68.0, 51.7, 70.0],
    ],
    np.float32,
)
GT_SUP = np.array(
    [
        [5.0, 26.7, 26.7, 26.7, 26.7, 10.0, 26.7, 26.7, 26.7, 14.0],
        [15.0, 16.0, 17.0, 26.7, 26.7, 26.7, 26.7, 22.0, 23.0, 24.0],
        [25.0, 26.7, 26.7, 26.7, 29.0, 30.0, 31.0, 32.0, 33.0, 34.0],
        [35.0, 36.0, 37.0, 38.0, 39.9, 39.9, 41.0, 62.6, 62.6, 44.0],
        [45.0, 46.0, 47.0, 48.0, 49.0, 50.0, 51.0, 52.0, 68.0, 54.0],
        [55.0, 56.0, 57.9, 57.9, 59.0, 60.0, 61.0, 68.0, 68.0, 64.0],
        [65.0, 66.0, 67.0, 68.0, 69.0, 70.0, 71.0, 72.0, 70.0, 74.0],
    ],
    np.float32,
)


def _intervals():
    inf = np.arange(1, 7 * 10 + 1, dtype=np.float32).reshape((7, 10))
    sup = np.arange(5, 7 * 10 + 5, dtype=np.float32).reshape((7, 10))
    return inf, sup


def test_create_connected_graph():
    """reference test_interval_tools.py:86-94 (depth 2 closure)."""
    graph = interval_tools.create_connected_graph(BORDER_LEFT, BORDER_RIGHT, 2)
    np.testing.assert_array_equal(graph, GT_CONNECTION)


def test_graph_regularization():
    """reference test_interval_tools.py:96-137: group quantile replacement
    (q=0.9) over the connection matrix."""
    inf, sup = _intervals()
    reg_left, reg_right, mask = interval_tools.graph_regularization(
        inf, sup, BORDER_LEFT, BORDER_RIGHT, GT_CONNECTION, 0.9
    )
    np.testing.assert_allclose(reg_left, GT_INF, 1e-6, 1e-6)
    np.testing.assert_allclose(reg_right, GT_SUP, 1e-6, 1e-6)
    np.testing.assert_allclose(mask, GT_MASK_MODIF, 1e-6, 1e-6)


def test_interval_regularization():
    """reference test_interval_tools.py:139-198: the full driver — min
    filter, segment extraction, depth-2 connection, quantile groups."""
    inf, sup = _intervals()
    ambiguity = np.array(
        [
            [1.0, 0.2, 0.2, 0.2, 0.2, 1.0, 0.2, 0.2, 0.2, 0.2],
            [1.0, 1.0, 1.0, 0.2, 0.2, 0.2, 0.2, 1.0, 1.0, 1.0],
            [1.0, 0.2, 0.2, 0.2, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 0.2, 0.2, 0.2],
            [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
            [1.0, 1.0, 0.2, 0.2, 1.0, 1.0, 1.0, 0.2, 0.2, 0.2],
            [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2],
        ],
        np.float32,
    )
    out_inf, out_sup, mask = interval_tools.interval_regularization(
        inf,
        sup,
        ambiguity,
        ambiguity_threshold=0.6,
        ambiguity_kernel_size=1,
        vertical_depth=2,
        quantile_regularization=0.9,
    )
    np.testing.assert_allclose(out_inf, GT_INF, 1e-6, 1e-6)
    np.testing.assert_allclose(out_sup, GT_SUP, 1e-6, 1e-6)
    np.testing.assert_allclose(mask, GT_MASK_MODIF, 1e-6, 1e-6)
