"""Confidence matrices ported from the reference's remaining
``tests/test_confidence/`` parametrizations (round-5 VERDICT #3):
risk with a subpixel disparity interval (non-regression values,
test_risk.py:162-268), the ambiguity perfect cases on variable grids
(test_ambiguity.py:234-290), and the global-extremum normalization
(test_ambiguity.py:204-231, the CARS tiled-normalization contract).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pandora_tpu.ops import confidence as conf_ops

# the test_confidence/conftest.py variable-disparity fixtures
GRIDS = np.array(
    [
        [[-1, 0, -1, 0], [0, -1, 0, -1], [0, 0, 0, -1], [-1, -1, -1, -1]],
        [[1, 1, 1, 1], [1, 0, 1, 1], [1, 1, 1, 0], [0, 0, 0, 1]],
    ],
    np.float32,
)
DISP_RANGE_3 = np.array([-1, 0, 1], np.float32)


def _variable_cv():
    cv = np.array(
        [
            [[np.nan, 1, 3, 2], [4, 1, 1, 1], [np.nan, np.nan, np.nan, np.nan], [np.nan, 1, 3, 2]],
            [
                [5, np.nan, np.nan, np.nan],
                [6.2, np.nan, np.nan, np.nan],
                [0, np.nan, 0, 0],
                [5, np.nan, np.nan, np.nan],
            ],
            [[np.nan, 2, 4, 5], [np.nan, 5, 0, 1], [0, 0, 2, np.nan], [np.nan, 2, 4, 5]],
        ],
        np.float32,
    )
    return np.rollaxis(cv, 0, 3)  # (4, 4, 3)


@pytest.mark.parametrize("measure", ["min", "max"])
def test_ambiguity_perfect_case(measure):
    """reference test_ambiguity.py:234-290: a pixel with one crushing
    minimum (or maximum, negated) gets confidence 1 - ambiguity == 1."""
    cv = _variable_cv()
    if measure == "min":
        ind = np.nanargmin(cv[1, 1, :])
        cv[1, 1, :] = np.full(3, 24.0)
        cv[1, 1, ind] = 0.1
    else:
        ind = np.nanargmax(cv[1, 1, :])
        cv[1, 1, :] = np.full(3, -30.0)
        cv[1, 1, ind] = 20.0
        cv = -cv  # max measures are negated into costs

    etas = np.arange(0.0, 0.2, 0.1)
    amb = conf_ops.compute_ambiguity(
        jnp.asarray(cv), jnp.asarray(etas), jnp.asarray(GRIDS[0]),
        jnp.asarray(GRIDS[1]), jnp.asarray(DISP_RANGE_3),
    )
    norm = np.asarray(conf_ops.normalize_with_percentile(amb))
    np.testing.assert_almost_equal(1.0 - norm[1, 1], 1.0)


def test_normalize_with_extremum_global_disparity():
    """reference test_ambiguity.py:204-231: with a scene-global disparity
    range attached (CARS tiling), ambiguity normalizes by
    (global_max - global_min) * nbr_etas instead of the percentile."""
    amb = np.ones((4, 4), np.float32)
    nbr_etas = np.arange(0.0, 0.2, 0.1).shape[0]
    got = np.asarray(
        conf_ops.normalize_with_extremum(jnp.asarray(amb), (-2, 2), nbr_etas)
    )
    np.testing.assert_array_equal(got, amb / ((2 - (-2)) * nbr_etas))


def test_risk_with_subpix_nonregression():
    """reference test_risk.py:162-268: ssd window 1 subpix 2 cost volume
    (given explicitly there) through compute_risk — the reference's exact
    non-regression values for all four outputs."""
    cv = np.array(
        [
            [
                [np.nan, np.nan, 36.0, 9.0, 0.0],
                [25.0, 4.0, 1.0, 1.0, 9.0],
                [4.0, 0.0, 4.0, 16.0, 36.0],
                [1.0, 9.0, 25.0, np.nan, np.nan],
            ],
            [
                [np.nan, np.nan, 9.0, 0.0, 9.0],
                [4.0, 1.0, 16.0, 4.0, 0.0],
                [25.0, 9.0, 1.0, 16.0, 49.0],
                [4.0, 25.0, 64.0, np.nan, np.nan],
            ],
            [
                [np.nan, np.nan, 0.0, 9.0, 36.0],
                [81.0, 36.0, 9.0, 25.0, 49.0],
                [4.0, 16.0, 36.0, 9.0, 0.0],
                [25.0, 4.0, 1.0, np.nan, np.nan],
            ],
            [
                [np.nan, np.nan, 9.0, 1.0, 1.0],
                [16.0, 4.0, 0.0, 4.0, 16.0],
                [1.0, 1.0, 9.0, 0.0, 9.0],
                [4.0, 1.0, 16.0, np.nan, np.nan],
            ],
        ],
        np.float32,
    )
    disparity_range = np.array([-1.0, -0.75, -0.5, -0.25, 0.0, 0.25, 0.5, 0.75, 1.0], np.float32)
    # subpix grids: cv has 5 of the 9 subpix positions per pixel; the
    # reference passes the INTEGER grids — searchsorted finds the range
    etas = np.arange(0.0, 0.7, 0.01)
    risk_max, risk_min, disp_sup, disp_inf = conf_ops.compute_risk(
        jnp.asarray(cv), jnp.asarray(etas), jnp.asarray(GRIDS[0]),
        jnp.asarray(GRIDS[1]),
        jnp.asarray(disparity_range[: cv.shape[2]]),
    )
    gt_risk_max = np.array(
        [
            [4.0, 3.3714285, 2.9285715, 4.0],
            [1.6571429, 3.8428571, 2.3, 4.0],
            [1.1857142, 1.5142857, 3.7142856, 3.5142858],
            [4.0, 3.2857144, 3.7428572, 3.942857],
        ],
        np.float32,
    )
    gt_risk_min = np.array(
        [
            [0.8142857, 0.0, 0.0, 1.5714285],
            [0.0, 0.3, 0.0, 1.3714286],
            [0.0, 0.0, 0.8857143, 0.0],
            [0.14285715, 0.0, 0.14285715, 0.27142859],
        ],
        np.float32,
    )
    gt_disp_inf = np.array(
        [
            [-1.0, -0.87857145, -0.98214287, -1.0],
            [-0.45714286, -0.9607143, -0.85714287, -1.0],
            [-0.5, -0.62857145, -0.9285714, -0.87857145],
            [-1.0, -0.91071427, -0.9785714, -0.98571426],
        ],
        np.float32,
    )
    gt_disp_sup = np.array(
        [
            [0.0, -0.03571429, -0.25, 0.0],
            [-0.04285714, 0.0, -0.28214285, 0.0],
            [-0.20357142, -0.25, 0.0, 0.0],
            [0.0, -0.08928572, -0.04285714, 0.0],
        ],
        np.float32,
    )
    np.testing.assert_allclose(np.asarray(risk_max), gt_risk_max, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(risk_min), gt_risk_min, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(disp_sup), gt_disp_sup, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(disp_inf), gt_disp_inf, rtol=1e-5, atol=1e-6)
