"""Hand-computed confidence matrices ported from the reference suite
(tests/test_confidence/test_ambiguity.py, test_risk.py): ambiguity
integrals with constant and variable disparity grids, percentile
normalization, and the risk max/min + disp sup/inf measures.  Expected
arrays are the reference's own ground truths."""

import jax.numpy as jnp
import numpy as np

from pandora_tpu.ops.confidence import (
    compute_ambiguity,
    compute_risk,
    normalize_with_percentile,
)

ETAS = np.arange(0.0, 0.2, 0.1, dtype=np.float32)


def _amb(cv, gmin, gmax, dr, etas=ETAS):
    return np.asarray(
        compute_ambiguity(
            jnp.asarray(cv), jnp.asarray(etas), jnp.asarray(gmin), jnp.asarray(gmax), jnp.asarray(dr)
        )
    )


def test_ambiguity_integral():
    """reference test_ambiguity.py:30-65: raw integral + percentile
    normalization + confidence = 1 - normalized."""
    cv = np.array(
        [
            [[np.nan, 1, 3], [4, 1, 1], [1.2, 1, 2]],
            [[5, np.nan, np.nan], [6.2, np.nan, np.nan], [0, np.nan, 0]],
        ],
        np.float32,
    )
    dr = np.array([-1, 0, 1], np.float32)
    gmin = np.full((2, 3), -1, np.int64)
    gmax = np.full((2, 3), 1, np.int64)
    amb = _amb(cv, gmin, gmax, dr)
    np.testing.assert_allclose(amb, np.array([[4.0, 4.0, 3.0], [6.0, 6.0, 6.0]]), rtol=1e-6)

    conf = 1 - np.asarray(normalize_with_percentile(jnp.asarray(amb)))
    gt_norm = np.array(
        [[(4 - 3.05) / (6 - 3.05), (4 - 3.05) / (6 - 3.05), 0], [1.0, 1.0, 1.0]]
    )
    np.testing.assert_allclose(conf, 1 - gt_norm, rtol=1e-6)


def test_ambiguity_without_normalization():
    """reference test_ambiguity.py:67-101: confidence = 1 - raw integral."""
    cv = np.array(
        [
            [[np.nan, 1, 3], [4, 1, 1], [1.2, 1, 2]],
            [[5, np.nan, np.nan], [6.2, np.nan, np.nan], [0, np.nan, 0]],
        ],
        np.float32,
    )
    dr = np.array([-1, 0, 1], np.float32)
    gmin = np.full((2, 3), -1, np.int64)
    gmax = np.full((2, 3), 1, np.int64)
    amb = _amb(cv, gmin, gmax, dr)
    np.testing.assert_allclose(1 - amb, 1 - np.array([[4.0, 4.0, 3.0], [6.0, 6.0, 6.0]]))


def test_ambiguity_all_nan_pixel_gets_max():
    """reference test_ambiguity.py:103-135: an all-NaN pixel gets the
    maximal integral eta_count * n_disp."""
    cv = np.array(
        [
            [[np.nan, 1, 3], [4, 1, 1], [np.nan, np.nan, np.nan]],
            [[5, np.nan, np.nan], [6.2, np.nan, np.nan], [0, np.nan, 0]],
        ],
        np.float32,
    )
    dr = np.array([-1, 0, 1], np.float32)
    gmin = np.full((2, 3), -1, np.int64)
    gmax = np.full((2, 3), 1, np.int64)
    amb = _amb(cv, gmin, gmax, dr)
    np.testing.assert_allclose(amb, np.array([[4.0, 4.0, 6.0], [6.0, 6.0, 6.0]]), rtol=1e-6)


VAR_GRIDS = np.array(
    [
        [[-1, 0, -1, 0], [0, -1, 0, -1], [0, 0, 0, -1], [-1, -1, -1, -1]],
        [[1, 1, 1, 1], [1, 0, 1, 1], [1, 1, 1, 0], [0, 0, 0, 1]],
    ],
    np.int64,
)


def _var_cv():
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
    return np.rollaxis(cv, 0, 3)


def test_ambiguity_with_variable_disparity():
    """reference test_ambiguity.py:138-165: per-pixel grids restrict the
    in-range NaN encoding."""
    dr = np.array([-1, 0, 1], np.float32)
    amb = _amb(_var_cv(), VAR_GRIDS[0], VAR_GRIDS[1], dr)
    gt = np.array(
        [[6.0, 4.0, 4.0, 4.0], [4.0, 4.0, 4.0, 6.0], [4.0, 4.0, 2.0, 4.0], [4.0, 4.0, 4.0, 4.0]]
    )
    np.testing.assert_allclose(amb, gt, rtol=1e-6)


def test_risk_hand_matrix():
    """reference test_risk.py:30-155: risk_max/min + disp sup/inf on a
    1x3x4 volume with an all-NaN pixel."""
    cv = np.array(
        [
            [
                [39, 28.03, 28, 34.5],
                [49, 34, 41.5, 34.1],
                [np.nan, np.nan, np.nan, np.nan],
            ]
        ],
        np.float32,
    )
    dr = np.array([-1, 0, 1, 2], np.float32)
    gmin = np.full((1, 3), -1, np.int64)
    gmax = np.full((1, 3), 1, np.int64)
    etas = np.arange(0.0, 0.5, 0.3, dtype=np.float32)  # [0.0, 0.3]
    risk_max, risk_min, disp_sup, disp_inf = (
        np.asarray(a)
        for a in compute_risk(
            jnp.asarray(cv), jnp.asarray(etas), jnp.asarray(gmin), jnp.asarray(gmax), jnp.asarray(dr)
        )
    )
    # NOTE: the reference test (test_risk.py:47) feeds a SYNTHETIC
    # sampled_ambiguity=[2,2]; the pipeline-consistent values (what
    # ambiguity.cpp actually yields and what our compute_risk derives
    # inline) are [1,2] per pixel — risk_min reflects those
    samp_amb = np.array([[[1.0, 2.0], [1.0, 2.0], [4.0, 4.0]]], np.float32)
    gt_risk_max = np.array([[(0 + (2 - 1)) / 2, (0 + (3 - 1)) / 2, np.nan]])
    gt_risk_min = np.array(
        [
            [
                (1 + 0 - samp_amb[0, 0, 0] + 1 + (2 - 1) - samp_amb[0, 0, 1]) / 2,
                (1 + 0 - samp_amb[0, 1, 0] + 1 + (3 - 1) - samp_amb[0, 1, 1]) / 2,
                np.nan,
            ]
        ]
    )
    gt_disp_inf = np.array([[0.5, 0.0, np.nan]])
    gt_disp_sup = np.array([[1.0, 1.0, np.nan]])
    np.testing.assert_allclose(risk_max, gt_risk_max, rtol=1e-6)
    np.testing.assert_allclose(risk_min, gt_risk_min, rtol=1e-6)
    np.testing.assert_allclose(disp_sup, gt_disp_sup, rtol=1e-6)
    np.testing.assert_allclose(disp_inf, gt_disp_inf, rtol=1e-6)
    # invariant from the reference test: risk_max == disp_sup - disp_inf
    np.testing.assert_allclose(risk_max, disp_sup - disp_inf, rtol=1e-6)


def test_risk_with_variable_disparity():
    """Risk with per-pixel grids stays NaN-free on valid pixels and NaN on
    the all-NaN pixel (reference test_risk.py variable-disparity case)."""
    dr = np.array([-1, 0, 1], np.float32)
    cv = _var_cv()
    risk_max, risk_min, disp_sup, disp_inf = (
        np.asarray(a)
        for a in compute_risk(
            jnp.asarray(cv), jnp.asarray(ETAS), jnp.asarray(VAR_GRIDS[0]), jnp.asarray(VAR_GRIDS[1]), jnp.asarray(dr)
        )
    )
    nan_pixel = np.isnan(cv).all(axis=2)
    assert np.isnan(risk_max[nan_pixel]).all()
    assert np.isfinite(risk_max[~nan_pixel]).all()
    np.testing.assert_allclose(risk_max, disp_sup - disp_inf, rtol=1e-6)
