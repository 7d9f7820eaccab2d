"""Full-pipeline confidence hand matrices ported from the reference suite
(tests/test_confidence/test_std_intensity.py, test_interval_bounds.py,
test_multiple_confidence.py, test_risk.py): the modular Pipeline drives
matching-cost + confidence steps on tiny images and the produced indicator
bands are compared against the reference's own ground-truth arrays."""

import numpy as np
import jax.numpy as jnp

from pandora_tpu.datamodel import make_image
from pandora_tpu.pipeline import Pipeline
from pandora_tpu.steps.base import PipelineState


def _run(cfg, left, right):
    state = PipelineState(left_img=left, right_img=right)
    Pipeline(cfg).run(state)
    return state


# -- std_intensity (reference test_std_intensity.py:34-115) -----------------

LEFT_STD = np.array(
    [
        [1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 2, 1],
        [1, 1, 1, 4, 3, 1],
        [1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1],
    ],
    np.float32,
)
RIGHT_STD = np.array(
    [
        [1, 1, 1, 2, 2, 2],
        [1, 1, 1, 4, 2, 4],
        [1, 1, 1, 4, 4, 1],
        [1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 1],
    ],
    np.float32,
)
STD_GT = np.array(
    [
        [np.nan] * 6,
        [np.nan, 0.0, np.sqrt(8 / 9), np.sqrt(10 / 9), np.sqrt(10 / 9), np.nan],
        [np.nan, 0.0, np.sqrt(8 / 9), np.sqrt(10 / 9), np.sqrt(10 / 9), np.nan],
        [np.nan, 0.0, np.sqrt(8 / 9), np.sqrt(92 / 81), np.sqrt(92 / 81), np.nan],
        [np.nan] * 6,
    ],
    np.float32,
)


def test_std_intensity_hand_matrix():
    """reference test_std_intensity.py:34-115: window-3 intensity std with
    NaN borders as the confidence band."""
    left = make_image(LEFT_STD, disp=(-2, 1))
    right = make_image(RIGHT_STD)
    state = _run(
        {
            "matching_cost": {"matching_cost_method": "sad", "window_size": 3},
            "cost_volume_confidence": {"confidence_method": "std_intensity"},
            "disparity": {"disparity_method": "wta"},
        },
        left,
        right,
    )
    disp = state.left_disparity
    assert disp.indicator_names == ("confidence_from_intensity_std",)
    np.testing.assert_allclose(
        np.asarray(disp.confidence[:, :, 0]), STD_GT, rtol=1e-6
    )


def test_std_intensity_multiband():
    """reference test_std_intensity.py:118-213: the configured band (green)
    feeds the std window, other bands are ignored."""
    red_l = np.zeros((5, 6), np.float32)
    red_l[1] = [1, 1, 1, 1, 2, 1]
    red_l[3] = 1
    left = make_image(
        np.stack([red_l, LEFT_STD]), disp=(-2, 1), band_names=("red", "green")
    )
    red_r = red_l.copy()
    right = make_image(np.stack([red_r, RIGHT_STD]), band_names=("red", "green"))
    state = _run(
        {
            "matching_cost": {
                "matching_cost_method": "sad",
                "window_size": 3,
                "band": "green",
            },
            "cost_volume_confidence": {"confidence_method": "std_intensity"},
            "disparity": {"disparity_method": "wta"},
        },
        left,
        right,
    )
    np.testing.assert_allclose(
        np.asarray(state.left_disparity.confidence[:, :, 0]), STD_GT, rtol=1e-6
    )


# -- 4x4 pair shared by interval_bounds / multiple confidence ----------------
# (reference conftest create_img_for_confidence: left mask flags (1,1) and
# (3,3) as nodata)

LEFT_4 = np.array(
    [[2, 5, 3, 1], [5, 3, 2, 1], [4, 2, 3, 2], [4, 5, 3, 2]], np.float32
)
LEFT_4_MSK = np.array(
    [[0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], np.int16
)
RIGHT_4 = np.array(
    [[1, 2, 1, 2], [2, 3, 5, 3], [0, 2, 4, 2], [5, 3, 1, 4]], np.float32
)


def _pair_4x4():
    left = make_image(LEFT_4, disp=(-1, 1), msk=LEFT_4_MSK, no_data_img=0)
    right = make_image(RIGHT_4, no_data_img=0)
    return left, right


def test_interval_bounds_full_pipeline():
    """reference test_interval_bounds.py:30-116: possibility-threshold 0.7
    inf/sup bounds (with the +-1 extension at possibility-1 bounds) through
    the sad w1 + wta + median pipeline, left-masked pixels NaN."""
    left, right = _pair_4x4()
    state = _run(
        {
            "matching_cost": {"matching_cost_method": "sad", "window_size": 1},
            "cost_volume_confidence": {
                "confidence_method": "interval_bounds",
                "possibility_threshold": 0.7,
            },
            "disparity": {"disparity_method": "wta"},
            "filter": {"filter_method": "median"},
        },
        left,
        right,
    )
    disp = state.left_disparity
    assert disp.indicator_names == (
        "confidence_from_interval_bounds_inf",
        "confidence_from_interval_bounds_sup",
    )
    inf_gt = np.array(
        [[0, -1, -1, -1], [0, np.nan, -1, -1], [0, -1, -1, -1], [-1, -1, -1, np.nan]],
        np.float32,
    )
    sup_gt = np.array(
        [[1, 1, 1, 0], [1, np.nan, 1, 1], [1, 1, 1, 1], [1, 0, 1, np.nan]],
        np.float32,
    )
    np.testing.assert_allclose(np.asarray(disp.confidence[:, :, 0]), inf_gt, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(disp.confidence[:, :, 1]), sup_gt, rtol=1e-6)


def test_ambiguity_std_full_pipeline():
    """reference test_multiple_confidence.py:33-106: std_intensity +
    normalized ambiguity (eta_max 0.3, step 0.25) as stacked indicator
    bands with the reference's exact integrals."""
    left, right = _pair_4x4()
    state = _run(
        {
            "matching_cost": {"matching_cost_method": "sad", "window_size": 1},
            "cost_volume_confidence": {"confidence_method": "std_intensity"},
            "cost_volume_confidence.2": {
                "confidence_method": "ambiguity",
                "eta_max": 0.3,
                "eta_step": 0.25,
            },
            "disparity": {"disparity_method": "wta"},
            "filter": {"filter_method": "median"},
        },
        left,
        right,
    )
    disp = state.left_disparity
    assert disp.indicator_names == (
        "confidence_from_intensity_std",
        "confidence_from_ambiguity.2",
    )
    amb_int = np.array(
        [[5.0, 4.0, 5.0, 5.0], [5.0, 6.0, 4.0, 4.0], [4.0, 2.0, 6.0, 4.0], [6.0, 2.0, 3.0, 6.0]]
    )
    amb_gt = 1 - (amb_int - 2.0) / 4.0
    np.testing.assert_allclose(
        np.asarray(disp.confidence[:, :, 1]), amb_gt, rtol=1e-6
    )
    # window 1: every std is zero
    np.testing.assert_array_equal(
        np.asarray(disp.confidence[:, :, 0]), np.zeros((4, 4), np.float32)
    )


def test_risk_variable_disparity_matrix():
    """reference test_risk.py:270-318: risk max + disp sup/inf ground
    truths with per-pixel disparity grids (risk_min needs the synthetic
    sampled-ambiguity input the reference feeds; our inline derivation is
    pipeline-consistent, so only the amb-independent outputs are pinned —
    plus the reference's own risk_max == disp_sup - disp_inf invariant)."""
    from pandora_tpu.ops.confidence import compute_risk

    grids = np.array(
        [
            [[-1, 0, -1, 0], [0, -1, 0, -1], [0, 0, 0, -1], [-1, -1, -1, -1]],
            [[1, 1, 1, 1], [1, 0, 1, 1], [1, 1, 1, 0], [0, 0, 0, 1]],
        ],
        np.int64,
    )
    cv = np.rollaxis(
        np.array(
            [
                [[np.nan, 1, 3, 2], [4, 1, 1, 1], [np.nan] * 4, [np.nan, 1, 3, 2]],
                [[5, np.nan, np.nan, np.nan], [6.2, np.nan, np.nan, np.nan], [0, np.nan, 0, 0], [5, np.nan, np.nan, np.nan]],
                [[np.nan, 2, 4, 5], [np.nan, 5, 0, 1], [0, 0, 2, np.nan], [np.nan, 2, 4, 5]],
            ],
            np.float32,
        ),
        0,
        3,
    )
    dr = np.array([-1, 0, 1], np.float32)
    # the reference test overrides the step config with these etas
    # (test_risk.py:308)
    etas = np.arange(0.0, 0.5, 0.3, dtype=np.float32)
    risk_max, _, disp_sup, disp_inf = (
        np.asarray(a)
        for a in compute_risk(
            jnp.asarray(cv), jnp.asarray(etas), jnp.asarray(grids[0]),
            jnp.asarray(grids[1]), jnp.asarray(dr),
        )
    )
    gt_risk_max = np.array(
        [[2.0, 1.5, 1.5, 1.0], [2.0, 1.0, 1.5, 2.0], [1.0, 1.0, 0.0, 1.0], [1.0, 1.5, 1.5, 1.0]],
        np.float32,
    )
    gt_disp_sup = np.array(
        [[1.0, 0.5, 0.5, 0.0], [1.0, 0.0, 1.0, 1.0], [1.0, 1.0, 0.0, 0.0], [0.0, 0.5, 0.5, 0.0]],
        np.float32,
    )
    gt_disp_inf = np.array(
        [[-1.0, -1.0, -1.0, -1.0], [-1.0, -1.0, -0.5, -1.0], [0.0, 0.0, 0.0, -1.0], [-1.0, -1.0, -1.0, -1.0]],
        np.float32,
    )
    np.testing.assert_allclose(risk_max, gt_risk_max, rtol=1e-6)
    np.testing.assert_allclose(disp_sup, gt_disp_sup, rtol=1e-6)
    np.testing.assert_allclose(disp_inf, gt_disp_inf, rtol=1e-6)
    np.testing.assert_allclose(risk_max, disp_sup - disp_inf, rtol=1e-6)
