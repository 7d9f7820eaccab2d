"""Hand-computed WTA disparity matrices ported from the reference suite
(tests/test_disparity.py:81-640): mixed/negative/positive ranges, window
offsets with invalid fill, the coefficient map, and the approximate right
disparity with subpixel volumes."""

import numpy as np

import pandora_tpu.constants as cst
from pandora_tpu.datamodel import make_image
from pandora_tpu.steps.base import make_step

LEFT = np.array([[1, 2, 4, 6], [2, 4, 1, 6], [6, 7, 8, 10]], np.float64)
RIGHT = np.array([[6, 1, 2, 4], [6, 2, 4, 1], [10, 6, 7, 8]], np.float64)


def _cv(disp, window_size=1, subpix=1, method="sad"):
    left = make_image(LEFT, disp=disp)
    right = make_image(RIGHT)
    mc = make_step(
        "matching_cost",
        {"matching_cost_method": method, "window_size": window_size, "subpix": subpix},
    )
    return mc.compute(left, right, int(disp[0]), int(disp[1])), right


def _to_disp(cv, invalid=0):
    wta = make_step("disparity", {"disparity_method": "wta", "invalid_disparity": invalid})
    return wta.to_disp(cv)


def test_to_disp_mixed_range():
    """reference test_disparity.py:81-113: disp [-3, 1]."""
    cv, _ = _cv([-3, 1])
    ds = _to_disp(cv)
    gt = np.array([[1, 1, 1, -3], [1, 1, 1, -3], [1, 1, 1, -3]], np.float32)
    np.testing.assert_array_equal(np.asarray(ds.disparity_map), gt)


def test_to_disp_negative_range():
    """reference :115-154: disp [-3, -1] — out-of-range cols filled with
    the invalid value 0."""
    cv, _ = _cv([-3, -1])
    ds = _to_disp(cv)
    gt = np.array([[0, -1, -2, -3], [0, -1, -1, -3], [0, -1, -2, -3]], np.float32)
    np.testing.assert_array_equal(np.asarray(ds.disparity_map), gt)


def test_to_disp_positive_range():
    """reference :156-189: disp [1, 3]."""
    cv, _ = _cv([1, 3])
    ds = _to_disp(cv)
    gt = np.array([[1, 1, 1, 0], [1, 1, 1, 0], [1, 1, 1, 0]], np.float32)
    np.testing.assert_array_equal(np.asarray(ds.disparity_map), gt)


def test_to_disp_with_offset_mixed():
    """reference :255-295: window 3 — the border ring gets the invalid
    value (-99)."""
    cv, _ = _cv([-3, 1], window_size=3)
    ds = _to_disp(cv, invalid=-99)
    gt = np.array(
        [[-99, -99, -99, -99], [-99, 1, 0, -99], [-99, -99, -99, -99]], np.float32
    )
    np.testing.assert_array_equal(np.asarray(ds.disparity_map), gt)


def test_to_disp_with_offset_negative():
    """reference :297-330."""
    cv, _ = _cv([-3, -1], window_size=3)
    ds = _to_disp(cv, invalid=-99)
    gt = np.array(
        [[-99, -99, -99, -99], [-99, -99, -1, -99], [-99, -99, -99, -99]], np.float32
    )
    np.testing.assert_array_equal(np.asarray(ds.disparity_map), gt)


def test_to_disp_with_offset_positive():
    """reference :332-365."""
    cv, _ = _cv([1, 3], window_size=3)
    ds = _to_disp(cv, invalid=-99)
    gt = np.array(
        [[-99, -99, -99, -99], [-99, 1, -99, -99], [-99, -99, -99, -99]], np.float32
    )
    np.testing.assert_array_equal(np.asarray(ds.disparity_map), gt)


def test_coefficient_map():
    """reference :432-473: cost at the selected disparity (all-zero for
    this pair at window 1)."""
    from pandora_tpu.ops.wta import coefficient_map

    cv, _ = _cv([-3, 1])
    ds = _to_disp(cv)
    import jax.numpy as jnp

    idx_pos = ((ds.disparity_map - (-3.0)) * 1).astype(jnp.int32)
    coeff = np.asarray(coefficient_map(cv.cv, idx_pos))
    gt = np.zeros((3, 4), np.float32)
    np.testing.assert_array_equal(coeff, gt)


def test_right_disparity_subpixel():
    """reference :561-586: subpix-4 volume — the diagonal search skips
    fractional lanes and yields the same integer map."""
    cv, right = _cv([-2, 1], window_size=3, subpix=4)
    wta = make_step("disparity", {"disparity_method": "wta", "invalid_disparity": 0})
    ds = wta.approximate_right_disparity(cv, right)
    gt = np.array([[0, 0, 0, 0], [0, 0, -1, 0], [0, 0, 0, 0]], np.float32)
    np.testing.assert_array_equal(np.asarray(ds.disparity_map), gt)


def test_disp_indices_kept_on_cv():
    """reference :191-196: WTA writes disp_indices back onto the CV via
    the pipeline state (disparity.py:459)."""
    from pandora_tpu.steps.base import PipelineState

    left = make_image(LEFT, disp=[-3, 1])
    right = make_image(RIGHT)
    state = PipelineState(left_img=left, right_img=right)
    mc = make_step(
        "matching_cost", {"matching_cost_method": "sad", "window_size": 1, "subpix": 1}
    )
    mc.run(state)
    wta = make_step("disparity", {"disparity_method": "wta", "invalid_disparity": 0})
    wta.run(state)
    gt = np.array([[1, 1, 1, -3], [1, 1, 1, -3], [1, 1, 1, -3]], np.float32)
    np.testing.assert_array_equal(np.asarray(state.left_cv.disp_indices), gt)
