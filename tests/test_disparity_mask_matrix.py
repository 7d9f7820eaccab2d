"""Validity-mask matrices for WTA under disparity-range masks, ported from
the reference suite (tests/test_disparity_mask.py:73-719): negative /
positive / mixed ranges, window offsets (border overwrite), variable
per-pixel grids, and the approximate right disparity mask.  Expected
arrays are the reference's hand-computed ground truths, asserted exactly.
"""

import numpy as np

import pandora_tpu.constants as cst
from pandora_tpu.datamodel import make_image
from pandora_tpu.steps.base import make_step

B0 = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
B1 = cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING
B2 = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE

LEFT = np.array([[1, 2, 4, 6], [2, 4, 1, 6], [6, 7, 8, 10]], np.float64)
RIGHT = np.array([[6, 1, 2, 4], [6, 2, 4, 1], [10, 6, 7, 8]], np.float64)


def _vmask(disp, window_size=1, subpix=1):
    left = make_image(LEFT, disp=disp)
    right = make_image(RIGHT)
    mc = make_step(
        "matching_cost",
        {"matching_cost_method": "sad", "window_size": window_size, "subpix": subpix},
    )
    dmin = int(np.min(disp[0] if np.ndim(disp[0]) else disp[0]))
    if isinstance(disp, np.ndarray):
        dmin, dmax = int(disp[0].min()), int(disp[1].max())
    else:
        dmin, dmax = int(disp[0]), int(disp[1])
    cv = mc.compute(left, right, dmin, dmax)
    wta = make_step("disparity", {"disparity_method": "wta", "invalid_disparity": 0})
    return np.asarray(wta.to_disp(cv).validity_mask), cv


def test_to_disp_validity_mask_negative():
    """reference test_disparity_mask.py:73-136: disp [-3, -1]."""
    got, _ = _vmask([-3, -1])
    gt = np.array([[B1, B2, B2, 0]] * 3, np.uint16)
    np.testing.assert_array_equal(got, gt)


def test_to_disp_validity_mask_positive():
    """reference :138-173: disp [1, 2]."""
    got, _ = _vmask([1, 2])
    gt = np.array([[0, 0, B2, B1]] * 3, np.uint16)
    np.testing.assert_array_equal(got, gt)


def test_to_disp_validity_mask_mixed():
    """reference :175-229: disp [-1, 1]."""
    got, _ = _vmask([-1, 1])
    gt = np.array([[B2, 0, 0, B2]] * 3, np.uint16)
    np.testing.assert_array_equal(got, gt)


def test_to_disp_validity_mask_variable_grids():
    """reference :231-296: per-pixel grids add bit 1 where the whole lane
    is masked out (mask_invalid_variable_disparity_range)."""
    disp_min_grid = np.array([[-3, -2, -3, -1], [-2, -2, -1, -3], [-1, -2, -2, -3]])
    disp_max_grid = np.array([[-1, -1, -2, 0], [0, -1, 0, 0], [0, 0, -1, -1]])
    got, _ = _vmask(np.array([disp_min_grid, disp_max_grid], np.float32))
    gt = np.array(
        [[B2 + B1, B2, B2, 0], [B2, B2, B2, 0], [B2, B2, B2, 0]], np.uint16
    )
    np.testing.assert_array_equal(got, gt)


def test_to_disp_validity_mask_offset_negative():
    """reference :298-361: window 3 — border ring OVERWRITTEN with bit 0."""
    got, _ = _vmask([-3, -1], window_size=3)
    gt = np.array(
        [[B0, B0, B0, B0], [B0, B1, B2, B0], [B0, B0, B0, B0]], np.uint16
    )
    np.testing.assert_array_equal(got, gt)


def test_to_disp_validity_mask_offset_positive():
    """reference :363-414: window 3, disp [1, 2]."""
    got, _ = _vmask([1, 2], window_size=3)
    gt = np.array(
        [[B0, B0, B0, B0], [B0, B2, B1, B0], [B0, B0, B0, B0]], np.uint16
    )
    np.testing.assert_array_equal(got, gt)


def test_to_disp_validity_mask_offset_mixed():
    """reference :416-469: window 3, disp [-1, 1]."""
    got, _ = _vmask([-1, 1], window_size=3)
    gt = np.array(
        [[B0, B0, B0, B0], [B0, B2, B2, B0], [B0, B0, B0, B0]], np.uint16
    )
    np.testing.assert_array_equal(got, gt)


def test_to_disp_validity_mask_offset_variable_grids():
    """reference :471-538: window 3 + variable grids."""
    disp_min_grid = np.array([[-3, -2, -3, -1], [-2, -2, -1, -3], [-1, -2, -2, -3]])
    disp_max_grid = np.array([[-1, -1, -2, 0], [0, -1, 0, 0], [0, 0, -1, -1]])
    got, _ = _vmask(np.array([disp_min_grid, disp_max_grid], np.float32), window_size=3)
    gt = np.array(
        [[B0, B0, B0, B0], [B0, B2 + B1, B2, B0], [B0, B0, B0, B0]], np.uint16
    )
    np.testing.assert_array_equal(got, gt)


def _approx_right_vmask(disp):
    left = make_image(LEFT, disp=disp)
    right = make_image(RIGHT)
    mc = make_step(
        "matching_cost", {"matching_cost_method": "sad", "window_size": 1, "subpix": 1}
    )
    cv = mc.compute(left, right, int(disp[0]), int(disp[1]))
    wta = make_step("disparity", {"disparity_method": "wta", "invalid_disparity": 0})
    ds = wta.approximate_right_disparity(cv, right)
    return np.asarray(ds.validity_mask)


def test_approximate_right_validity_mask_mixed():
    """reference :540-605: left disp [-2, 1] → right candidates [-1, 2]."""
    got = _approx_right_vmask([-2, 1])
    gt = np.array([[B2, 0, B2, B2]] * 3, np.uint16)
    np.testing.assert_array_equal(got, gt)


def test_approximate_right_validity_mask_from_positive():
    """reference :607-659: left disp [1, 2] → right candidates [-2, -1]."""
    got = _approx_right_vmask([1, 2])
    gt = np.array([[B1, B2, 0, 0]] * 3, np.uint16)
    np.testing.assert_array_equal(got, gt)


def test_approximate_right_validity_mask_from_negative():
    """reference :661-717: left disp [-2, -1] → right candidates [1, 2]."""
    got = _approx_right_vmask([-2, -1])
    gt = np.array([[0, 0, B2, B1]] * 3, np.uint16)
    np.testing.assert_array_equal(got, gt)
