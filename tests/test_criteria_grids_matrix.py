"""Criteria-bit matrices ported from the reference's remaining
``test_criteria.py`` parametrizations (round-5 VERDICT #3): variable
disparity GRIDS through ``mask_invalid_variable_disparity_range``
(test_criteria.py:196-335), the 10x10 triangular-nodata right mask with
mixed range [-3, 2] (":1253 'Positive and negative disparity range on
flag 1'"), and the all-nodata 1x4 "Possible constant duplication" case.
Expected uint16 masks are the reference's hand-computed values,
transcribed bit-for-bit.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pandora_tpu import constants as cst
from pandora_tpu.criteria import mask_invalid_variable_disparity_range, validity_mask
from pandora_tpu.datamodel import make_image
from pandora_tpu.ops import cost_volume as cv_ops
from pandora_tpu.ops.local_costs import sad_ssd_cost_volume
from pandora_tpu.steps.matching_cost import SadMatchingCost

B = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
M = cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING
I = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE  # noqa: E741
L = cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT
R = cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT
V = cst.PANDORA_MSK_PIXEL_INCOMPLETE_VARIABLE_DISPARITY_RANGE

LEFT_IM = np.array([[1, 2, 4, 6], [2, 4, 1, 6], [6, 7, 8, 10]], np.float32)
RIGHT_IM = np.array([[6, 1, 2, 4], [6, 2, 4, 1], [10, 6, 7, 8]], np.float32)
# raw user masks, valid_pixels=1 / no_data_mask=2 (the reference fixtures)
LEFT_MSK = np.array([[2, 1, 1, 1], [1, 2, 4, 1], [5, 1, 1, 2]], np.uint8)
RIGHT_MSK = np.array([[1, 1, 3, 5], [4, 1, 1, 1], [2, 2, 4, 6]], np.uint8)


def test_mask_invalid_variable_disparity_range_grids():
    """reference test_criteria.py:196-335: variable min/max grids, both
    input masks, window 1, plus a manually all-NaN cost row — the bit-1
    pass must flag it without touching already-flagged pixels."""
    dmin_grid = np.array([[-4, -2, -3, -1], [-2, -2, -1, -3], [-1, -2, -2, -3]], np.float32)
    dmax_grid = np.array([[1, -1, -2, 0], [0, -1, 0, 0], [0, 0, -1, -1]], np.float32)
    dmin, dmax = -4, 1

    left = make_image(
        LEFT_IM, disp=np.stack([dmin_grid, dmax_grid]), msk=LEFT_MSK,
        valid_pixels=1, no_data_mask=2,
    )
    right = make_image(RIGHT_IM, msk=RIGHT_MSK, valid_pixels=1, no_data_mask=2)

    vmask = validity_mask(
        dmin, dmax, 0, 1, jnp.zeros(LEFT_IM.shape, jnp.uint8),
        left.std_msk(), right.std_msk(), left.disp_min, left.disp_max,
    )
    # the reference drives this pass on the volume BEFORE cv_masked
    # (test_criteria.py:317-331 calls compute_cost_volume only), so only
    # image-range NaNs + per-pixel grid exclusions are present
    cv = sad_ssd_cost_volume(left.im[0], right.im[0], dmin, dmax, 1, 1, False)
    disp_vals = jnp.asarray(cv_ops.disparity_range(dmin, dmax, 1), jnp.float32)
    cv = cv_ops.apply_cv_masks(
        cv, None, None, disp_vals, left.disp_min, left.disp_max, dmin, dmax, 1
    )
    # the reference sets one pixel's whole disparity axis to NaN by hand
    cv = cv.at[1, 0, :].set(jnp.nan)
    got = np.asarray(mask_invalid_variable_disparity_range(cv, vmask))

    gt = np.array(
        [
            [B + I + V, I + V, I + V, I + V],
            [I + M + V, B + I + V, L + I, I + V],
            [L + I + M + V, I + V, I + V, I + B + V],
        ],
        np.uint16,
    )
    np.testing.assert_array_equal(got, gt)


def test_validity_mask_triangular_nodata_mixed_range():
    """reference test_criteria.py "Positive and negative disparity range on
    flag 1": 10x10, right nodata everywhere above the -2 subdiagonal
    (np.tril(ones, -1.5), valid_pixels=1, no_data_mask=0), disp [-3, 2],
    window 3 — bits 1/2/12 accumulate over the shifted range, border ring
    overwrites."""
    left_im = np.ones((10, 10), np.float32)
    right_im = np.ones((10, 10), np.float32)
    left_msk = np.ones((10, 10), np.uint8)
    right_msk = np.tril(np.ones((10, 10), np.uint8), -1.5)

    left = make_image(left_im, disp=(-3, 2), msk=left_msk, valid_pixels=1, no_data_mask=0)
    right = make_image(right_im, msk=right_msk, valid_pixels=1, no_data_mask=0)
    step = SadMatchingCost(matching_cost_method="sad", window_size=3, subpix=1)
    cv = step.compute(left, right, -3, 2)
    got = np.asarray(cv.validity_mask)

    gt = np.array(
        [
            [B, B, B, B, B, B, B, B, B, B],
            [B, M+I+V, M+I+V, M+I+V, M+V, M+V, M+V, M+I+V, M+I+V, B],
            [B, M+I+V, M+I+V, M+I+V, M+V, M+V, M+V, M+I+V, M+I+V, B],
            [B, M+I+V, M+I+V, M+I+V, M+V, M+V, M+V, M+I+V, M+I+V, B],
            [B, I+V, I+V, I+V, V, M+V, M+V, M+I+V, M+I+V, B],
            [B, I+V, I+V, I+V, V, V, M+V, M+I+V, M+I+V, B],
            [B, I+V, I+V, I, V, V, V, M+I+V, M+I+V, B],
            [B, I+V, I+V, I, 0, V, V, I+V, M+I+V, B],
            [B, I+V, I+V, I, 0, 0, V, I+V, I+V, B],
            [B, B, B, B, B, B, B, B, B, B],
        ],
        np.uint16,
    )
    np.testing.assert_array_equal(got, gt)


def test_validity_mask_all_nodata_constant_duplication():
    """reference test_criteria.py "Possible constant duplication": a 1x4
    strip whose left is nodata except the last pixel and whose right is
    ALL nodata — every pixel collects bit 1 over the whole range, the
    nodata dilation sets bit 0, and the (grid-backed) bit-12 accumulates."""
    left_im = np.array([[1, 2, 4, 6]], np.float32)
    right_im = np.array([[6, 1, 2, 4]], np.float32)
    left_msk = np.array([[2, 2, 2, 1]], np.uint8)
    right_msk = np.array([[2, 2, 2, 2]], np.uint8)

    left = make_image(left_im, disp=(-1, 1), msk=left_msk, valid_pixels=1, no_data_mask=2)
    right = make_image(right_im, msk=right_msk, valid_pixels=1, no_data_mask=2)
    step = SadMatchingCost(matching_cost_method="sad", window_size=1, subpix=1)
    cv = step.compute(left, right, -1, 1)
    got = np.asarray(cv.validity_mask)

    gt = np.array([[M + I + B + V, M + B + V, M + B + V, M + I + V]], np.uint16)
    np.testing.assert_array_equal(got, gt)


@pytest.mark.parametrize(
    "disp,expected_id",
    [((-1, 1), "mixed"), ((-2, -1), "neg"), ((1, 2), "pos")],
)
def test_validity_mask_right_mask_window1_no_left(disp, expected_id):
    """reference test_criteria.py:337-600 right-mask-only rows (window 1,
    no left mask): bits 1/7 only."""
    gts = {
        "mixed": np.array([[0, 0, 0, R], [0, 0, 0, 0], [M, 0, 0, R]], np.uint16),
        "neg": np.array([[0, 0, 0, 0], [0, R, 0, 0], [0, M, M, 0]], np.uint16),
        "pos": np.array([[0, R, R, 0], [0, 0, 0, 0], [0, R, R, 0]], np.uint16),
    }
    right = make_image(RIGHT_IM, msk=RIGHT_MSK, valid_pixels=1, no_data_mask=2)
    base = validity_mask(
        disp[0], disp[1], 0, 1, jnp.zeros(LEFT_IM.shape, jnp.uint8)
    )
    full = validity_mask(
        disp[0], disp[1], 0, 1, jnp.zeros(LEFT_IM.shape, jnp.uint8),
        None, right.std_msk(),
    )
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(base) + gts[expected_id]
    )
