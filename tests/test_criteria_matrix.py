"""Criteria-bit semantics matrix, ported from the reference's deepest suite
(tests/test_criteria.py:723-1310 ``test_validity_mask``): hand-built images
with left/right input masks, every disparity-range sign, and hand-computed
expected uint16 masks.  The chain under test is the step-level one — cost
volume + cv_masked + validity criteria + all-NaN bit + border overwrite
(steps/matching_cost._compute_cv), exactly what the reference test drives
through validity_mask + compute_cost_volume + cv_masked."""

import numpy as np
import pytest

from pandora_tpu import constants as cst
from pandora_tpu.datamodel import make_image
from pandora_tpu.steps.matching_cost import SadMatchingCost

B = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
M = cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING
I = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE  # noqa: E741
L = cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT
R = cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT
V = cst.PANDORA_MSK_PIXEL_INCOMPLETE_VARIABLE_DISPARITY_RANGE

LEFT_IM = np.array([[1, 2, 4, 6], [2, 4, 1, 6], [6, 7, 8, 10]], np.float32)
RIGHT_IM = np.array([[6, 1, 2, 4], [6, 2, 4, 1], [10, 6, 7, 8]], np.float32)
# user masks with valid_pixels=1 / no_data_mask=2, converted to the internal
# convention (img_tools.add_mask, img_tools.py:287-316): 0 valid, 1 nodata,
# 2 invalidated-by-input-mask
LEFT_MSK = np.array([[1, 0, 0, 0], [0, 1, 2, 0], [2, 0, 0, 1]], np.int16)
RIGHT_MSK = np.array([[0, 0, 2, 2], [2, 0, 0, 0], [1, 1, 2, 2]], np.int16)


@pytest.mark.parametrize(
    ("left_im", "right_im", "left_msk", "right_msk", "disp", "window", "gt"),
    [
        pytest.param(
            LEFT_IM,
            RIGHT_IM,
            LEFT_MSK,
            RIGHT_MSK,
            (-1, 1),
            1,
            np.array(
                [
                    [I + B + M + V, V, V, I + R + M + V],
                    [I + V, B + M + V, L + M, I + V],
                    [I + L + M + V, M + V, M + V, I + B + R + M + V],
                ],
                np.uint16,
            ),
            id="pos-and-neg-range",
        ),
        pytest.param(
            LEFT_IM,
            RIGHT_IM,
            LEFT_MSK,
            RIGHT_MSK,
            (-2, -1),
            1,
            np.array(
                [
                    [M + B + V, I + V, 0, V],
                    [M + V, B + I + R + M + V, L + M + V, 0],
                    [M + L + V, I + M + V, M + V, B + M + V],
                ],
                np.uint16,
            ),
            id="negative-range",
        ),
        pytest.param(
            LEFT_IM,
            RIGHT_IM,
            LEFT_MSK,
            RIGHT_MSK,
            (1, 2),
            1,
            np.array(
                [
                    [B + M + V, R + M + V, R + I + M + V, M + V],
                    [0, B + M, I + L + M + V, M + V],
                    [L + M + V, R + M + V, R + I + M + V, B + M + V],
                ],
                np.uint16,
            ),
            id="positive-range",
        ),
        pytest.param(
            np.array(
                [[1, 2, 4, 6, 1], [2, 4, 1, 6, 1], [6, 7, 8, 10, 1], [0, 5, 6, 7, 8]],
                np.float32,
            ),
            np.array(
                [[6, 1, 2, 4, 1], [6, 2, 4, 1, 6], [10, 6, 7, 8, 1], [5, 6, 7, 8, 0]],
                np.float32,
            ),
            np.array(
                [[1, 0, 0, 0, 0], [0, 1, 2, 0, 0], [2, 1, 0, 0, 0], [0, 0, 0, 0, 0]],
                np.int16,
            ),
            np.array(
                [[0, 0, 0, 1, 0], [2, 0, 0, 0, 0], [1, 0, 0, 2, 0], [2, 0, 0, 0, 0]],
                np.int16,
            ),
            (-1, 1),
            3,
            np.array(
                [
                    [B, B, B, B, B],
                    [B, I + B + M + V, B + M + L, I + M, B],
                    [B, I + B + M + V, B + M + V, I + V, B],
                    [B, B, B, B, B],
                ],
                np.uint16,
            ),
            id="window-3-border",
        ),
    ],
)
def test_validity_mask_matrix(left_im, right_im, left_msk, right_msk, disp, window, gt):
    left = make_image(left_im, disp=disp, msk=left_msk)
    right = make_image(right_im, msk=right_msk)
    step = SadMatchingCost(matching_cost_method="sad", window_size=window, subpix=1)
    cv = step.compute(left, right, disp[0], disp[1])
    np.testing.assert_array_equal(np.asarray(cv.validity_mask), gt)
