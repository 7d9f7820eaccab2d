"""cv_masked NaN-position matrices ported from the reference suite
(tests/test_matching_cost/test_matching_cost.py TestCvMasked): the FULL
np.isnan(cost_volume) boolean tensor — border loop bounds, out-of-range
right positions and input-mask invalidation together — for every cost
family (the NaN layout is method-independent)."""

import numpy as np
import pytest

from pandora_tpu.datamodel import make_image
from pandora_tpu.steps.base import PipelineState, make_step

LEFT_4x5 = np.array(
    [[1, 1, 1, 3, 4], [1, 2, 1, 0, 2], [2, 1, 0, 1, 2], [1, 1, 1, 1, 4]], np.float32
)
RIGHT_4x5 = np.array(
    [[5, 1, 2, 3, 4], [1, 2, 1, 0, 2], [2, 2, 0, 1, 4], [1, 1, 1, 1, 2]], np.float32
)
LEFT_6x7 = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0],
        [0, 1, 1, 1, 3, 4, 0],
        [0, 1, 2, 1, 0, 2, 0],
        [0, 2, 1, 0, 1, 2, 0],
        [0, 1, 1, 1, 1, 4, 0],
        [0, 0, 0, 0, 0, 0, 0],
    ],
    np.float32,
)
RIGHT_6x7 = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0],
        [0, 5, 1, 2, 3, 4, 0],
        [0, 1, 2, 1, 0, 2, 0],
        [0, 2, 2, 0, 1, 4, 0],
        [0, 1, 1, 1, 1, 2, 0],
        [0, 0, 0, 0, 0, 0, 0],
    ],
    np.float32,
)

T, F = True, False


def _nan_mask(left, right, lmsk, rmsk, window, method):
    li = make_image(left, disp=[-1, 1], msk=lmsk)
    ri = make_image(right, msk=rmsk)
    state = PipelineState(left_img=li, right_img=ri)
    make_step(
        "matching_cost",
        {"matching_cost_method": method, "window_size": window, "subpix": 1},
    ).run(state)
    return np.isnan(np.asarray(state.left_cv.cv))


@pytest.mark.parametrize("method", ["census", "sad", "ssd", "zncc"])
def test_cv_masked_both_sides_window3(method):
    """reference id='Invalids present on both sides' (w3, 4x5)."""
    lmsk = np.array(
        [[1, 0, 0, 2, 0], [0, 0, 0, 0, 0], [0, 0, 2, 0, 0], [2, 0, 0, 0, 1]], np.int16
    )
    rmsk = np.array(
        [[0, 2, 0, 0, 1], [0, 0, 0, 0, 0], [0, 0, 0, 2, 0], [1, 0, 2, 0, 0]], np.int16
    )
    gt = np.moveaxis(
        np.array(
            [
                [
                    [T, T, T, T, T],
                    [T, T, F, F, T],
                    [T, T, T, T, T],
                    [T, T, T, T, T],
                ],
                [
                    [T, T, T, T, T],
                    [T, T, F, T, T],
                    [T, T, T, T, T],
                    [T, T, T, T, T],
                ],
                [
                    [T, T, T, T, T],
                    [T, T, T, T, T],
                    [T, F, T, T, T],
                    [T, T, T, T, T],
                ],
            ]
        ),
        0,
        -1,
    )
    np.testing.assert_array_equal(
        _nan_mask(LEFT_4x5, RIGHT_4x5, lmsk, rmsk, 3, method), gt
    )


@pytest.mark.parametrize("method", ["census", "sad", "ssd", "zncc"])
def test_cv_masked_both_sides_window5(method):
    """reference id='Invalids present on both sides with window size of
    5' (w5, 6x7)."""
    lmsk = np.array(
        [
            [2, 0, 0, 0, 0, 0, 1],
            [0, 0, 0, 0, 0, 0, 0],
            [0, 2, 0, 0, 0, 0, 0],
            [0, 0, 0, 2, 0, 0, 0],
            [0, 0, 0, 0, 0, 2, 0],
            [1, 0, 0, 0, 0, 0, 2],
        ],
        np.int16,
    )
    rmsk = np.array(
        [
            [1, 0, 0, 0, 0, 0, 2],
            [0, 0, 0, 0, 0, 0, 0],
            [2, 0, 2, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 2],
            [0, 0, 0, 0, 0, 0, 0],
            [2, 0, 0, 0, 0, 0, 1],
        ],
        np.int16,
    )
    gt = np.moveaxis(
        np.array(
            [
                [
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, F, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                ],
                [
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, T, F, T, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                ],
                [
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, F, F, T, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                    [T, T, T, T, T, T, T],
                ],
            ]
        ),
        0,
        -1,
    )
    np.testing.assert_array_equal(
        _nan_mask(LEFT_6x7, RIGHT_6x7, lmsk, rmsk, 5, method), gt
    )


@pytest.mark.parametrize("method", ["census", "sad", "ssd", "zncc"])
def test_cv_masked_with_disparity_grids(method):
    """reference TestCvMaskedWithGrid test_pixellic (w3, 4x11, per-pixel
    disparity grids, no input masks): the CV is allocated over the
    extremal range and per-pixel grids carve the valid (col, disp) set."""
    left = np.array(
        [
            [1, 1, 1, 3, 2, 1, 7, 2, 3, 4, 6],
            [1, 3, 2, 5, 2, 6, 1, 8, 7, 0, 4],
            [2, 1, 0, 1, 7, 9, 5, 4, 9, 1, 5],
            [1, 5, 4, 3, 2, 6, 7, 6, 5, 2, 1],
        ],
        np.float32,
    )
    right = np.array(
        [
            [5, 1, 2, 3, 4, 7, 9, 6, 5, 2, 7],
            [1, 3, 0, 2, 5, 3, 7, 8, 7, 6, 5],
            [2, 3, 5, 0, 1, 5, 6, 5, 2, 3, 6],
            [1, 6, 7, 5, 3, 2, 1, 0, 3, 4, 7],
        ],
        np.float32,
    )
    dmin_grid = np.array(
        [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, -8, -8, -5, -8, -4, -6, -7, -9, -8, 0],
            [0, -9, -8, -4, -6, -5, -7, -8, -9, -7, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
        np.float32,
    )
    dmax_grid = np.array(
        [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, -2, -1, -1, -5, -1, -2, -6, -4, -3, 0],
            [0, -3, 0, -2, -2, -2, -3, -5, -5, -4, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
        np.float32,
    )
    li = make_image(left, disp=np.stack([dmin_grid, dmax_grid]))
    ri = make_image(right)
    state = PipelineState(left_img=li, right_img=ri)
    make_step(
        "matching_cost",
        {"matching_cost_method": method, "window_size": 3, "subpix": 1},
    ).run(state)
    got = np.isnan(np.asarray(state.left_cv.cv))

    def row(cols_false):
        r = [T] * 11
        for c in cols_false:
            r[c] = F
        return r

    planes = [
        [[T] * 11, [T] * 11, [T] * 11, [T] * 11],  # d = -9
        [[T] * 11, row([9]), [T] * 11, [T] * 11],  # d = -8
        [[T] * 11, row([8, 9]), row([8, 9]), [T] * 11],  # d = -7
        [[T] * 11, row([7, 8, 9]), row([7, 8, 9]), [T] * 11],  # d = -6
        [[T] * 11, row([6, 8, 9]), row([6, 7, 8, 9]), [T] * 11],  # d = -5
        [[T] * 11, row([5, 6, 8, 9]), row([5, 6, 9]), [T] * 11],  # d = -4
        [[T] * 11, row([5, 6, 9]), row([4, 5, 6]), [T] * 11],  # d = -3
        [[T] * 11, row([3, 5, 6]), row([3, 4, 5]), [T] * 11],  # d = -2
        [[T] * 11, row([2, 3, 5]), row([2]), [T] * 11],  # d = -1
        [[T] * 11, [T] * 11, row([2]), [T] * 11],  # d = 0
    ]
    gt = np.moveaxis(np.array(planes), 0, -1)
    np.testing.assert_array_equal(got, gt)


@pytest.mark.parametrize("method", ["census", "sad", "ssd", "zncc"])
def test_cv_masked_subpix2_custom_mask_convention(method):
    """reference TestCvMasked test_subpixellic 'Subpix: 2' (w3, 4x5):
    custom mask conventions (valid_pixels=5, no_data_mask=7) translate to
    the standard one before masking (Image.std_msk)."""
    lmsk = np.array(
        [[5, 56, 5, 12, 5], [5, 5, 5, 5, 5], [5, 5, 5, 5, 5], [3, 5, 4, 5, 7]],
        np.int16,
    )
    rmsk = np.array(
        [[7, 5, 5, 5, 5], [5, 5, 5, 65, 5], [5, 5, 5, 5, 5], [5, 23, 5, 5, 2]],
        np.int16,
    )
    li = make_image(LEFT_4x5, disp=[-1, 1], msk=lmsk, valid_pixels=5, no_data_mask=7)
    ri = make_image(RIGHT_4x5, msk=rmsk, valid_pixels=5, no_data_mask=7)
    state = PipelineState(left_img=li, right_img=ri)
    make_step(
        "matching_cost",
        {"matching_cost_method": method, "window_size": 3, "subpix": 2},
    ).run(state)
    got = np.isnan(np.asarray(state.left_cv.cv))
    gt = np.moveaxis(
        np.array(
            [
                [
                    [T, T, T, T, T],
                    [T, T, T, F, T],
                    [T, T, F, T, T],
                    [T, T, T, T, T],
                ],
                [
                    [T, T, T, T, T],
                    [T, T, T, T, T],
                    [T, T, F, T, T],
                    [T, T, T, T, T],
                ],
                [
                    [T, T, T, T, T],
                    [T, T, F, T, T],
                    [T, F, F, T, T],
                    [T, T, T, T, T],
                ],
                [
                    [T, T, T, T, T],
                    [T, T, T, T, T],
                    [T, F, F, T, T],
                    [T, T, T, T, T],
                ],
                [
                    [T, T, T, T, T],
                    [T, F, T, T, T],
                    [T, F, F, T, T],
                    [T, T, T, T, T],
                ],
            ]
        ),
        0,
        -1,
    )
    np.testing.assert_array_equal(got, gt)
