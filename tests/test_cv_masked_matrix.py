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
