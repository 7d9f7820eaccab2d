"""Input-mask criteria matrices ported from the reference suite
(tests/test_criteria.py:49-720): binary dilation, border overwrite,
left-mask bits 0/6 and right-mask bits 1/7 accumulation over the
disparity range — all against the reference's hand-computed uint16 masks.

The reference tests call allocate_left_mask / allocate_right_mask on a
zero mask; our validity_mask computes range bits + mask bits in one pass,
so each case asserts ``full == range_only + gt`` (the reference's own
``+=`` composition order)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pandora_tpu.constants as cst
from pandora_tpu.criteria import binary_dilation_msk, mask_border, validity_mask

B0 = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
B1 = cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING
L6 = cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT
R7 = cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT


def _internal(msk, valid=1, nodata=2):
    """User mask → internal convention (img_tools.add_mask,
    img_tools.py:287-316): 0 valid, 1 nodata, 2 user-invalidated."""
    out = np.full(msk.shape, 2, np.int16)
    out[msk == valid] = 0
    out[msk == nodata] = 1
    return out


MSK_3x4 = np.array([[2, 1, 1, 1], [1, 2, 4, 1], [5, 1, 1, 2]], np.uint8)
MSK_4x5 = np.array(
    [[2, 1, 1, 1, 1], [1, 2, 4, 1, 1], [5, 2, 1, 1, 1], [1, 1, 1, 1, 1]], np.uint8
)
RMSK_3x4 = np.array([[1, 1, 3, 5], [4, 1, 1, 1], [2, 2, 4, 6]], np.uint8)
RMSK_4x5 = np.array(
    [[1, 1, 1, 2, 1], [5, 1, 1, 1, 1], [2, 1, 1, 6, 1], [0, 1, 1, 1, 1]], np.uint8
)


@pytest.mark.parametrize(
    "msk,window,gt",
    [
        (
            MSK_3x4,
            1,
            np.array(
                [[True, False, False, False], [False, True, False, False], [False, False, False, True]]
            ),
        ),
        (
            MSK_4x5,
            3,
            np.array(
                [
                    [True, True, True, False, False],
                    [True, True, True, False, False],
                    [True, True, True, False, False],
                    [True, True, True, False, False],
                ]
            ),
        ),
    ],
    ids=["window1", "window3"],
)
def test_binary_dilation(msk, window, gt):
    """reference test_criteria.py:91-108."""
    internal = _internal(msk)
    got = np.asarray(binary_dilation_msk(jnp.asarray(internal) == 1, window))
    np.testing.assert_array_equal(got, gt)


def test_mask_border_offset2():
    """reference test_criteria.py:112-160: border ring OVERWRITE."""
    vm = jnp.zeros((4, 5), jnp.uint16)
    got = np.asarray(mask_border(vm, 1))
    gt = np.full((4, 5), B0, np.uint16)
    gt[1:-1, 1:-1] = 0
    np.testing.assert_array_equal(got, gt)


def _masks_case(dmin, dmax, window, shape, left_msk=None, right_msk=None):
    offset = (window - 1) // 2
    zeros = jnp.zeros(shape, jnp.uint8)
    full = validity_mask(
        dmin, dmax, offset, window, zeros,
        jnp.asarray(_internal(left_msk)) if left_msk is not None else None,
        jnp.asarray(_internal(right_msk)) if right_msk is not None else None,
    )
    base = validity_mask(dmin, dmax, offset, window, zeros)
    return np.asarray(full), np.asarray(base)


@pytest.mark.parametrize(
    "msk,window,shape,gt",
    [
        (
            MSK_3x4,
            1,
            (3, 4),
            np.array([[B0, 0, 0, 0], [0, B0, L6, 0], [L6, 0, 0, B0]], np.uint16),
        ),
        (
            MSK_4x5,
            3,
            (4, 5),
            np.array(
                [
                    [B0, B0, B0, 0, 0],
                    [B0, B0, B0 + L6, 0, 0],
                    [B0 + L6, B0, B0, 0, 0],
                    [B0, B0, B0, 0, 0],
                ],
                np.uint16,
            ),
        ),
    ],
    ids=["window1", "window3"],
)
def test_allocate_left_mask(msk, window, shape, gt):
    """reference test_criteria.py:603-686 (disp [-1, 1])."""
    full, base = _masks_case(-1, 1, window, shape, left_msk=msk)
    np.testing.assert_array_equal(full, base + gt)


@pytest.mark.parametrize(
    "rmsk,disp,window,shape,gt",
    [
        (
            RMSK_3x4,
            (-1, 1),
            1,
            (3, 4),
            np.array(
                [[0, 0, 0, R7], [0, 0, 0, 0], [B1, 0, 0, R7]], np.uint16
            ),
        ),
        (
            RMSK_3x4,
            (-2, -1),
            1,
            (3, 4),
            np.array(
                [[0, 0, 0, 0], [0, R7, 0, 0], [0, B1, B1, 0]], np.uint16
            ),
        ),
        (
            RMSK_3x4,
            (1, 2),
            1,
            (3, 4),
            np.array(
                [[0, R7, R7, 0], [0, 0, 0, 0], [0, R7, R7, 0]], np.uint16
            ),
        ),
        (
            RMSK_4x5,
            (-1, 1),
            3,
            (4, 5),
            np.array(
                [
                    [0, 0, 0, B1, B1],
                    [B1, B1, B1, B1, B1],
                    [B1, 0, 0, 0, R7],
                    [B1, 0, 0, 0, 0],
                ],
                np.uint16,
            ),
        ),
    ],
    ids=["mixed", "negative", "positive", "mixed-window3"],
)
def test_allocate_right_mask(rmsk, disp, window, shape, gt):
    """reference test_criteria.py:340-600: bits 1/7 accumulated over the
    shifted disparity range (pre-flagged bit-1 columns excluded)."""
    full, base = _masks_case(disp[0], disp[1], window, shape, right_msk=rmsk)
    np.testing.assert_array_equal(full, base + gt)
