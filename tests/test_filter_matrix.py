"""Hand-computed filter matrices ported from the reference suite
(tests/test_filter.py:40-690): the four median-filter validity cases and
the bilateral closed-form center-pixel formulas (valid pixels, NaNs,
invalid center)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pandora_tpu.constants as cst
from pandora_tpu.ops.filters import bilateral_filter_disparity, median_filter_disparity

INV = cst.PANDORA_MSK_PIXEL_INVALID


def _median(disp, vmask, size):
    return np.asarray(
        median_filter_disparity(
            jnp.asarray(disp), jnp.asarray(vmask), INV, size
        )
    )


def test_median_case1():
    """reference test_filter.py Case1: information bits stay filterable."""
    disp = np.array(
        [[5, 6, 7, 8, 9], [6, 85, 1, 36, 5], [5, 9, 23, 12, 2], [6, 1, 9, 2, 4]],
        np.float32,
    )
    valid = np.zeros((4, 5), np.uint16)
    valid[1, 1] = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
    valid[2, 1] = cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION
    valid[3, 4] = cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION
    gt = np.array(
        [[5, 6, 7, 8, 9], [6, 6, 9, 8, 5], [5, 6, 9, 5, 2], [6, 1, 9, 2, 4]],
        np.float32,
    )
    np.testing.assert_array_equal(_median(disp, valid, 3), gt)


DISP2 = np.array(
    [[7, 8, 4, 5, 5], [5, 9, 4, 3, 8], [5, 2, 7, 2, 2], [6, 1, 9, 2, 4]], np.float32
)


def test_median_case2():
    """reference Case2: invalid bits exclude pixels from windows AND from
    writeback."""
    valid = np.array(
        [
            [
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE,
                0,
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE,
                cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION + cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER,
                0,
            ],
            [
                cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT,
                cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER,
                cst.PANDORA_MSK_PIXEL_OCCLUSION,
                0,
                0,
            ],
            [
                cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT,
                cst.PANDORA_MSK_PIXEL_MISMATCH,
                cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING,
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
                + cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION,
                0,
            ],
            [
                cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING,
                cst.PANDORA_MSK_PIXEL_OCCLUSION,
                cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT,
                0,
                cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING,
            ],
        ],
        np.uint16,
    )
    gt = np.array(
        [[7, 8, 4, 5, 5], [5, 9, 4, 3.5, 8], [5, 2, 7, 2, 2], [6, 1, 9, 2, 4]],
        np.float32,
    )
    np.testing.assert_array_equal(_median(DISP2, valid, 3), gt)


def test_median_case3():
    """reference Case3."""
    valid = np.array(
        [
            [
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE,
                0,
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE,
                cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION + cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER,
                0,
            ],
            [0, 0, cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION, 0, 0],
            [
                0,
                0,
                0,
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
                + cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION,
                0,
            ],
            [cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT, 0, 0, 0, 0],
        ],
        np.uint16,
    )
    gt = np.array(
        [[7, 8, 4, 5, 5], [5, 5, 4, 4, 8], [5, 5, 3, 4, 2], [6, 1, 9, 2, 4]],
        np.float32,
    )
    np.testing.assert_array_equal(_median(DISP2, valid, 3), gt)


def test_median_case4_window5():
    """reference Case4: filter_size 5."""
    disp = np.array(
        [[7, 8, 4, 5, 5], [5, 9, 4, 3, 8], [5, 2, 7, 2, 2], [6, 1, 9, 2, 4], [1, 6, 2, 7, 8]],
        np.float32,
    )
    valid = np.array(
        [
            [
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE,
                0,
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE,
                cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION + cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER,
                0,
            ],
            [0, 0, cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION, 0, 0],
            [
                0,
                0,
                0,
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
                + cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION,
                0,
            ],
            [cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT, 0, 0, 0, 0],
            [
                cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT,
                0,
                cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE,
                cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING
                + cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION,
                0,
            ],
        ],
        np.uint16,
    )
    gt = np.array(
        [[7, 8, 4, 5, 5], [5, 9, 4, 3, 8], [5, 2, 5, 2, 2], [6, 1, 9, 2, 4], [1, 6, 2, 7, 8]],
        np.float32,
    )
    np.testing.assert_array_equal(_median(disp, valid, 5), gt)


# --- bilateral (reference test_filter.py:310-690) ---------------------------


def _gauss(x, sigma):
    return np.exp(-((x / sigma) ** 2) * 0.5) / (sigma * np.sqrt(2 * np.pi))


def _spatial_kernel(size, sigma):
    half = size // 2
    yy, xx = np.mgrid[-half : half + 1, -half : half + 1]
    return _gauss(np.sqrt(yy**2 + xx**2), sigma)


DISP5 = np.array(
    [[5, 6, 7, 8, 9], [6, 85, 1, 36, 5], [5, 9, 23, 12, 2], [6, 1, 9, 2, 4], [6, 7, 4, 2, 1]],
    np.float32,
)


def test_bilateral_on_valid_pixels():
    """reference test_filter.py:373-470: interior pixel = closed-form
    spatial x color gaussian average."""
    valid = np.zeros((5, 5), np.uint16)
    got = np.asarray(
        bilateral_filter_disparity(jnp.asarray(DISP5), jnp.asarray(valid), INV, 4.0, 6.0)
    )
    weights = _spatial_kernel(5, 6.0) * _gauss(DISP5 - 23.0, 4.0)
    filtered = float(np.sum(DISP5 * weights) / np.sum(weights))
    assert abs(got[2, 2] - filtered) < 1e-5
    # the window size int(3*sigma_space+1)=19 > map extent: only the center
    # pixel has a full window; everything else keeps its value
    np.testing.assert_allclose(np.delete(got.ravel(), 12), np.delete(DISP5.ravel(), 12))


def test_bilateral_with_invalid_center():
    """reference test_filter.py:618-686: an invalid center is not
    rewritten, and invalid pixels never contribute weight."""
    valid = np.zeros((5, 5), np.uint16)
    valid[2, 2] = cst.PANDORA_MSK_PIXEL_OCCLUSION
    got = np.asarray(
        bilateral_filter_disparity(jnp.asarray(DISP5), jnp.asarray(valid), INV, 4.0, 6.0)
    )
    np.testing.assert_allclose(got, DISP5)


def test_bilateral_with_nans():
    """reference test_filter.py:472-616: NaN neighbours are excluded from
    the weighted sum."""
    disp = DISP5.copy()
    disp[1, 1] = np.nan
    valid = np.zeros((5, 5), np.uint16)
    valid[1, 1] = INV
    got = np.asarray(
        bilateral_filter_disparity(jnp.asarray(disp), jnp.asarray(valid), INV, 4.0, 6.0)
    )
    w = _spatial_kernel(5, 6.0) * _gauss(np.nan_to_num(disp - 23.0), 4.0)
    w[1, 1] = 0.0
    filtered = float(np.nansum(disp * w) / np.sum(w))
    assert abs(got[2, 2] - filtered) < 1e-5
    assert np.isnan(got[1, 1])
