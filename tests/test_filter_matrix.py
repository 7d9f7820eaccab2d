"""Hand-computed filter matrices ported from the reference suite
(tests/test_filter.py:40-690): the four median-filter validity cases and
the bilateral closed-form center-pixel formulas (valid pixels, NaNs,
invalid center)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pandora_tpu.constants as cst
from pandora_tpu.datamodel import make_image
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


INT_INF = np.array(
    [[4, 5, 7, 7, 8], [5, 84, 0, 35, 4], [2, 7, 21, 10, 1], [5, 0, 8, 1, 3]], np.float32
)
INT_SUP = np.array(
    [[6, 7, 9, 9, 10], [7, 86, 2, 37, 6], [4, 10, 23, 12, 3], [7, 2, 10, 3, 5]], np.float32
)


def _interval_ds(bands, names):
    from pandora_tpu.datamodel import DisparityMap  # noqa: PLC0415

    return DisparityMap(
        disparity_map=jnp.zeros((4, 5), jnp.float32),
        validity_mask=jnp.zeros((4, 5), jnp.uint16),
        confidence=jnp.stack([jnp.asarray(b) for b in bands], axis=2),
        indicator_names=names,
    )


def test_median_for_intervals_matrix():
    """reference test_filter.py:696-727: 3x3 nanmedian on the interval
    bands, borders untouched."""
    from pandora_tpu.steps.base import PipelineState, make_step

    ds = _interval_ds(
        (INT_INF, INT_SUP),
        ("confidence_from_interval_bounds_inf", "confidence_from_interval_bounds_sup"),
    )
    img = make_image(np.zeros((4, 5), np.float32))
    state = PipelineState(left_img=img, right_img=img, left_disparity=ds)
    make_step("filter", {"filter_method": "median_for_intervals", "filter_size": 3}).run(state)
    gt_inf = np.array(
        [[4, 5, 7, 7, 8], [5, 5, 7, 7, 4], [2, 5, 8, 4, 1], [5, 0, 8, 1, 3]], np.float32
    )
    gt_sup = np.array(
        [[6, 7, 9, 9, 10], [7, 7, 10, 9, 6], [4, 7, 10, 6, 3], [7, 2, 10, 3, 5]], np.float32
    )
    np.testing.assert_array_equal(np.asarray(ds.confidence[:, :, 0]), gt_inf)
    np.testing.assert_array_equal(np.asarray(ds.confidence[:, :, 1]), gt_sup)


def test_median_for_intervals_with_regularization_matrix():
    """reference test_filter.py:729-801: regularization re-run groups
    ambiguous segments (threshold 0.8, depth 2, quantile 0.8) and stamps
    bit 11 (2048) on regularized pixels."""
    from pandora_tpu.steps.base import PipelineState, make_step

    amb = np.array(
        [
            [1.0, 0.7, 1.0, 1.0, 1.0],
            [0.7, 1.0, 1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0, 1.0, 0.7],
            [1.0, 1.0, 1.0, 0.7, 1.0],
        ],
        np.float32,
    )
    ds = _interval_ds(
        (amb, INT_INF, INT_SUP),
        (
            "confidence_from_ambiguity",
            "confidence_from_interval_bounds_inf",
            "confidence_from_interval_bounds_sup",
        ),
    )
    img = make_image(np.zeros((4, 5), np.float32))
    state = PipelineState(left_img=img, right_img=img, left_disparity=ds)
    make_step(
        "filter",
        {
            "filter_method": "median_for_intervals",
            "filter_size": 3,
            "regularization": True,
            "ambiguity_kernel_size": 3,
            "ambiguity_threshold": 0.8,
            "vertical_depth": 2,
            "quantile_regularization": 0.8,
        },
    ).run(state)
    gt_inf = np.array(
        [[4.8, 4.8, 4.8, 7, 8], [4.8, 4.8, 7, 7, 4], [2, 5, 8, 2.2, 1], [5, 0, 2.2, 2.2, 3]],
        np.float32,
    )
    gt_sup = np.array(
        [[7.4, 7.4, 7.4, 9, 10], [7.4, 7.4, 10, 9, 6], [4, 7, 10, 8.4, 3], [7, 2, 8.4, 8.4, 5]],
        np.float32,
    )
    gt_vmask = np.array(
        [[2048, 2048, 2048, 0, 0], [2048, 2048, 0, 0, 0], [0, 0, 0, 2048, 0], [0, 0, 2048, 2048, 0]],
        np.uint16,
    )
    np.testing.assert_allclose(np.asarray(ds.confidence[:, :, 1]), gt_inf, 1e-7, 1e-7)
    np.testing.assert_allclose(np.asarray(ds.confidence[:, :, 2]), gt_sup, 1e-7, 1e-7)
    np.testing.assert_array_equal(np.asarray(ds.validity_mask), gt_vmask)
