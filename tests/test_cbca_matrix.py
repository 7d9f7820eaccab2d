"""Hand-computed CBCA matrices ported from the reference suite
(tests/test_aggregation.py:40-290): cross-support arm lengths and the
full aggregated volumes for subpix 1 and 2, against the reference's
closed-form ground truths."""

import jax.numpy as jnp
import numpy as np

from pandora_tpu.datamodel import make_image
from pandora_tpu.ops.cbca import cross_support
from pandora_tpu.steps.base import PipelineState, make_step

LEFT = np.array([[5, 1, 15, 7, 3], [10, 9, 11, 9, 6], [1, 18, 4, 5, 9]], np.float32)
RIGHT = np.array([[1, 5, 1, 15, 7], [2, 10, 9, 11, 9], [3, 1, 18, 4, 5]], np.float32)


def test_cross_support_region():
    """reference test_aggregation.py:214-245 (arms on the raw image)."""
    csr = np.asarray(cross_support(jnp.asarray(LEFT), 3, 5.0))
    np.testing.assert_array_equal(
        csr[:, :, 2], np.array([[0, 0, 0, 0, 0], [1, 1, 1, 1, 1], [1, 1, 1, 2, 1]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 3], np.array([[1, 1, 1, 2, 1], [1, 1, 1, 1, 1], [0, 0, 0, 0, 0]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 0], np.array([[0, 1, 1, 1, 1], [0, 1, 2, 2, 1], [0, 1, 1, 1, 1]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 1], np.array([[1, 1, 1, 1, 0], [2, 2, 1, 1, 0], [1, 1, 1, 1, 0]])
    )


def _aggregate(subpix):
    left = make_image(LEFT, disp=[-1, 1])
    right = make_image(RIGHT)
    mc = make_step(
        "matching_cost", {"matching_cost_method": "sad", "window_size": 1, "subpix": subpix}
    )
    state = PipelineState(left_img=left, right_img=right)
    mc.run(state)
    agg = make_step(
        "aggregation", {"aggregation_method": "cbca", "cbca_intensity": 5.0, "cbca_distance": 3}
    )
    agg.run(state)
    return np.asarray(state.left_cv.cv)


def test_compute_cbca():
    """reference test_aggregation.py:247-288."""
    got = _aggregate(1)
    gt = np.array(
        [
            [
                [np.nan, (4 + 4 + 8 + 1) / 4, 0.0],
                [(0 + 7 + 10 + 1) / 4, (4 + 4 + 14 + 8 + 1 + 2) / 6, 0.0],
                [(0 + 10 + 6 + 7 + 1 + 0) / 6, (14 + 4 + 8 + 1 + 2 + 2 + 3) / 7, 0.0],
                [(10 + 6 + 12 + 1 + 0 + 5) / 6, (14 + 8 + 4 + 2 + 2 + 3) / 6, 0.0],
                [(6 + 12 + 0 + 5) / 4, (8 + 4 + 2 + 3 + 2) / 5, np.nan],
            ],
            [
                [np.nan, (4 + 4 + 8 + 1 + 2 + 17) / 6, 0.0],
                [(0 + 10 + 7 + 1 + 15 + 3) / 6, (4 + 4 + 14 + 8 + 1 + 2 + 2 + 17 + 14) / 9, 0.0],
                [(0 + 10 + 6 + 7 + 1 + 0 + 15 + 3 + 13) / 9, (4 + 14 + 8 + 1 + 2 + 2 + 3 + 17 + 14 + 1) / 10, 0.0],
                [(10 + 6 + 12 + 1 + 0 + 5 + 3 + 13 + 5) / 9, (14 + 8 + 4 + 2 + 2 + 3 + 14 + 1 + 4) / 9, 0.0],
                [(6 + 12 + 0 + 5 + 13 + 5) / 6, (2 + 8 + 4 + 2 + 3 + 1 + 4) / 7, np.nan],
            ],
            [
                [np.nan, (2 + 8 + 1 + 17) / 4, 0.0],
                [(7 + 1 + 15 + 3) / 4, (8 + 1 + 2 + 2 + 17 + 14) / 6, 0.0],
                [(7 + 1 + 0 + 15 + 3 + 13) / 6, (1 + 2 + 2 + 17 + 14 + 1 + 3) / 7, 0.0],
                [(1 + 0 + 5 + 3 + 13 + 5) / 6, (2 + 2 + 3 + 14 + 1 + 4) / 6, 0.0],
                [(0 + 5 + 13 + 5) / 4, (2 + 2 + 3 + 1 + 4) / 5, np.nan],
            ],
        ],
        np.float32,
    )
    np.testing.assert_allclose(got, gt, rtol=1e-6)


def test_compute_cbca_subpixel():
    """reference test_aggregation.py:91-212 (subpix 2, 5 disparities)."""
    got = _aggregate(2)
    gt = np.array(
        [
            [
                [np.nan, np.nan, (4 + 4 + 8 + 1) / 4, (2 + 2 + 4 + 0.5 + 1) / 5, 0.0],
                [
                    (0 + 7 + 10 + 1) / 4,
                    (2 + 12 + 3 + 1.5 + 1) / 5,
                    (4 + 4 + 14 + 8 + 1 + 2) / 6,
                    (2 + 2 + 7 + 4 + 0.5 + 1 + 1) / 7,
                    0.0,
                ],
                [
                    (0 + 10 + 6 + 7 + 1 + 0) / 6,
                    (2 + 12 + 1 + 3 + 1.5 + 1 + 4) / 7,
                    (14 + 4 + 8 + 1 + 2 + 2 + 3) / 7,
                    (2 + 7 + 4 + 4 + 0.5 + 1 + 1) / 7,
                    0.0,
                ],
                [
                    (10 + 6 + 12 + 1 + 0 + 5) / 6,
                    (12 + 1 + 8 + 3 + 1.5 + 1 + 4 + 6 + 5.5 + 4.5) / 10,
                    (14 + 8 + 4 + 2 + 2 + 3) / 6,
                    (7 + 4 + 0.5 + 1 + 1) / 5,
                    0.0,
                ],
                [(6 + 12 + 0 + 5) / 4, (1 + 8 + 1.5 + 1 + 4) / 5, (8 + 4 + 2 + 3 + 2) / 5, np.nan, np.nan],
            ],
            [
                [np.nan, np.nan, (4 + 4 + 8 + 1 + 2 + 17) / 6, (2 + 2 + 4 + 0.5 + 1 + 1 + 8.5) / 7, 0.0],
                [
                    (0 + 10 + 7 + 1 + 15 + 3) / 6,
                    (2 + 12 + 3 + 1.5 + 1 + 16 + 5.5) / 7,
                    (4 + 4 + 14 + 8 + 1 + 2 + 2 + 17 + 14) / 9,
                    (2 + 2 + 7 + 4 + 0.5 + 1 + 1 + 1 + 8.5 + 7) / 10,
                    0.0,
                ],
                [
                    (0 + 10 + 6 + 7 + 1 + 0 + 15 + 3 + 13) / 9,
                    (2 + 12 + 1 + 3 + 1.5 + 1 + 4 + 16 + 5.5 + 6) / 10,
                    (4 + 14 + 8 + 1 + 2 + 2 + 3 + 17 + 14 + 1) / 10,
                    (2 + 7 + 4 + 4 + 0.5 + 1 + 1 + 8.5 + 7 + 0.5) / 10,
                    0.0,
                ],
                [
                    (10 + 6 + 12 + 1 + 0 + 5 + 3 + 13 + 5) / 9,
                    (12 + 1 + 8 + 3 + 1.5 + 1 + 4 + 5.5 + 6 + 4.5) / 10,
                    (14 + 8 + 4 + 2 + 2 + 3 + 14 + 1 + 4) / 9,
                    (7 + 4 + 0.5 + 1 + 1 + 7 + 0.5) / 7,
                    0.0,
                ],
                [
                    (6 + 12 + 0 + 5 + 13 + 5) / 6,
                    (1 + 8 + 1.5 + 1 + 4 + 6 + 4.5) / 7,
                    (2 + 8 + 4 + 2 + 3 + 1 + 4) / 7,
                    np.nan,
                    np.nan,
                ],
            ],
            [
                [np.nan, np.nan, (2 + 8 + 1 + 17) / 4, (4 + 0.5 + 1 + 1 + 8.5) / 5, 0.0],
                [
                    (7 + 1 + 15 + 3) / 4,
                    (3 + 1.5 + 1 + 16 + 5.5) / 5,
                    (8 + 1 + 2 + 2 + 17 + 14) / 6,
                    (4 + 0.5 + 1 + 1 + 1 + 8.5 + 7) / 7,
                    0.0,
                ],
                [
                    (7 + 1 + 0 + 15 + 3 + 13) / 6,
                    (3 + 1.5 + 1 + 4 + 16 + 5.5 + 6) / 7,
                    (1 + 2 + 2 + 17 + 14 + 1 + 3) / 7,
                    (4 + 0.5 + 1 + 1 + 8.5 + 7 + 0.5) / 7,
                    0.0,
                ],
                [
                    (1 + 0 + 5 + 3 + 13 + 5) / 6,
                    (1 + 8 + 3 + 1.5 + 1 + 4 + 5.5 + 6 + 4.5 + 12) / 10,
                    (2 + 2 + 3 + 14 + 1 + 4) / 6,
                    (0.5 + 1 + 1 + 7 + 0.5) / 5,
                    0.0,
                ],
                [(0 + 5 + 13 + 5) / 4, (1.5 + 1 + 4 + 6 + 4.5) / 5, (2 + 2 + 3 + 1 + 4) / 5, np.nan, np.nan],
            ],
        ],
        np.float32,
    )
    np.testing.assert_allclose(got, gt, rtol=1e-6)


def test_compute_cbca_with_invalid_cost():
    """reference test_aggregation.py:305-391: input masks NaN costs before
    aggregation; masked pixels are excluded from every cross window and
    stay NaN in the aggregated volume (disp=0 plane ground truth)."""
    left_data = np.array(
        [[5, 1, 15, 7, 3], [10, 9, 11, 9, 6], [1, 18, 4, 5, 9], [5, 1, 15, 7, 3]],
        np.float32,
    )
    left_msk = np.array(
        [[0, 1, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 1, 0], [3, 0, 0, 0, 0]], np.int16
    )
    right_data = np.array(
        [[1, 5, 1, 15, 7], [2, 10, 9, 11, 9], [3, 1, 18, 4, 5], [1, 5, 1, 15, 7]],
        np.float32,
    )
    right_msk = np.array(
        [[0, 0, 0, 0, 0], [0, 0, 5, 1, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0]], np.int16
    )
    left = make_image(left_data, disp=[-1, 1], msk=left_msk)
    right = make_image(right_data, msk=right_msk)
    state = PipelineState(left_img=left, right_img=right)
    make_step(
        "matching_cost", {"matching_cost_method": "sad", "window_size": 1, "subpix": 1}
    ).run(state)
    make_step(
        "aggregation", {"aggregation_method": "cbca", "cbca_intensity": 5.0, "cbca_distance": 3}
    ).run(state)
    got = np.asarray(state.left_cv.cv)[:, :, 1]
    gt = np.array(
        [
            [(4 + 8 + 1) / 3, np.nan, (14 + 8) / 2, (8 + 14 + 4) / 3, (4 + 8 + 3) / 3],
            [(8 + 4 + 1 + 2 + 17) / 5, (8 + 1 + 2 + 17 + 14) / 5, np.nan, np.nan, (8 + 4 + 3 + 4 + 4 + 8) / 6.0],
            [
                (2 + 8 + 1 + 17) / 4,
                (8 + 1 + 2 + 17 + 14 + 4 + 14) / 7,
                (17 + 14 + 4 + 14 + 8) / 5,
                np.nan,
                (4 + 3 + 4 + 8) / 4,
            ],
            [np.nan, (4 + 2 + 17 + 14 + 14) / 5, (14 + 17 + 14 + 4 + 8) / 5, (14 + 8 + 4) / 3, (4 + 4 + 8) / 3],
        ]
    )
    np.testing.assert_allclose(got, gt, rtol=1e-7)


def test_compute_cbca_with_offset():
    """reference test_aggregation.py:392-484: window 3 crops the crosses
    to the cost-volume interior (offset_row_col); border ring stays NaN."""
    left = make_image(
        np.array(
            [[5, 1, 15, 7, 3], [10, 9, 11, 9, 6], [1, 18, 4, 5, 9], [5, 1, 15, 7, 3]],
            np.float32,
        ),
        disp=[-1, 1],
    )
    right = make_image(
        np.array(
            [[1, 5, 1, 15, 7], [2, 10, 9, 11, 9], [3, 1, 18, 4, 5], [1, 5, 1, 15, 7]],
            np.float32,
        )
    )
    state = PipelineState(left_img=left, right_img=right)
    make_step(
        "matching_cost", {"matching_cost_method": "sad", "window_size": 3, "subpix": 1}
    ).run(state)
    make_step(
        "aggregation", {"aggregation_method": "cbca", "cbca_intensity": 5.0, "cbca_distance": 3}
    ).run(state)
    got = np.asarray(state.left_cv.cv)
    nanrow = [[np.nan] * 3] * 5
    mid = [
        [np.nan, np.nan, np.nan],
        [np.nan, (66.0 + 63 + 66 + 63) / 4, 0.0],
        [55.0, (66 + 63 + 52 + 66 + 63 + 52) / 6, 0.0],
        [55.0, (63 + 63 + 52 + 52) / 4, np.nan],
        [np.nan, np.nan, np.nan],
    ]
    gt = np.array([nanrow, mid, mid, nanrow])
    np.testing.assert_allclose(got, gt, rtol=1e-7)


def test_cross_support_subpixel_shifted_right():
    """reference test_aggregation.py:668-810: the HALF-PIXEL shifted right
    image's cross supports (the cross used by fractional disparities),
    without and with input masks — the reference's hand-computed arms."""
    from pandora_tpu.ops.filters import nanmedian_window
    from pandora_tpu.ops.shift import shift_subpix

    right = np.array(
        [[1, 5, 1, 15, 7], [2, 10, 9, 11, 9], [3, 1, 18, 4, 5]], np.float32
    )

    def masked_median_inf(im, invalid):
        m = jnp.where(invalid, jnp.nan, im) if invalid is not None else im
        med = jnp.where(jnp.isnan(m), jnp.nan, nanmedian_window(m, 3))
        return jnp.where(jnp.isnan(med), jnp.inf, med)

    # ---- no masks, intensity 5 -------------------------------------------
    shifted = shift_subpix(jnp.asarray(right), 2)[1]  # (3, 4) half-pixel
    csr = np.asarray(cross_support(masked_median_inf(shifted, None), 3, 5.0))
    np.testing.assert_array_equal(
        csr[:, :, 0], np.array([[0, 1, 1, 1], [0, 1, 2, 2], [0, 1, 1, 1]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 1], np.array([[1, 1, 1, 0], [2, 2, 1, 0], [1, 1, 1, 0]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 2], np.array([[0, 0, 0, 0], [1, 1, 1, 1], [2, 1, 2, 1]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 3], np.array([[2, 1, 2, 1], [1, 1, 1, 1], [0, 0, 0, 0]])
    )

    # ---- with an input mask, intensity 6 ---------------------------------
    # raw user mask valid=0/nodata=1; 2-column OR for the shifted plane
    rmsk = np.array([[2, 0, 0, 0, 0], [0, 0, 0, 1, 0], [0, 3, 0, 0, 0]])
    inv = rmsk != 0
    inv_shift = inv[:, :-1] | inv[:, 1:]
    csr = np.asarray(
        cross_support(masked_median_inf(shifted, jnp.asarray(inv_shift)), 3, 6.0)
    )
    np.testing.assert_array_equal(
        csr[:, :, 0], np.array([[0, 0, 1, 1], [0, 1, 0, 0], [0, 0, 0, 1]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 1], np.array([[0, 1, 1, 0], [1, 0, 0, 0], [0, 0, 1, 0]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 2], np.array([[0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0]])
    )
    np.testing.assert_array_equal(
        csr[:, :, 3], np.array([[0, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
    )


def test_cross_support_with_offset_window3():
    """reference test_aggregation.py:810-900: window_size 3 crops the
    cross-support grid to the cost-volume interior (offset_row_col) for
    BOTH images; subpix 1 keeps a single right cross."""
    from pandora_tpu.ops.filters import nanmedian_window

    left4 = np.array(
        [[5, 1, 15, 7, 3], [10, 9, 11, 9, 6], [1, 18, 4, 5, 9], [5, 1, 15, 7, 3]],
        np.float32,
    )
    right4 = np.array(
        [[1, 5, 1, 15, 7], [2, 10, 9, 11, 9], [3, 1, 18, 4, 5], [1, 5, 1, 15, 7]],
        np.float32,
    )

    def med_inf(im):
        med = nanmedian_window(jnp.asarray(im), 3)
        return jnp.where(jnp.isnan(med), jnp.inf, med)

    def interior(a):
        return a[1:-1, 1:-1]

    cs_left = np.asarray(cross_support(interior(med_inf(left4)), 3, 5.0))
    gt_left = np.stack(
        (
            np.array([[0, 1, 2], [0, 1, 2]]),  # left arm
            np.array([[2, 1, 0], [2, 1, 0]]),  # right arm
            np.array([[0, 0, 0], [1, 1, 1]]),  # top arm
            np.array([[1, 1, 1], [0, 0, 0]]),  # bottom arm
        ),
        axis=-1,
    )
    np.testing.assert_array_equal(cs_left, gt_left)

    cs_right = np.asarray(cross_support(interior(med_inf(right4)), 3, 5.0))
    gt_right = np.stack(
        (
            np.array([[0, 1, 1], [0, 1, 1]]),
            np.array([[1, 1, 0], [1, 1, 0]]),
            np.array([[0, 0, 0], [1, 1, 1]]),
            np.array([[1, 1, 1], [0, 0, 0]]),
        ),
        axis=-1,
    )
    np.testing.assert_array_equal(cs_right, gt_right)
