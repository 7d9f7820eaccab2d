"""Multiscale disparity-range matrices ported from the reference suite
(tests/test_multiscale.py:55-238): next-scale per-pixel range = window
extrema ± marge, full user range on invalid/NaN/border pixels."""

import numpy as np

import pandora_tpu.constants as cst
from pandora_tpu.steps.base import make_step

B0 = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
B2 = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
ST = cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION

DISP = np.array(
    [
        [-1, -2, -3, -4, -5, -6],
        [-7, -8, -9, np.nan, -11, -12],
        [-13, -14, -15, -16, -17, -18],
        [-19, -20, -21, -22, -23, -24],
        [np.nan, -26, -27, -28, -29, -30],
    ],
    np.float32,
)
VMASK = np.array(
    [
        [B2] * 6,
        [0] * 6,
        [0] * 6,
        [B0] * 6,
        [ST] * 6,
    ],
    np.uint16,
)


def _step(marge=0, scale_factor=1):
    step = make_step(
        "multiscale",
        {
            "multiscale_method": "fixed_zoom_pyramid",
            "num_scales": 2,
            "scale_factor": 2,
            "marge": marge,
        },
    )
    # the reference test neutralizes the zoom the same way
    # (test_multiscale.py:68-70)
    step.cfg["scale_factor"] = scale_factor
    return step


def test_disparity_range():
    """reference test_multiscale.py:55-153."""
    step = _step()
    out_min, out_max = step.disparity_range(DISP, VMASK, 3, -30.0, 0.0)
    gt_max = np.array(
        [
            [0, 0, 0, 0, 0, 0],
            [0, -1, -2, 0, -4, 0],
            [0, -7, -8, -9, -11, 0],
            [0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0],
        ],
        np.float32,
    )
    gt_min = np.array(
        [
            [-30, -30, -30, -30, -30, -30],
            [-30, -15, -16, -30, -18, -30],
            [-30, -15, -16, -17, -18, -30],
            [-30, -30, -30, -30, -30, -30],
            [-30, -30, -30, -30, -30, -30],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(out_min), gt_min)
    np.testing.assert_array_equal(np.asarray(out_max), gt_max)


def test_disparity_range_with_marge():
    """Same matrix with marge=2: valid interior windows widen by ±2,
    clamped nowhere (the reference adds the marge before zooming)."""
    step = _step(marge=2)
    out_min, out_max = step.disparity_range(DISP, VMASK, 3, -30.0, 0.0)
    assert out_max[1, 1] == -1 + 2
    assert out_min[1, 1] == -15 - 2
    # full-range pixels stay pinned to the user range
    assert out_max[0, 0] == 0 and out_min[0, 0] == -30


def test_disparity_range_zoom():
    """scale_factor=2 nearest-neighbour upsampling doubles the maps
    (fixed_zoom_pyramid.py:139-183)."""
    step = _step(scale_factor=2)
    out_min, out_max = step.disparity_range(DISP, VMASK, 3, -30.0, 0.0)
    assert out_min.shape == (10, 12) and out_max.shape == (10, 12)
    # each 2x2 block replicates the source pixel
    base_min, base_max = _step().disparity_range(DISP, VMASK, 3, -30.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out_min)[::2, ::2], np.asarray(base_min))
    np.testing.assert_array_equal(np.asarray(out_max)[1::2, 1::2], np.asarray(base_max))


def test_mask_invalid_disparities_matrix():
    """reference test_multiscale.py:155-237 (mask_invalid_disparities):
    INVALID-bit pixels become NaN before the range windows; info bits
    (incomplete range, stopped interpolation) keep their disparity.
    Exercises the PANDORA_MSK_PIXEL_INVALID bit composition."""
    import pandora_tpu.constants as cst

    gt_disp = np.arange(-1, -31, -1, dtype=np.float32).reshape(5, 6)
    gt_disp[2, 4] = np.nan
    B = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
    I = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
    S = cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION
    gt_mask = np.array(
        [
            [B, B, B, I, I, I],
            [0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0],
            [B, B, B, B, B, B],
            [S, S, S, S, S, S],
        ],
        np.uint16,
    )
    masked = np.where((gt_mask & cst.PANDORA_MSK_PIXEL_INVALID) != 0, np.nan, gt_disp)
    gt_filtered = np.array(
        [
            [np.nan, np.nan, np.nan, -4, -5, -6],
            [-7, -8, -9, -10, -11, -12],
            [-13, -14, -15, -16, np.nan, -18],
            [np.nan, np.nan, np.nan, np.nan, np.nan, np.nan],
            [-25, -26, -27, -28, -29, -30],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(masked, gt_filtered)


def test_multiscale_rejects_disparity_grids():
    """reference test_multiscale.py:238-256: grid disparities are refused
    by multiscale processing with the reference's exact message."""
    import jax.numpy as jnp
    import pytest

    from pandora_tpu.datamodel import make_image
    from pandora_tpu.steps.base import PipelineState
    from pandora_tpu.steps.multiscale import prepare_pyramid_state

    grid = np.stack([np.full((8, 8), -2.0), np.full((8, 8), 2.0)])
    left = make_image(np.ones((8, 8), np.float32), disp=grid)
    right = make_image(np.ones((8, 8), np.float32))
    state = PipelineState(left_img=left, right_img=right)
    with pytest.raises(TypeError, match="does not accept input disparity grids"):
        prepare_pyramid_state(state, 2, 2)
