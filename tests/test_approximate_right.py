"""approximate_right_disparity tests (semantics ported from the reference
test_disparity.py:475-583: diagonal argmin in the left CV, flipped
tie-breaking, invalid fill, incomplete/missing range bits, border mask)."""

import numpy as np
import jax.numpy as jnp

import pandora_tpu.constants as cst
from pandora_tpu.datamodel import CostVolume, Image
from pandora_tpu.ops.wta import approximate_right_disparity, mask_border_disparity
from pandora_tpu.steps.base import make_step


def _ref_cv():
    """The reference's 3x4x4 fixture (test_disparity.py:485-492):
    disp in [-2, 1], four finite entries."""
    cv = np.full((3, 4, 4), np.nan, np.float32)
    cv[1, 1, 2] = 23  # d = 0
    cv[1, 1, 3] = 0  # d = 1
    cv[1, 2, 1] = 24  # d = -1
    cv[1, 2, 2] = 19  # d = 0
    return cv


def test_approximate_right_disparity_map():
    disp, _ = approximate_right_disparity(
        jnp.asarray(_ref_cv()), -2, 1, 1, "min", jnp.float32(0.0)
    )
    gt = np.array([[0, 0, 0, 0], [0, 0, -1, 0], [0, 0, 0, 0]], np.float32)
    np.testing.assert_array_equal(np.asarray(disp), gt)


def test_approximate_right_validity_bits():
    _, vmask = approximate_right_disparity(
        jnp.asarray(_ref_cv()), -2, 1, 1, "min", jnp.float32(0.0)
    )
    vmask = np.asarray(vmask)
    # cols 0 and 3 fit only part of [-2, 1] in a 4-wide image -> bit 2;
    # cols 1 and 2 fit the whole range -> clean
    inc = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
    assert (vmask[:, [0, 2, 3]] == inc).all()
    assert (vmask[:, 1] == 0).all()


def test_approximate_right_missing_range_bit():
    # disp in [4, 5] never reaches inside a 4-wide image for cols 0..3?
    # col 0..3: c - d in [-5, -1] -> all out of range for c < 4
    cv = np.full((2, 4, 2), np.nan, np.float32)
    disp, vmask = approximate_right_disparity(
        jnp.asarray(cv), 4, 5, 1, "min", jnp.float32(-99.0)
    )
    assert (np.asarray(disp) == -99.0).all()
    assert (
        np.asarray(vmask)
        == cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING
    ).all()


def test_approximate_right_subpix_skips_fractional():
    # subpix=2: lanes at odd indices are fractional and must be ignored
    # even when they hold the global minimum
    cv = np.full((1, 3, 5), np.nan, np.float32)  # disp -1..1, subpix 2
    cv[0, 1, 2] = 7.0  # d = 0 integer lane
    cv[0, 1, 1] = 0.1  # d = -0.5 fractional lane: must be skipped
    disp, _ = approximate_right_disparity(
        jnp.asarray(cv), -1, 1, 2, "min", jnp.float32(0.0)
    )
    assert np.asarray(disp)[0, 1] == 0.0  # winner is integer d=0, not -0.5


def test_mask_border_overwrites():
    vmask = jnp.full((4, 5), cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE, jnp.uint16)
    out = np.asarray(mask_border_disparity(vmask, 1))
    assert (out[0, :] == cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER).all()
    assert (out[-1, :] == cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER).all()
    assert (out[1:-1, 0] == cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER).all()
    assert (
        out[1:-1, 1:-1] == cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
    ).all()


def test_step_approximate_right_disparity():
    """The WTA step wrapper: confidence band + border mask + invalid fill."""
    step = make_step("disparity", {"disparity_method": "wta", "invalid_disparity": 0})
    cv = CostVolume(
        cv=jnp.asarray(_ref_cv()),
        disp_range=jnp.arange(-2.0, 2.0),
        validity_mask=jnp.zeros((3, 4), jnp.uint16),
        window_size=3,
        subpixel=1,
        offset_row_col=1,
        measure="sad",
        type_measure="min",
        cmax=81.0,
    )
    rng = np.random.default_rng(3)
    img_right = Image(im=jnp.asarray(rng.random((1, 3, 4), np.float32)))
    out = step.approximate_right_disparity(cv, img_right)
    gt = np.array([[0, 0, 0, 0], [0, 0, -1, 0], [0, 0, 0, 0]], np.float32)
    np.testing.assert_array_equal(np.asarray(out.disparity_map), gt)
    vm = np.asarray(out.validity_mask)
    assert (vm[0, :] == cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER).all()
    assert vm[1, 2] == cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
    assert vm[1, 1] == 0  # col 1 fits the whole range
    conf = np.asarray(out.confidence)
    assert out.indicator_names == ("confidence_from_intensity_std",)
    assert np.isnan(conf[0, 0, 0]) and np.isfinite(conf[1, 1, 0])
