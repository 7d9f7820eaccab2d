"""Hand-computed cross-checking and interpolation matrices ported from the
reference suite (tests/test_validation.py:40-620): integer and floating
disparity cross-checks, and the four occlusion/mismatch interpolation
flavours (SGM and MC-CNN), against the reference's exact ground truths."""

import jax.numpy as jnp
import numpy as np

import pandora_tpu.constants as cst
from pandora_tpu.ops.interpolation import (
    interpolate_mismatch_mc_cnn,
    interpolate_mismatch_sgm,
    interpolate_occlusion_mc_cnn,
    interpolate_occlusion_sgm,
)
from pandora_tpu.ops.validation import cross_checking

OCC = cst.PANDORA_MSK_PIXEL_OCCLUSION
MIS = cst.PANDORA_MSK_PIXEL_MISMATCH
FO = cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION
FM = cst.PANDORA_MSK_PIXEL_FILLED_MISMATCH
B1 = cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING
B0 = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
B2 = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
ST = cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION
L6 = cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT


def test_cross_checking_integer():
    """reference test_validation.py:104-140."""
    disp_l = np.array([[0, -1, 1, -2], [2, 2, -1, 0]], np.float32)
    disp_r = np.array([[0, 2, -1, -1], [1, 1, -2, -1]], np.float32)
    vmask = np.array([[0, 0, 0, B1], [0, 0, 0, 0]], np.uint16)
    got_v, got_c = cross_checking(
        jnp.asarray(disp_l), jnp.asarray(disp_r), jnp.asarray(vmask), -2, 2, 0.0
    )
    gt_mask = np.array([[0, MIS, 0, B1], [0, MIS, 0, OCC]], np.uint16)
    np.testing.assert_array_equal(np.asarray(got_v), gt_mask)
    # |dR(col+dL) + dL| consistency measure (validation.py:291,363)
    gt_dist = np.array([[0.0, 1.0, 0.0, np.nan], [0.0, 1.0, 0.0, 1.0]], np.float32)
    np.testing.assert_array_equal(np.asarray(got_c), gt_dist)


def test_cross_checking_float_disparity():
    """reference test_validation.py:255-308: rint rounding on float maps."""
    disp_l = np.array([[0, -1.2, 1, -2], [2, 1.8, -1, 0]], np.float32)
    disp_r = np.array([[0, 2, -1.2, -1], [0.8, 1, -2, -1]], np.float32)
    vmask = np.array([[0, 0, 0, B1], [0, 0, 0, 0]], np.uint16)
    got_v, _ = cross_checking(
        jnp.asarray(disp_l), jnp.asarray(disp_r), jnp.asarray(vmask), -2, 2, 0.0
    )
    gt_mask = np.array([[0, MIS, 0, B1], [0, MIS, 0, OCC]], np.uint16)
    np.testing.assert_array_equal(np.asarray(got_v), gt_mask)


def test_interpolate_occlusion_mc_cnn():
    """reference test_validation.py:310-372: nearest valid to the LEFT,
    falling back to the right."""
    disp = np.array([[0, -1, 1, -2.1], [2, 2, -1.7, 0]], np.float32)
    msk = np.array([[B1, OCC, B1, 0], [OCC, L6, 0, OCC]], np.uint16)
    d2, v2 = interpolate_occlusion_mc_cnn(jnp.asarray(disp), jnp.asarray(msk))
    gt_m = np.array([[B1, FO, B1, 0], [FO, L6, 0, FO]], np.uint16)
    gt_d = np.array([[0, -2.1, 1, -2.1], [-1.7, 2, -1.7, -1.7]], np.float32)
    np.testing.assert_array_equal(np.asarray(v2), gt_m)
    np.testing.assert_array_equal(np.asarray(d2), gt_d)


DISP45 = np.array(
    [[0, 1.2, -2, -1, -2], [1, 0, 1, 0, 0], [2, 1, -1, -2, -1], [1, -1, 1, -1, -1.3]],
    np.float32,
)


def _msk45(bit):
    return np.array(
        [
            [B0, B2, 0, ST, 0],
            [0, 0, bit, 0, 0],
            [0, ST, bit, L6, bit],
            [0, bit, 0, 0, 0],
        ],
        np.uint16,
    )


def test_interpolate_mismatch_mc_cnn():
    """reference test_validation.py:374-460: median of 16 half-step
    directional neighbours."""
    d2, v2 = interpolate_mismatch_mc_cnn(jnp.asarray(DISP45), jnp.asarray(_msk45(MIS)))
    gt_m = np.array(
        [
            [B0, B2, 0, ST, 0],
            [0, 0, FM, 0, 0],
            [0, ST, FM, L6, FM],
            [0, FM, 0, 0, 0],
        ],
        np.uint16,
    )
    gt_d = np.array(
        [
            [0, 1.2, -2, -1, -2],
            [1, 0, np.median([1.2, 1, 0, 0, 0, 1, -2, -2, -2, -1, 0, 0, 0, -1, -1.3]), 0, 0],
            [
                2,
                1,
                np.median([1, 1, 1, 1, 1, 0, 1, -2, -1, 0, 0, -1, -1, 1]),
                -2,
                np.median([-1, -1, -1, 1, 1, 0, 0, 0, 0, 0]),
            ],
            [1, np.median([1, 1, 1, 2, 1, 1, 1, 0, 1, 1, 1]), 1, -1, -1.3],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(v2), gt_m)
    np.testing.assert_array_equal(np.asarray(d2), gt_d)


def test_interpolate_occlusion_sgm():
    """reference test_validation.py:462-536: second-smallest |d| of the 8
    directional first-valid values."""
    d2, v2 = interpolate_occlusion_sgm(jnp.asarray(DISP45), jnp.asarray(_msk45(OCC)))
    gt_m = np.array(
        [
            [B0, B2, 0, ST, 0],
            [0, 0, FO, 0, 0],
            [0, ST, FO, L6, FO],
            [0, FO, 0, 0, 0],
        ],
        np.uint16,
    )
    gt_d = np.array(
        [[0, 1.2, -2, -1, -2], [1, 0, 0, 0, 0], [2, 1, 0, -2, 0], [1, 1, 1, -1, -1.3]],
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(v2), gt_m)
    np.testing.assert_array_equal(np.asarray(d2), gt_d)


def test_interpolate_mismatch_sgm():
    """reference test_validation.py:536-616: median of the 8 directional
    first-valid values."""
    d2, v2 = interpolate_mismatch_sgm(jnp.asarray(DISP45), jnp.asarray(_msk45(MIS)))
    gt_m = np.array(
        [
            [B0, B2, 0, ST, 0],
            [0, 0, FM, 0, 0],
            [0, ST, FM, L6, FM],
            [0, FM, 0, 0, 0],
        ],
        np.uint16,
    )
    gt_d = np.array(
        [
            [0, 1.2, -2, -1, -2],
            [1, 0, np.median([1.2, -2, -1, 0, 0, 1, 1, -1.3]), 0, 0],
            [2, 1, np.median([-2, 0, -1, -1, 1, 1, 0]), -2, np.median([0, -1.3, -1, 1, 0])],
            [1, np.median([2, 1, 0, 1, 1]), 1, -1, -1.3],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(v2), gt_m)
    np.testing.assert_array_equal(np.asarray(d2), gt_d)


def test_distance_lr_rl_confidence_matrix():
    """reference test_validation.py:142-253 (test_distance_lr_rl): the
    |dR+dL| consistency measure is NaN on masked/nodata pixels and exact
    on the two valid ones (0.0 and 1.0)."""
    B = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
    dl = np.array(
        [[np.nan] * 4, [np.nan, 1, -1, np.nan], [np.nan] * 4], np.float32
    )
    dr = np.array(
        [[np.nan] * 4, [np.nan, 0, -1, np.nan], [np.nan] * 4], np.float32
    )
    vl = np.array([[B] * 4, [B, 0, 0, B], [B] * 4], np.uint16)
    vmask, conf = cross_checking(
        jnp.asarray(dl), jnp.asarray(dr), jnp.asarray(vl), -1, 1, 0.0
    )
    gt_conf = np.array(
        [[np.nan] * 4, [np.nan, 0.0, 1.0, np.nan], [np.nan] * 4], np.float32
    )
    np.testing.assert_array_equal(np.asarray(conf), gt_conf)
    # pixel (1,2): |dR(1)+dL(-1)| = 1 > 0 -> flagged; ∃d: rint(dR(c+d))==-d
    # (d=1 reads dR(3)=NaN -> no; d=-1 reads dR(1)=0 != 1 -> no;
    #  d=0 reads dR(2)=-1 != 0 -> no) -> occlusion
    assert np.asarray(vmask)[1, 2] & cst.PANDORA_MSK_PIXEL_OCCLUSION
    assert np.asarray(vmask)[1, 1] == 0


def test_interpolate_mismatch_and_occlusion_sgm_matrix():
    """reference test_validation.py:616-694: combined mismatch-then-
    occlusion SGM interpolation — mismatches touching an occluded pixel
    become (filled) occlusions, others take the 8-direction median, then
    occlusions take the second-smallest |d| fill."""
    O = cst.PANDORA_MSK_PIXEL_OCCLUSION
    M = cst.PANDORA_MSK_PIXEL_MISMATCH
    B = cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
    I = cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE
    S = cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION
    V = cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT
    FO = cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION
    FM = cst.PANDORA_MSK_PIXEL_FILLED_MISMATCH

    disp = np.array(
        [[0, 1, -2, -1, -2], [1, 0, 1, 0, 0], [2, 1, -1, -2, -1], [1, -1, 1, -1, -1]],
        np.float32,
    )
    msk = np.array(
        [[B, I, 0, S, O], [0, 0, M, 0, 0], [0, S, M, V, M], [O, M, 0, 0, 0]],
        np.uint16,
    )
    d, v = interpolate_mismatch_sgm(jnp.asarray(disp), jnp.asarray(msk))
    d, v = interpolate_occlusion_sgm(d, v)

    gt_mask = np.array(
        [[B, I, 0, S, FO], [0, 0, FM, 0, 0], [0, S, FM, V, FM], [FO, FO, 0, 0, 0]],
        np.uint16,
    )
    np.testing.assert_array_equal(np.asarray(v), gt_mask)

    gt_disp = np.array(
        [
            [0, 1, -2, -1, 0],
            [1, 0, np.median([1, 1, 0, 1, -2, -1, 0, -1]), 0, 0],
            [2, 1, np.median([1, 1, 0, -2, 0, -1]), -2, np.median([-1, -1, 1, 0, 0])],
            [1, 1, 1, -1, -1],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(np.asarray(d), gt_disp)
