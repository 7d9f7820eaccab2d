"""Median/bilateral filters, cross-checking and interpolation unit tests."""

import numpy as np
import jax.numpy as jnp

import pandora_tpu.constants as cst
from pandora_tpu.ops.filters import median_filter_disparity, nanmedian_window
from pandora_tpu.ops.validation import cross_checking
from pandora_tpu.ops.interpolation import (
    first_valid_8,
    interpolate_mismatch_sgm,
    interpolate_occlusion_sgm,
    interpolate_occlusion_mc_cnn,
)

INV = cst.PANDORA_MSK_PIXEL_INVALID


def test_nanmedian_window_matches_numpy():
    rng = np.random.default_rng(3)
    a = rng.random((12, 15)).astype(np.float32)
    a[rng.random((12, 15)) < 0.3] = np.nan
    got = np.asarray(nanmedian_window(jnp.asarray(a), 3))
    import warnings

    for r in range(1, 11):
        for c in range(1, 14):
            win = a[r - 1 : r + 2, c - 1 : c + 2]
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                want = np.nanmedian(win)
            g = got[r, c]
            assert (np.isnan(want) and np.isnan(g)) or abs(g - want) < 1e-6
    # border untouched
    np.testing.assert_array_equal(got[0], a[0])


def test_median_filter_skips_invalid():
    disp = np.arange(25, dtype=np.float32).reshape(5, 5)
    vmask = np.zeros((5, 5), np.uint16)
    vmask[2, 2] = cst.PANDORA_MSK_PIXEL_OCCLUSION  # invalid center
    out = np.asarray(
        median_filter_disparity(jnp.asarray(disp), jnp.asarray(vmask), INV, 3)
    )
    # invalid pixel untouched
    assert out[2, 2] == disp[2, 2]
    # valid neighbor filtered ignoring the invalid pixel
    win = disp[0:3, 0:3].ravel().tolist()
    win.remove(disp[2, 2])
    assert abs(out[1, 1] - np.median(win)) < 1e-6


def test_cross_checking_detects_occlusion_and_mismatch():
    # 1 row, 6 cols; left disp all -1 => col_right = col - 1
    dl = np.full((1, 6), -1.0, np.float32)
    dr = np.full((1, 6), 1.0, np.float32)
    vl = np.zeros((1, 6), np.uint16)
    # make col 3 inconsistent: right(2) = 3 -> |3 + (-1)| = 2 > 1
    dr[0, 2] = 3.0
    vmask, conf = cross_checking(
        jnp.asarray(dl), jnp.asarray(dr), jnp.asarray(vl), -2, 0, 1.0
    )
    vmask = np.asarray(vmask)
    bad = vmask[0, 3]
    assert bad & (cst.PANDORA_MSK_PIXEL_OCCLUSION | cst.PANDORA_MSK_PIXEL_MISMATCH)
    # consistent pixels untouched
    assert vmask[0, 2] == 0
    conf = np.asarray(conf)
    assert abs(conf[0, 2] - 0.0) < 1e-6  # |1 + (-1)|
    assert abs(conf[0, 3] - 2.0) < 1e-6


def test_first_valid_8_directions():
    disp = np.arange(16, dtype=np.float32).reshape(4, 4)
    v = np.zeros((4, 4), np.uint16)
    v[1, 1] = INV
    v[1, 2] = INV
    f = np.asarray(first_valid_8(jnp.asarray(disp), jnp.asarray(v)))
    # dirs order: (0,1),(-1,1),(-1,0),(-1,-1),(0,-1),(1,-1),(1,0),(1,1)
    assert f[0, 1, 1] == disp[1, 3]  # right: (1,2) invalid -> (1,3)
    assert f[2, 1, 1] == disp[0, 1]  # up
    assert f[4, 1, 1] == disp[1, 0]  # left
    assert f[6, 1, 1] == disp[2, 1]  # down
    assert np.isnan(f[3, 0, 0])  # up-left from corner -> border


def test_interpolate_occlusion_sgm_second_min_abs():
    disp = np.zeros((3, 3), np.float32)
    # neighbors of center along 8 dirs: values at the ring
    ring = {(0, 1): 5.0, (0, 0): -1.0, (0, 2): 3.0, (1, 0): -2.0, (1, 2): 4.0,
            (2, 0): 6.0, (2, 1): -7.0, (2, 2): 8.0}
    for (r, c), v in ring.items():
        disp[r, c] = v
    v = np.zeros((3, 3), np.uint16)
    v[1, 1] = cst.PANDORA_MSK_PIXEL_OCCLUSION
    d2, v2 = interpolate_occlusion_sgm(jnp.asarray(disp), jnp.asarray(v))
    d2, v2 = np.asarray(d2), np.asarray(v2)
    # |values| = {5,3,2,4,6,7,8,1} -> second smallest |.| is -2.0
    assert d2[1, 1] == -2.0
    assert v2[1, 1] & cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION
    assert not (v2[1, 1] & cst.PANDORA_MSK_PIXEL_OCCLUSION)


def test_interpolate_mismatch_sgm_median_and_occlusion_promotion():
    disp = np.ones((3, 5), np.float32) * 2.0
    v = np.zeros((3, 5), np.uint16)
    v[1, 1] = cst.PANDORA_MSK_PIXEL_MISMATCH
    v[1, 3] = cst.PANDORA_MSK_PIXEL_MISMATCH
    v[0, 3] = cst.PANDORA_MSK_PIXEL_OCCLUSION  # neighbor of (1,3)
    d2, v2 = interpolate_mismatch_sgm(jnp.asarray(disp), jnp.asarray(v))
    d2, v2 = np.asarray(d2), np.asarray(v2)
    # (1,1): filled with median of valid neighbors = 2.0
    assert d2[1, 1] == 2.0
    assert v2[1, 1] & cst.PANDORA_MSK_PIXEL_FILLED_MISMATCH
    # (1,3): adjacent to occlusion -> becomes occlusion, disparity kept
    assert v2[1, 3] & cst.PANDORA_MSK_PIXEL_OCCLUSION
    assert not (v2[1, 3] & cst.PANDORA_MSK_PIXEL_MISMATCH)
    assert d2[1, 3] == disp[1, 3]


def test_interpolate_occlusion_mc_cnn_left_then_right():
    disp = np.asarray([[7.0, 1.0, 2.0, 3.0]], np.float32)
    v = np.zeros((1, 4), np.uint16)
    v[0, 2] = cst.PANDORA_MSK_PIXEL_OCCLUSION
    d2, v2 = interpolate_occlusion_mc_cnn(jnp.asarray(disp), jnp.asarray(v))
    assert np.asarray(d2)[0, 2] == 1.0  # nearest valid to the left
    # occlusion at col 0 with no left valid -> takes right
    v = np.zeros((1, 4), np.uint16)
    v[0, 0] = cst.PANDORA_MSK_PIXEL_OCCLUSION
    d3, _ = interpolate_occlusion_mc_cnn(jnp.asarray(disp), jnp.asarray(v))
    assert np.asarray(d3)[0, 0] == 1.0


def test_fast_equals_accurate_cross_checking():
    """reference functional_tests/test_validation.py:155-192: the fast and
    accurate cross-checking methods produce STRICTLY equal left disparity
    maps (census and ssd), and fast mode leaves no right products."""
    import pandora_tpu
    from pandora_tpu.config import check_conf

    base = "/root/reference/tests/pandora"
    for method in ("census", "ssd"):
        results = {}
        for validation in ("cross_checking_fast", "cross_checking_accurate"):
            cfg = {
                "input": {
                    "left": {"img": f"{base}/left.png", "disp": [-60, 0]},
                    "right": {"img": f"{base}/right.png"},
                },
                "pipeline": {
                    "matching_cost": {"matching_cost_method": method},
                    "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
                    "validation": {"validation_method": validation},
                },
            }
            if validation == "cross_checking_accurate":
                cfg["input"]["right"]["disp"] = [0, 60]
            validated, pipeline = check_conf(cfg)
            left_img, right_img = pandora_tpu.images_from_config(validated["input"])
            left, right, _ = pandora_tpu.run(pipeline, left_img, right_img)
            results[validation] = (left, right)
        d_fast = np.asarray(results["cross_checking_fast"][0].disparity_map)
        d_acc = np.asarray(results["cross_checking_accurate"][0].disparity_map)
        np.testing.assert_array_equal(
            np.nan_to_num(d_fast, nan=-1e9), np.nan_to_num(d_acc, nan=-1e9)
        )
        # fast mode wipes derived right products (validation.py fast mode)
        assert results["cross_checking_fast"][1] is None
