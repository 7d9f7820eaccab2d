"""disparity_denoiser + median_for_intervals vs numpy/scipy oracles
(reference filter/disparity_denoiser.py, filter/median_for_intervals.py)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter

import pandora_tpu.constants as cst
from pandora_tpu.ops.denoiser import denoise_disparity, gaussian_blur

RNG = np.random.default_rng(3)


def test_gaussian_blur_matches_scipy():
    a = (RNG.random((20, 17)) * 10).astype(np.float32)
    for sigma in (1.5, 0.8):
        got = np.asarray(gaussian_blur(jnp.asarray(a), sigma))
        want = gaussian_filter(a, sigma=sigma)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def brute_denoise(disp, color, vmask, size, s_eu, s_clr, s_pl, s_grad):
    """Literal reference implementation (disparity_denoiser.py:100-313)."""
    c = size // 2
    coords = np.stack(np.meshgrid(np.arange(-c, c + 1), np.arange(-c, c + 1), indexing="ij"))
    grad = np.stack(np.gradient(gaussian_filter(disp, sigma=s_grad)))

    def windows(im):
        p = np.pad(im, c, "reflect")
        return np.lib.stride_tricks.sliding_window_view(p, (size, size))

    disp_v = windows(disp)  # (H, W, ws, ws)
    clr_v = windows(color)

    def g(x, s):
        return np.exp(-((x / s) ** 2) / 2.0)

    h, w = disp.shape
    out = disp.copy()
    euclid = np.linalg.norm(coords, axis=0)
    for r in range(h):
        for cc in range(w):
            plane = coords[0] * grad[0, r, cc] + coords[1] * grad[1, r, cc]
            planar = disp_v[r, cc] - plane - disp[r, cc]
            dist = disp_v[r, cc] - plane
            planar_c = dist - dist.mean()
            wgt = g(euclid, s_eu) * g(clr_v[r, cc] - color[r, cc], s_clr) * g(planar_c, s_pl)
            wgt = wgt / wgt.sum()
            corr = (planar * wgt).sum()
            invalid = (vmask[r, cc] & cst.PANDORA_MSK_PIXEL_INVALID) != 0
            if not invalid and np.isfinite(disp[r, cc]):
                out[r, cc] = disp[r, cc] + corr
    return out


def test_denoiser_matches_bruteforce():
    h, w = 14, 16
    disp = (RNG.random((h, w)) * 8 - 4).astype(np.float32)
    color = (RNG.random((h, w)) * 200).astype(np.float32)
    vmask = np.zeros((h, w), np.uint16)
    vmask[3, 4] = cst.PANDORA_MSK_PIXEL_OCCLUSION
    got = np.asarray(
        denoise_disparity(
            jnp.asarray(disp),
            jnp.asarray(color),
            jnp.asarray(vmask),
            cst.PANDORA_MSK_PIXEL_INVALID,
            size=5,
            sigma_euclidian=4.0,
            sigma_color=100.0,
            sigma_planar=12.0,
            sigma_grad=1.5,
        )
    )
    want = brute_denoise(disp, color, vmask, 5, 4.0, 100.0, 12.0, 1.5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_median_for_intervals_step():
    from pandora_tpu.datamodel import DisparityMap
    from pandora_tpu.ops.filters import nanmedian_window
    from pandora_tpu.steps.base import make_step

    h, w = 9, 10
    inf_b = (RNG.random((h, w)) * 4 - 6).astype(np.float32)
    sup_b = inf_b + RNG.random((h, w)).astype(np.float32)
    disp = DisparityMap(
        disparity_map=jnp.zeros((h, w), jnp.float32),
        validity_mask=jnp.zeros((h, w), jnp.uint16),
        confidence=jnp.stack([jnp.asarray(inf_b), jnp.asarray(sup_b)], axis=2),
        indicator_names=(
            "confidence_from_interval_bounds_inf",
            "confidence_from_interval_bounds_sup",
        ),
    )
    step = make_step("filter", {"filter_method": "median_for_intervals", "filter_size": 3})
    step._filter_one(disp, None)
    want_inf = np.asarray(nanmedian_window(jnp.asarray(inf_b), 3))
    np.testing.assert_allclose(np.asarray(disp.confidence[:, :, 0]), want_inf, rtol=1e-6)


def test_gradient_hand_matrix():
    """reference test_disparity_denoiser.py:149-176 (get_grad, sigma 0):
    np.gradient semantics — central differences, one-sided edges."""
    from pandora_tpu.ops.denoiser import _gradient

    disp = jnp.asarray(np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.float32))
    gt_y = np.array([[3, 3, 3], [3, 3, 3], [3, 3, 3]], np.float32)
    gt_x = np.array([[1, 1, 1], [1, 1, 1], [1, 1, 1]], np.float32)
    np.testing.assert_allclose(np.asarray(_gradient(disp, 0)), gt_y, atol=1e-7)
    np.testing.assert_allclose(np.asarray(_gradient(disp, 1)), gt_x, atol=1e-7)


def test_sliding_window_hand_matrix():
    """reference test_disparity_denoiser.py:178-219: reflect-padded 3x3
    window views of a 2x2 map (our (K, H, W) layout, K = dr*3+dc)."""
    from pandora_tpu.ops.denoiser import _windows

    disp = jnp.asarray(np.array([[1, 2], [4, 5]], np.float32))
    win = np.asarray(_windows(disp, 3))  # (9, 2, 2)
    gt = {
        (0, 0): [[5.0, 4.0, 5.0], [2.0, 1.0, 2.0], [5.0, 4.0, 5.0]],
        (0, 1): [[4.0, 5.0, 4.0], [1.0, 2.0, 1.0], [4.0, 5.0, 4.0]],
        (1, 0): [[2.0, 1.0, 2.0], [5.0, 4.0, 5.0], [2.0, 1.0, 2.0]],
        (1, 1): [[1.0, 2.0, 1.0], [4.0, 5.0, 4.0], [1.0, 2.0, 1.0]],
    }
    for (i, j), want in gt.items():
        got = win[:, i, j].reshape(3, 3)
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-7)
        # dist-from-center invariance (get_disparity_dist/get_color_dist,
        # test:220-339): window minus its center value
        np.testing.assert_allclose(
            got - got[1, 1], np.asarray(want) - want[1][1], atol=1e-7
        )


def test_invalid_center_unchanged():
    """reference test_disparity_denoiser.py:911-990: the filter never
    rewrites a pixel whose validity mask flags it invalid."""
    disp = np.array(
        [[2, 4, 8, 5, 6], [7, 82, 3, 33, 4], [4, 8, 21, 13, 4], [3, 2, 8, 1, 3], [3, 6, 2, 3, 2]],
        np.float32,
    )
    vmask = np.zeros((5, 5), np.uint16)
    vmask[2, 2] = cst.PANDORA_MSK_PIXEL_INVALID
    color = (RNG.random((5, 5)) * 9).astype(np.float32)
    out = np.asarray(
        denoise_disparity(
            jnp.asarray(disp), jnp.asarray(color), jnp.asarray(vmask),
            cst.PANDORA_MSK_PIXEL_INVALID, 3, 2.0, 100.0, 12.0, 1.5,
        )
    )
    np.testing.assert_allclose(out[2, 2], disp[2, 2], rtol=1e-7)
    # valid neighbors DO move
    assert not np.allclose(out[1, 1], disp[1, 1])
