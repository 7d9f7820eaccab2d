"""CBCA cross supports + aggregation vs a brute-force oracle.

The oracle walks the reference C++ semantics literally
(aggregation.cpp:224-321 arms, :28-221 4-step aggregation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pandora_tpu.ops.cbca import cbca_volume, cross_support, stack_right_crosses

RNG = np.random.default_rng(5)


def brute_cross(img, len_arms, intensity):
    """Literal per-pixel arm walk (aggregation.cpp:246-318)."""
    h, w = img.shape
    cross = np.zeros((h, w, 4), np.int32)
    for r in range(h):
        for c in range(w):
            cur = img[r, c]
            if not np.isfinite(cur):
                continue
            arms = []
            for dr, dc in ((0, -1), (0, 1), (-1, 0), (1, 0)):
                n = 0
                for k in range(1, len_arms):
                    rr, cc = r + dr * k, c + dc * k
                    if not (0 <= rr < h and 0 <= cc < w):
                        break
                    if not abs(cur - img[rr, cc]) < intensity:
                        break
                    n += 1
                rr, cc = r + dr, c + dc
                if 0 <= rr < h and 0 <= cc < w and np.isfinite(img[rr, cc]):
                    n = max(n, 1)
                arms.append(n)
            cross[r, c] = arms
    return cross


def brute_cbca_slice(cost, cross_l, cross_r, d_int, width_r):
    """Literal 4-step aggregation for one disparity (aggregation.cpp:28-221)."""
    h, w = cost.shape
    step2 = np.zeros((h, w), np.float32)
    sum2 = np.zeros((h, w), np.float32)
    cost0 = np.where(np.isnan(cost), 0.0, cost)
    for r in range(h):
        for c in range(w):
            cr = c + d_int
            if not 0 <= cr < width_r:
                continue
            left = min(cross_l[r, c, 0], cross_r[r, cr, 0])
            right = min(cross_l[r, c, 1], cross_r[r, cr, 1])
            step2[r, c] = cost0[r, c - left : c + right + 1].sum()
            sum2[r, c] = left + right
    step4 = np.zeros((h, w), np.float32)
    sum4 = sum2.copy()
    for r in range(h):
        for c in range(w):
            cr = c + d_int
            if not 0 <= cr < width_r:
                continue
            top = min(cross_l[r, c, 2], cross_r[r, cr, 2])
            bot = min(cross_l[r, c, 3], cross_r[r, cr, 3])
            step4[r, c] = step2[r - top : r + bot + 1, c].sum()
            sum4[r, c] += top + bot
            sum4[r, c] += sum2[r - top : r, c].sum() + sum2[r + 1 : r + bot + 1, c].sum()
    out = step4 / (sum4 + 1.0)
    out[np.isnan(cost)] = np.nan
    return out


def test_cross_support_matches_bruteforce():
    img = (RNG.random((9, 11)) * 60).astype(np.float32)
    img[2, 3] = np.inf  # invalid pixel (NaN→inf convention)
    img[5, :] = np.inf
    got = np.asarray(cross_support(jnp.asarray(img), 5, 20.0))
    want = brute_cross(img, 5, 20.0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("subpix", [1, 2])
def test_cbca_volume_matches_bruteforce(subpix):
    h, w = 8, 10
    dmin, dmax = -3, 1
    left = (RNG.random((h, w)) * 60).astype(np.float32)
    right = (RNG.random((h, w)) * 60).astype(np.float32)

    disp_vals = np.arange(dmin, dmax + 1e-9, 1.0 / subpix, dtype=np.float32)
    d = len(disp_vals)
    cost = (RNG.random((h, w, d)) * 10).astype(np.float32)
    cost[0, 0, :] = np.nan
    cost[3, 4, 2] = np.nan

    # build crosses the way the step does (no masks, no median for clarity)
    imgs_r = [right] + [
        ((1 - k / subpix) * right[:, :-1] + (k / subpix) * right[:, 1:]).astype(np.float32)
        for k in range(1, subpix)
    ]
    cross_l = cross_support(jnp.asarray(left), 4, 25.0)
    crosses_r = [cross_support(jnp.asarray(im), 4, 25.0) for im in imgs_r]
    stack, widths = stack_right_crosses(list(crosses_r), w)

    got = np.asarray(
        cbca_volume(jnp.asarray(cost), cross_l, stack, widths, jnp.asarray(disp_vals), subpix, 4)
    )

    cross_l_np = np.asarray(cross_l)
    for k, dv in enumerate(disp_vals):
        i = int(round((dv % 1) * subpix)) % subpix
        want = brute_cbca_slice(
            cost[:, :, k],
            cross_l_np,
            np.asarray(crosses_r[i]),
            int(np.floor(dv)),
            imgs_r[i].shape[1],
        )
        np.testing.assert_allclose(got[:, :, k], want, rtol=1e-5, atol=1e-5, err_msg=f"disp {dv}")


@pytest.mark.functional
def test_census_cbca_wta_cones(cones):
    """CBCA aggregation improves raw census+WTA on the cones pair."""
    from test_pipeline import _run_pipeline
    from conftest import error_rate

    base, _, _ = _run_pipeline(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
        }
    )
    agg, _, _ = _run_pipeline(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "aggregation": {"aggregation_method": "cbca"},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
        }
    )
    e_base = error_rate(np.asarray(base.disparity_map), cones["gt_left"], 1)
    e_agg = error_rate(np.asarray(agg.disparity_map), cones["gt_left"], 1)
    assert e_agg < e_base
    assert e_agg <= 0.30
