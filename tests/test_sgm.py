"""SGM aggregation vs a brute-force per-pixel recurrence oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from pandora_tpu.ops.sgm import ALL_DIRS, sgm_aggregate, penalty_planes, sgm_optimize_volume

RNG = np.random.default_rng(7)


def brute_sgm(cost, p1, p2, dirs=ALL_DIRS, segments=None):
    """Literal L_r recurrence walked per pixel (Hirschmüller-2008 eq. 13).

    p1/p2 may be scalars or (8, H, W) per-direction planes.
    """
    H, W, D = cost.shape
    total = np.zeros_like(cost)
    for di, (dr, dc) in enumerate(dirs):
        L = np.zeros_like(cost)
        rows = range(H) if dr >= 0 else range(H - 1, -1, -1)
        cols = range(W) if dc >= 0 else range(W - 1, -1, -1)
        for r in rows:
            for c in cols:
                pr, pc = r - dr, c - dc
                if pr < 0 or pr >= H or pc < 0 or pc >= W or (
                    segments is not None and segments[r, c] != segments[pr, pc]
                ):
                    L[r, c] = cost[r, c]
                    continue
                prev = L[pr, pc]
                minprev = prev.min()
                p1v = p1 if np.isscalar(p1) else p1[di, r, c]
                p2v = p2 if np.isscalar(p2) else p2[di, r, c]
                for d in range(D):
                    cands = [prev[d]]
                    if d > 0:
                        cands.append(prev[d - 1] + p1v)
                    if d < D - 1:
                        cands.append(prev[d + 1] + p1v)
                    cands.append(minprev + p2v)
                    L[r, c, d] = cost[r, c, d] + min(cands) - minprev
        total += L
    return total


def test_sgm_matches_bruteforce_constant():
    cost = (RNG.random((7, 9, 5)) * 10).astype(np.float32)
    p1p = jnp.full((8, 1, 1), 1.5)
    p2p = jnp.full((8, 1, 1), 4.0)
    got, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    want = brute_sgm(cost, 1.5, 4.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_sgm_matches_bruteforce_perpixel_p2():
    cost = (RNG.random((6, 8, 4)) * 10).astype(np.float32)
    img = (RNG.random((6, 8)) * 50).astype(np.float32)
    p1p, p2p, p2max = penalty_planes(jnp.asarray(img), "inverseGradient", 2.0, 8.0, 10.0, 1.0, 3.0)
    got, _ = sgm_aggregate(jnp.asarray(cost), p1p, jnp.asarray(p2p))
    p1_full = np.full((8, 6, 8), 2.0, np.float32)
    want = brute_sgm(cost, p1_full, np.asarray(p2p))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    assert p2max == 10.0 / 1.0 + 3.0


def test_sgm_piecewise_segments():
    cost = (RNG.random((6, 8, 4)) * 10).astype(np.float32)
    seg = np.zeros((6, 8), np.int32)
    seg[:, 4:] = 1  # vertical split
    p1p = jnp.full((8, 1, 1), 1.0)
    p2p = jnp.full((8, 1, 1), 3.0)
    got, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p, segments=jnp.asarray(seg))
    want = brute_sgm(cost, 1.0, 3.0, segments=seg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_sgm_overcounting():
    cost = (RNG.random((5, 6, 3)) * 10).astype(np.float32)
    p1p = jnp.full((8, 1, 1), 1.0)
    p2p = jnp.full((8, 1, 1), 3.0)
    plain, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    over, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p, overcounting=True)
    np.testing.assert_allclose(np.asarray(plain) - 7 * cost, np.asarray(over), rtol=1e-5)


def test_sgm_min_cost_paths_uniform():
    # one clear global winner at every pixel -> all 8 paths agree
    cost = np.full((5, 6, 4), 10.0, np.float32)
    cost[:, :, 2] = 0.0
    p1p = jnp.full((8, 1, 1), 1.0)
    p2p = jnp.full((8, 1, 1), 3.0)
    _, nb = sgm_aggregate(jnp.asarray(cost), p1p, p2p, min_cost_paths=True)
    np.testing.assert_array_equal(np.asarray(nb), np.full((5, 6), 8.0))


def test_sgm_optimize_volume_nan_and_max():
    cv = (RNG.random((6, 7, 4)) * 2 - 1).astype(np.float32)  # zncc-like
    cv[0, :, :] = np.nan
    cv[3, 4, :] = np.nan
    p1p = jnp.full((8, 1, 1), 0.1)
    p2p = jnp.full((8, 1, 1), 0.4)
    out, _ = sgm_optimize_volume(
        jnp.asarray(cv), p1p, p2p, jnp.float32(0.4), type_measure="max"
    )
    out = np.asarray(out)
    # NaN restored exactly where input was NaN
    np.testing.assert_array_equal(np.isnan(out), np.isnan(cv))
    # the optimized volume is a min-convention volume (negated similarity)
    assert np.nanmean(out) < 0 or np.isfinite(np.nanmean(out))
