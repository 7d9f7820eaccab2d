"""Confidence measures vs literal C++-loop emulations."""

import numpy as np
import jax.numpy as jnp
import pytest

from pandora_tpu.ops.confidence import (
    compute_ambiguity,
    compute_interval_bounds,
    compute_risk,
)

RNG = np.random.default_rng(11)


def searchsorted_cpp(arr, v):
    left, right = 0, len(arr) - 1
    while left < right:
        mid = left + (right - left) // 2
        if arr[mid] < v:
            left = mid + 1
        else:
            right = mid
    return left


def brute_ambiguity(cv, etas, gmin, gmax, dr, sample=False):
    H, W, D = cv.shape
    mn, mx = np.nanmin(cv), np.nanmax(cv)
    diff = mx - mn
    amb = np.zeros((H, W), np.float32)
    samp = np.zeros((H, W, len(etas)), np.float32)
    for r in range(H):
        for c in range(W):
            mimg = np.nanmin(cv[r, c]) if not np.all(np.isnan(cv[r, c])) else np.nan
            t = (mimg - mn) / diff
            if np.isnan(t):
                amb[r, c] = len(etas) * D
                samp[r, c] = D
                continue
            i0 = searchsorted_cpp(dr, gmin[r, c])
            i1 = searchsorted_cpp(dr, gmax[r, c]) + 1
            norm = np.empty(D, np.float32)
            for d in range(D):
                v = cv[r, c, d]
                if np.isnan(v):
                    norm[d] = -np.inf if i0 <= d < i1 else np.inf
                else:
                    norm[d] = (v - mn) / diff
            for ei, eta in enumerate(etas):
                cnt = float((norm <= t + eta).sum())
                amb[r, c] += cnt
                samp[r, c, ei] = cnt
    return (amb, samp) if sample else amb


def brute_risk(cv, etas, gmin, gmax, dr):
    H, W, D = cv.shape
    _, samp = brute_ambiguity(cv, etas, gmin, gmax, dr, sample=True)
    mn, mx = np.nanmin(cv), np.nanmax(cv)
    diff = mx - mn
    outs = [np.zeros((H, W), np.float32) for _ in range(4)]  # max, min, sup, inf
    for r in range(H):
        for c in range(W):
            mimg = np.nanmin(cv[r, c]) if not np.all(np.isnan(cv[r, c])) else np.nan
            t = (mimg - mn) / diff
            if np.isnan(t):
                for o in outs:
                    o[r, c] = np.nan
                continue
            i0 = searchsorted_cpp(dr, gmin[r, c])
            i1 = searchsorted_cpp(dr, gmax[r, c]) + 1
            norm = np.empty(D, np.float32)
            for d in range(D):
                v = cv[r, c, d]
                if np.isnan(v):
                    norm[d] = -np.inf if i0 <= d < i1 else np.inf
                else:
                    norm[d] = (v - mn) / diff
            for ei, eta in enumerate(etas):
                sel = np.nonzero(norm <= t + eta)[0]
                mi, ma = sel.min(), sel.max()
                spread = float(ma - mi)
                outs[0][r, c] += spread
                outs[1][r, c] += 1 + spread - samp[r, c, ei]
                outs[2][r, c] += dr[ma]
                outs[3][r, c] += dr[mi]
    return [o / len(etas) for o in outs]


def _random_cv(H=6, W=8, D=7, nan_frac=0.2):
    cv = (RNG.random((H, W, D)) * 10).astype(np.float32)
    cv[RNG.random((H, W, D)) < nan_frac] = np.nan
    cv[0, 0, :] = np.nan  # an all-NaN pixel
    return cv


def test_ambiguity_matches_bruteforce():
    cv = _random_cv()
    dr = np.arange(-3, 4, dtype=np.float32)
    gmin = np.full((6, 8), -3, np.int64)
    gmax = np.full((6, 8), 3, np.int64)
    gmin[2:, :] = -2  # variable grid
    etas = np.arange(0.0, 0.3, 0.05)
    got = np.asarray(
        compute_ambiguity(jnp.asarray(cv), jnp.asarray(etas), jnp.asarray(gmin), jnp.asarray(gmax), jnp.asarray(dr))
    )
    want = brute_ambiguity(cv, etas, gmin, gmax, dr)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_risk_matches_bruteforce():
    cv = _random_cv()
    dr = np.arange(-3, 4, dtype=np.float32)
    gmin = np.full((6, 8), -3, np.int64)
    gmax = np.full((6, 8), 3, np.int64)
    etas = np.arange(0.0, 0.3, 0.05)
    got = compute_risk(
        jnp.asarray(cv), jnp.asarray(etas), jnp.asarray(gmin), jnp.asarray(gmax), jnp.asarray(dr)
    )
    want = brute_risk(cv, etas, gmin, gmax, dr)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, equal_nan=True)


def brute_intervals(cv, dr, thr, tf, gmin, gmax):
    H, W, D = cv.shape
    mn, mx = np.nanmin(cv), np.nanmax(cv)
    diff = mx - mn
    inf_o = np.full((H, W), np.nan, np.float32)
    sup_o = np.full((H, W), np.nan, np.float32)
    for r in range(H):
        for c in range(W):
            i0 = searchsorted_cpp(dr, gmin[r, c])
            i1 = searchsorted_cpp(dr, gmax[r, c]) + 1
            norm = np.full(D, np.nan, np.float32)
            maxp = -np.inf
            for d in range(i0, i1):
                v = cv[r, c, d]
                norm[d] = (v - mn) / diff
                if not np.isnan(v):
                    maxp = max(maxp, tf * norm[d])
            if np.isinf(maxp):
                continue
            poss = np.where(np.isnan(norm), np.nan, tf * norm + 1 - maxp)
            with np.errstate(invalid="ignore"):
                sel = [d for d in range(i0, i1) if poss[d] >= thr]
            if not sel:
                continue
            mi, ma = min(sel), max(sel)
            if mi > 0 and int(poss[mi]) == 1:
                mi -= 1
            if ma < D - 1 and int(poss[ma]) == 1:
                ma += 1
            inf_o[r, c] = dr[mi]
            sup_o[r, c] = dr[ma]
    return inf_o, sup_o


def test_interval_bounds_matches_bruteforce():
    cv = _random_cv()
    dr = np.arange(-3, 4, dtype=np.float32)
    gmin = np.full((6, 8), -3, np.int64)
    gmax = np.full((6, 8), 3, np.int64)
    inf_g, sup_g = compute_interval_bounds(
        jnp.asarray(cv), jnp.asarray(dr), 0.9, -1.0, jnp.asarray(gmin), jnp.asarray(gmax)
    )
    inf_w, sup_w = brute_intervals(cv, dr, 0.9, -1.0, gmin, gmax)
    np.testing.assert_allclose(np.asarray(inf_g), inf_w, equal_nan=True)
    np.testing.assert_allclose(np.asarray(sup_g), sup_w, equal_nan=True)
