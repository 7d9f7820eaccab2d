"""Matching-cost kernels vs brute-force reference emulations and the
reference's hand-computed tiny arrays (tests/test_matching_cost/ style)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pandora_tpu.ops.census import census_cost_volume
from pandora_tpu.ops.local_costs import sad_ssd_cost_volume, zncc_cost_volume
from pandora_tpu.ops.cost_volume import disparity_range, reverse_cost_volume

import emulators as em

RNG = np.random.default_rng(42)


def _img(h, w, scale=10.0):
    return (RNG.random((h, w)) * scale).astype(np.float32)


def assert_cv_equal(got, want, rtol=0, atol=0):
    got, want = np.asarray(got), np.asarray(want)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    g, w = np.nan_to_num(got), np.nan_to_num(want)
    if rtol or atol:
        np.testing.assert_allclose(g, w, rtol=rtol, atol=atol)
    else:
        np.testing.assert_array_equal(g, w)


CASES = [(-4, -1, 1, 3), (-3, 2, 1, 5), (0, 3, 2, 3), (-5, 0, 4, 5), (2, 5, 2, 3)]


@pytest.mark.parametrize("dmin,dmax,subpix,w", CASES)
def test_census_matches_reference_loop(dmin, dmax, subpix, w):
    left, right = _img(10, 14), _img(10, 14)
    got = census_cost_volume(jnp.asarray(left), jnp.asarray(right), dmin, dmax, subpix, w)
    want = em.census_cv(left, right, dmin, dmax, subpix, w)
    assert_cv_equal(got, want)


def test_census_handcomputed_5x6():
    """Reference-style tiny array (tests/common.py hand-computed pattern)."""
    left = np.array(
        [
            [1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 2, 1],
            [1, 1, 1, 4, 3, 1],
            [1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1],
        ],
        np.float32,
    )
    right = np.roll(left, 1, axis=1).astype(np.float32)
    got = np.asarray(census_cost_volume(jnp.asarray(left), jnp.asarray(right), -2, 2, 1, 3))
    want = em.census_cv(left, right, -2, 2, 1, 3)
    assert_cv_equal(got, want)
    # perfect match at disparity +1 in the interior
    d1 = got[2, 3, 3]
    assert d1 == 0.0


@pytest.mark.parametrize("dmin,dmax,subpix,w", CASES)
@pytest.mark.parametrize("squared", [False, True])
def test_sad_ssd_matches_reference_loop(dmin, dmax, subpix, w, squared):
    left, right = _img(9, 13), _img(9, 13)
    got = sad_ssd_cost_volume(
        jnp.asarray(left), jnp.asarray(right), dmin, dmax, subpix, w, squared
    )
    want = em.sad_ssd_cv(left, right, dmin, dmax, subpix, w, squared)
    assert_cv_equal(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("dmin,dmax,subpix,w", CASES)
def test_zncc_matches_reference_loop(dmin, dmax, subpix, w):
    left, right = _img(9, 13), _img(9, 13)
    got = zncc_cost_volume(jnp.asarray(left), jnp.asarray(right), dmin, dmax, subpix, w)
    want = em.zncc_cv(left, right, dmin, dmax, subpix, w)
    assert_cv_equal(got, want, rtol=2e-4, atol=2e-4)


def test_disparity_range_subpix():
    np.testing.assert_array_equal(disparity_range(-2, 1, 1), [-2, -1, 0, 1])
    np.testing.assert_allclose(disparity_range(-2, 1, 2), [-2, -1.5, -1, -0.5, 0, 0.5, 1])
    assert len(disparity_range(-60, 0, 4)) == 241


def test_reverse_cost_volume_identity():
    """CV_R(r, c, d) == CV_L(r, c+d, -d) (matching_cost.cpp:26-57); the
    C++ doctest checks reversing twice restores the original interior."""
    left, right = _img(8, 12), _img(8, 12)
    dmin, dmax = -3, 1
    cv_l = np.asarray(census_cost_volume(jnp.asarray(left), jnp.asarray(right), dmin, dmax, 1, 3))
    cv_r = np.asarray(reverse_cost_volume(jnp.asarray(cv_l), dmin))
    disps_r = np.arange(-dmax, -dmin + 1)
    H, W, D = cv_l.shape
    for r in range(H):
        for c in range(W):
            for k, d in enumerate(disps_r):
                if 0 <= c + d < W:
                    expected = cv_l[r, c + d, D - 1 - k]
                    got = cv_r[r, c, k]
                    assert (np.isnan(expected) and np.isnan(got)) or expected == got
                else:
                    assert np.isnan(cv_r[r, c, k])
