"""Hand-computed matching-cost matrices ported from the reference suite
(tests/test_matching_cost/test_matching_cost_{census,sad,ssd,zncc}.py):
census Hamming costs for every window size 3..13, the full subpix=2
census volume, SAD/SSD pixel and window sums, the SAD -2..1 full volume,
and ZNCC closed-form window correlations.  Expected arrays are the
reference's own ground truths."""

import jax.numpy as jnp
import numpy as np
import pytest

from pandora_tpu.ops.census import census_cost_volume
from pandora_tpu.ops.local_costs import sad_ssd_cost_volume, zncc_cost_volume

n = np.nan


def _census(left, right, dmin, dmax, subpix=1, window=3):
    return np.asarray(
        census_cost_volume(
            jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32), dmin, dmax, subpix, window
        )
    )


def test_census_cost_window3():
    """reference test_matching_cost_census.py:65-140: 4x4 pair, disp -1..1."""
    left = np.array([[1, 1, 1, 3], [1, 2, 1, 0], [2, 1, 0, 1], [1, 1, 1, 1]])
    right = np.array([[5, 1, 2, 3], [1, 2, 1, 0], [2, 2, 0, 1], [1, 1, 1, 1]])
    cv = _census(left, right, -1, 1)
    gt_d1 = np.array([[n, n, n, n], [n, n, 3, n], [n, n, 7, n], [n, n, n, n]])
    gt_d2 = np.array([[n, n, n, n], [n, 1, 2, n], [n, 2, 0, n], [n, n, n, n]])
    gt_d3 = np.array([[n, n, n, n], [n, 4, n, n], [n, 5, n, n], [n, n, n, n]])
    np.testing.assert_array_equal(cv[:, :, 0], gt_d1)
    np.testing.assert_array_equal(cv[:, :, 1], gt_d2)
    np.testing.assert_array_equal(cv[:, :, 2], gt_d3)


_W5_LEFT = np.array(
    [[0, 2, 2, 0, 2], [2, 0, 2, 0, 2], [2, 0, 1, 2, 0], [0, 2, 0, 0, 0], [0, 2, 2, 2, 0]]
)
_W5_RIGHT = np.array(
    [[0, 2, 2, 2, 2], [0, 0, 0, 0, 2], [2, 0, 1, 2, 0], [0, 2, 2, 0, 2], [0, 0, 2, 2, 0]]
)


def test_census_window5_center():
    """reference test_matching_cost_census.py id='Census window=5'."""
    cv = _census(_W5_LEFT, _W5_RIGHT, 0, 0, window=5)
    assert cv.shape == (5, 5, 1)
    gt = np.full((5, 5), n)
    gt[2, 2] = 6
    np.testing.assert_array_equal(cv[:, :, 0], gt)


def test_census_window3_zero_cost():
    """reference id='Census window=3, final cost=0': identical pair."""
    im = np.array([[2, 0, 2], [0, 1, 0], [2, 0, 2]])
    cv = _census(im, im, 0, 0, window=3)
    gt = np.full((3, 3), n)
    gt[1, 1] = 0
    np.testing.assert_array_equal(cv[:, :, 0], gt)


@pytest.mark.parametrize(
    "window,expected",
    [(7, 21), (9, 33), (11, 120), (13, 49)],
)
def test_census_large_windows_center(window, expected):
    """reference ids 'Census window=7/9/11/13': only the center pixel is
    computed; its Hamming cost matches the hand count."""
    if window == 7:
        left = np.array(
            [
                [2, 2, 0, 2, 2, 0, 0],
                [0, 2, 2, 2, 0, 2, 0],
                [2, 0, 2, 0, 2, 2, 2],
                [2, 2, 0, 1, 2, 0, 2],
                [2, 0, 2, 2, 0, 2, 2],
                [0, 2, 0, 2, 2, 0, 2],
                [2, 0, 2, 0, 0, 2, 2],
            ]
        )
        right = np.array(
            [
                [0, 2, 2, 0, 2, 2, 0],
                [0, 2, 2, 2, 0, 2, 0],
                [0, 2, 2, 2, 0, 0, 0],
                [2, 2, 0, 1, 2, 0, 2],
                [2, 0, 2, 2, 0, 0, 0],
                [0, 2, 2, 0, 0, 2, 0],
                [2, 2, 0, 2, 0, 2, 0],
            ]
        )
    elif window == 9:
        left = np.array(
            [
                [2, 2, 0, 2, 2, 0, 0, 2, 2],
                [0, 2, 2, 2, 0, 0, 0, 0, 0],
                [2, 0, 2, 0, 2, 2, 2, 0, 2],
                [2, 2, 0, 2, 2, 0, 2, 2, 2],
                [2, 0, 2, 2, 1, 2, 2, 0, 2],
                [0, 2, 0, 2, 2, 0, 2, 2, 0],
                [2, 0, 2, 0, 0, 2, 2, 0, 2],
                [2, 2, 2, 2, 0, 0, 2, 0, 2],
                [0, 2, 2, 0, 2, 2, 2, 2, 0],
            ]
        )
        right = np.array(
            [
                [2, 0, 0, 2, 2, 2, 0, 0, 2],
                [2, 0, 0, 0, 2, 2, 2, 2, 2],
                [2, 2, 2, 0, 2, 0, 2, 2, 2],
                [2, 0, 0, 2, 2, 2, 2, 0, 2],
                [2, 2, 2, 2, 1, 0, 2, 2, 2],
                [0, 0, 0, 2, 2, 2, 2, 0, 0],
                [2, 2, 2, 0, 0, 0, 2, 2, 2],
                [2, 0, 2, 2, 0, 2, 2, 2, 2],
                [0, 0, 2, 0, 2, 0, 2, 0, 0],
            ]
        )
    elif window == 11:
        left = np.full((11, 11), 2.0)
        left[5, 5] = 1
        right = np.zeros((11, 11))
        right[5, 5] = 1
    else:  # 13
        left = np.zeros((13, 13))
        left[6, 6] = 1
        right = np.array(
            [
                [2, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 0],
                [0, 0, 0, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2],
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                [0, 2, 2, 2, 2, 2, 2, 2, 0, 0, 0, 0, 0],
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0],
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0],
                [0, 0, 0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 0],
                [0, 0, 0, 0, 2, 2, 2, 2, 2, 2, 0, 0, 2],
                [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2],
                [0, 0, 0, 2, 2, 2, 2, 2, 0, 0, 0, 0, 2],
                [0, 0, 0, 0, 2, 0, 0, 2, 0, 2, 2, 2, 2],
                [0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 2],
                [2, 0, 0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0],
            ]
        )
    cv = _census(left, right, 0, 0, window=window)
    c = window // 2
    assert np.isnan(np.delete(cv[:, :, 0].ravel(), c * window + c)).all()
    assert cv[c, c, 0] == expected


def test_census_subpix2_full_volume():
    """reference id='Census window=3, subpix=2, full cost volume test'."""
    left = np.array([[4, 0, 4, 0, 4], [4, 1, 2, 3, 0], [0, 4, 0, 0, 0]])
    right = np.array([[0, 0, 0, 0, 4], [4, 1, 2, 3, 0], [0, 4, 4, 0, 4]])
    cv = _census(left, right, -1, 1, subpix=2, window=3)
    gt = np.transpose(
        np.array(
            [
                [[n, n, n, n, n], [n, n, 5, 5, n], [n, n, n, n, n]],
                [[n, n, n, n, n], [n, n, 4, 3, n], [n, n, n, n, n]],
                [[n, n, n, n, n], [n, 3, 2, 3, n], [n, n, n, n, n]],
                [[n, n, n, n, n], [n, 4, 2, n, n], [n, n, n, n, n]],
                [[n, n, n, n, n], [n, 4, 4, n, n], [n, n, n, n, n]],
            ]
        ),
        (1, 2, 0),
    )
    np.testing.assert_array_equal(cv, gt)


# --- SAD / SSD (reference test_matching_cost_sad.py / _ssd.py) -------------

_SAD_LEFT = np.array(
    [[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 2, 1], [1, 1, 1, 4, 3, 1], [1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1]],
    np.float64,
)
_SAD_RIGHT = np.array(
    [[1, 1, 1, 2, 2, 2], [1, 1, 1, 4, 2, 4], [1, 1, 1, 4, 4, 1], [1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1]],
    np.float64,
)


def test_sad_pixelwise_and_window5():
    """reference test_matching_cost_sad.py:60-124."""
    cv1 = np.asarray(
        sad_ssd_cost_volume(jnp.asarray(_SAD_LEFT, jnp.float32), jnp.asarray(_SAD_RIGHT, jnp.float32), -1, 1, 1, 1, False)
    )
    ad_gt = np.array(
        [[0, 0, 0, 1, 1, 1], [0, 0, 0, 3, 0, 3], [0, 0, 0, 0, 1, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]],
        np.float32,
    )
    np.testing.assert_array_equal(cv1[:, :, 1], ad_gt)

    cv5 = np.asarray(
        sad_ssd_cost_volume(jnp.asarray(_SAD_LEFT, jnp.float32), jnp.asarray(_SAD_RIGHT, jnp.float32), -1, 1, 1, 5, False)
    )
    gt = np.full((5, 6), n, np.float32)
    gt[2, 2], gt[2, 3] = 6.0, 10.0
    np.testing.assert_array_equal(cv5[:, :, 1], gt)


def test_ssd_pixelwise_and_window5():
    """reference test_matching_cost_ssd.py:60-119."""
    cv1 = np.asarray(
        sad_ssd_cost_volume(jnp.asarray(_SAD_LEFT, jnp.float32), jnp.asarray(_SAD_RIGHT, jnp.float32), -1, 1, 1, 1, True)
    )
    sd_gt = np.array(
        [[0, 0, 0, 1, 1, 1], [0, 0, 0, 9, 0, 9], [0, 0, 0, 0, 1, 0], [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]],
        np.float32,
    )
    np.testing.assert_array_equal(cv1[:, :, 1], sd_gt)

    cv5 = np.asarray(
        sad_ssd_cost_volume(jnp.asarray(_SAD_LEFT, jnp.float32), jnp.asarray(_SAD_RIGHT, jnp.float32), -1, 1, 1, 5, True)
    )
    gt = np.full((5, 6), n, np.float32)
    gt[2, 2], gt[2, 3] = 12.0, 22.0
    np.testing.assert_array_equal(cv5[:, :, 1], gt)


def test_sad_full_volume_disp_m2_1():
    """reference test_matching_cost_sad.py:205-290: 3x4 pair, disp -2..1,
    window 3 — full (row, col, disp) volume."""
    left = np.array([[1, 2, 1, 4], [6, 2, 7, 4], [1, 1, 3, 6]], np.float64)
    right = np.array([[6, 7, 8, 10], [2, 4, 1, 6], [9, 10, 1, 2]], np.float64)
    cv = np.asarray(
        sad_ssd_cost_volume(jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32), -2, 1, 1, 3, False)
    )
    gt = np.array(
        [
            [[n, n, n, n], [n, n, n, n], [n, n, n, n], [n, n, n, n]],
            [[n, n, n, n], [n, n, 48, 35], [n, 40, 43, n], [n, n, n, n]],
            [[n, n, n, n], [n, n, n, n], [n, n, n, n], [n, n, n, n]],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(cv, gt)


# --- ZNCC (reference test_matching_cost_zncc.py) ----------------------------


def test_zncc_window5_closed_form():
    """reference test_matching_cost_zncc.py:60-122: row 2 costs at disp
    -1 and +1 match the closed-form window correlation."""
    cv = np.asarray(
        zncc_cost_volume(jnp.asarray(_SAD_LEFT, jnp.float32), jnp.asarray(_SAD_RIGHT, jnp.float32), -1, 1, 1, 5)
    )
    row = _SAD_LEFT[:, 1:]
    col = _SAD_RIGHT[:, :5]
    zncc_m1 = (np.mean(row * col) - np.mean(row) * np.mean(col)) / (np.std(row) * np.std(col))
    gt_m1 = np.array([n, n, n, zncc_m1, n, n])
    np.testing.assert_allclose(cv[2, :, 0], gt_m1, rtol=1e-5)

    row = _SAD_LEFT[:, :5]
    col = _SAD_RIGHT[:, 1:]
    zncc_p1 = (np.mean(row * col) - np.mean(row) * np.mean(col)) / (np.std(row) * np.std(col))
    gt_p1 = np.array([n, n, zncc_p1, n, n, n])
    np.testing.assert_allclose(cv[2, :, 2], gt_p1, rtol=1e-5)


def test_zncc_subpix_disparity_range():
    """reference test_matching_cost_zncc.py:124-167: subpix=2 expands the
    axis to quarter...half steps ending exactly at dmax."""
    from pandora_tpu.ops.cost_volume import disparity_range

    got = disparity_range(-2, 2, 2)
    np.testing.assert_array_equal(got, [-2, -1.5, -1, -0.5, 0, 0.5, 1, 1.5, 2])
    left = np.array([[7, 8, 1, 0, 2], [4, 5, 2, 1, 0], [8, 9, 10, 0, 0]], np.float64)
    right = np.array([[1, 5, 6, 3, 4], [2, 5, 10, 6, 9], [0, 7, 5, 3, 1]], np.float64)
    cv = np.asarray(
        zncc_cost_volume(jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32), -2, 2, 2, 3)
    )
    assert cv.shape == (3, 5, 9)
    # |zncc| <= 1 wherever computed
    assert np.nanmax(np.abs(cv)) <= 1.0 + 1e-5
