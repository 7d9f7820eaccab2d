"""Hand-computed refinement matrices ported from the reference suite
(tests/test_refinement.py:84-785): quadratic / vfit fits, subpix scaling,
NaN handling, the approximate (fast-mode) right refinement, and the
refinement→filter interaction.  Expected arrays are the reference's own
closed-form ground truths, asserted exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

import pandora_tpu.constants as cst
from pandora_tpu.ops.refinement import refine, refine_approximate

STOP = cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION

CV = np.array(
    [
        [
            [39, 32.5, 28, 34.5, 41],
            [49, 41.5, 37, 34, 35.5],
            [42.5, 40, 45, 40.5, 41],
            [22, 30, 45, 50, 31],
        ]
    ],
    np.float32,
)


def _run(cv, disp, d_min, d_max, subpix, method, vmask=None):
    if vmask is None:
        vmask = np.zeros(disp.shape, np.uint16)
    d, m, c = refine(
        jnp.asarray(cv),
        jnp.asarray(disp),
        jnp.asarray(vmask),
        float(d_min),
        float(d_max),
        subpix,
        "min",
        method,
    )
    return np.asarray(d), np.asarray(m), np.asarray(c)


def test_quadratic():
    """reference test_refinement.py:87-140"""
    disp = np.array([[0, 1, -1, -2]], np.float32)
    d, m, c = _run(CV, disp, -2, 2, 1, "quadratic")
    x_0 = -((34.5 - 32.5) / (2 * (32.5 + 34.5 - 2 * 28)))
    x_1 = -((35.5 - 37) / (2 * (37 + 35.5 - 2 * 34)))
    x_2 = -((45 - 42.5) / (2 * (42.5 + 45 - 2 * 40)))
    gt_d = np.array([[0 + x_0, 1 + x_1, -1 + x_2, -2]], np.float32)
    gt_c = np.array(
        [
            [
                ((32.5 + 34.5 - 2 * 28) / 2) * x_0 * x_0 + ((34.5 - 32.5) / 2) * x_0 + 28,
                ((37 + 35.5 - 2 * 34) / 2) * x_1 * x_1 + ((35.5 - 37) / 2) * x_1 + 34,
                ((42.5 + 45 - 2 * 40) / 2) * x_2 * x_2 + ((45 - 42.5) / 2) * x_2 + 40,
                22,
            ]
        ]
    )
    np.testing.assert_allclose(d, gt_d, rtol=1e-6)
    np.testing.assert_allclose(c, gt_c, rtol=1e-6)
    np.testing.assert_array_equal(m, np.array([[0, 0, 0, STOP]], np.uint16))


def test_quadratic_subpix():
    """reference test_refinement.py:142-225: subpix 2 halves the shift."""
    disp = np.array([[0, 0.5, -0.5, -1]], np.float32)
    d, m, c = _run(CV, disp, -1, 1, 2, "quadratic")
    x_0 = -((34.5 - 32.5) / (2 * (32.5 + 34.5 - 2 * 28)))
    x_1 = -((35.5 - 37) / (2 * (37 + 35.5 - 2 * 34)))
    x_2 = -((45 - 42.5) / (2 * (42.5 + 45 - 2 * 40)))
    gt_d = np.array([[0 + x_0 / 2, 0.5 + x_1 / 2, -0.5 + x_2 / 2, -1]], np.float32)
    np.testing.assert_allclose(d, gt_d, rtol=1e-6)
    np.testing.assert_array_equal(m, np.array([[0, 0, 0, STOP]], np.uint16))


def test_quadratic_with_nan_and_subpix():
    """reference test_refinement.py:227-318: NaN triplet members stop the
    interpolation and keep c1 as the coefficient."""
    cv = CV.copy()
    cv[0, 1, 2] = np.nan
    cv[0, 2, 2] = np.nan
    disp = np.array([[0, 0.5, -0.5, -1]], np.float32)
    d, m, c = _run(cv, disp, -1, 1, 2, "quadratic")
    x_0 = -((34.5 - 32.5) / (2 * (32.5 + 34.5 - 2 * 28)))
    gt_d = np.array([[0 + x_0 / 2, 0.5, -0.5, -1]], np.float32)
    gt_c = np.array(
        [
            [
                ((32.5 + 34.5 - 2 * 28) / 2) * x_0 * x_0 + ((34.5 - 32.5) / 2) * x_0 + 28,
                34,
                40,
                22,
            ]
        ]
    )
    np.testing.assert_allclose(d, gt_d, rtol=1e-6)
    np.testing.assert_allclose(c, gt_c, rtol=1e-6)
    np.testing.assert_array_equal(m, np.array([[0, STOP, STOP, STOP]], np.uint16))


def test_vfit():
    """reference test_refinement.py:320-367"""
    disp = np.array([[0, 1, -1, -2]], np.float32)
    d, m, c = _run(CV, disp, -2, 2, 1, "vfit")
    gt_d = np.array(
        [
            [
                0 + ((32.5 - 34.5) / (2 * (34.5 - 28))),
                1 + ((37 - 35.5) / (2 * (37 - 34))),
                -1 + ((42.5 - 45) / (2 * (45 - 40))),
                -2,
            ]
        ],
        np.float32,
    )
    gt_c = np.array(
        [
            [
                34.5 + (((32.5 - 34.5) / (2 * (34.5 - 28))) - 1) * (34.5 - 28),
                35.5 + (((37 - 35.5) / (2 * (37 - 34))) - 1) * (37 - 34),
                45 + ((42.5 - 45) / (2 * (45 - 40)) - 1) * (45 - 40),
                22,
            ]
        ]
    )
    np.testing.assert_array_equal(d, gt_d)
    np.testing.assert_array_equal(c, gt_c)
    np.testing.assert_array_equal(m, np.array([[0, 0, 0, STOP]], np.uint16))


def test_vfit_subpix():
    """reference test_refinement.py:369-446"""
    disp = np.array([[0, 0.5, -0.5, -1]], np.float32)
    d, m, c = _run(CV, disp, -1, 1, 2, "vfit")
    gt_d = np.array(
        [
            [
                0 + ((32.5 - 34.5) / (2 * (34.5 - 28))) / 2,
                0.5 + ((37 - 35.5) / (2 * (37 - 34))) / 2,
                -0.5 + ((42.5 - 45) / (2 * (45 - 40))) / 2,
                -1,
            ]
        ],
        np.float32,
    )
    np.testing.assert_array_equal(d, gt_d)
    np.testing.assert_array_equal(m, np.array([[0, 0, 0, STOP]], np.uint16))


def test_vfit_with_nan():
    """reference test_refinement.py:514-566: all-NaN lane is skipped with
    no stopped bit; NaN neighbours stop the fit."""
    cv = np.array([[[np.nan, np.nan, np.nan], [np.nan, 2, 4], [3, 1, 4]]], np.float32)
    disp = np.array([[0, 0, 0]], np.float32)
    d, m, c = _run(cv, disp, -1, 1, 1, "vfit")
    gt_d = np.array([[0, 0, 0 + ((3 - 4) / (2 * (4 - 1)))]], np.float32)
    gt_c = np.array([[np.nan, 2, 4 + (((3 - 4) / (2 * (4 - 1))) - 1) * (4 - 1)]])
    np.testing.assert_array_equal(d, gt_d)
    np.testing.assert_array_equal(c, gt_c)
    np.testing.assert_array_equal(m, np.array([[0, STOP, 0]], np.uint16))


def test_vfit_with_nan_and_subpix():
    """reference test_refinement.py:568-655"""
    cv = CV.copy()
    cv[0, 1, 2] = np.nan
    cv[0, 2, 2] = np.nan
    disp = np.array([[0, 0.5, -0.5, -1]], np.float32)
    d, m, c = _run(cv, disp, -1, 1, 2, "vfit")
    gt_d = np.array(
        [[0 + ((32.5 - 34.5) / (2 * (34.5 - 28))) / 2, 0.5, -0.5, -1]], np.float32
    )
    np.testing.assert_array_equal(d, gt_d)
    np.testing.assert_array_equal(m, np.array([[0, STOP, STOP, STOP]], np.uint16))


def test_vfit_approximate_refinement():
    """reference test_refinement.py:448-512: fast-mode refinement of the
    right disparity map on the left cost volume diagonal."""
    cv_left = np.array(
        [
            [
                [np.nan, np.nan, np.nan, 5, 0, 1],
                [np.nan, np.nan, 4, 1, 0, 2],
                [np.nan, 2, 3, 2, 0, np.nan],
                [0, 5, 4, 2, np.nan, np.nan],
            ]
        ],
        np.float32,
    )
    disp_right = np.array([[3, -1, -1, -1]], np.float32)
    vmask = np.zeros((1, 4), np.uint16)
    d, m, c = refine_approximate(
        jnp.asarray(cv_left),
        jnp.asarray(disp_right),
        jnp.asarray(vmask),
        -3.0,
        2.0,
        1,
        "min",
        "vfit",
    )
    d, m, c = np.asarray(d), np.asarray(m), np.asarray(c)
    gt_d = np.array(
        [[3, -1, -1 + (1 - 2) / (2 * (2 - 0)), -1 + (2 - 2) / (2 * (2 - 0))]], np.float32
    )
    gt_c = np.array(
        [[0, 0, 2 + ((1 - 2) / (2 * (2 - 0)) - 1) * (2 - 0), 2 + ((2 - 2) / (2 * (2 - 0)) - 1) * (2 - 0)]],
        np.float32,
    )
    gt_m = np.array([[STOP, STOP, 0, 0]], np.uint16)
    np.testing.assert_array_equal(d, gt_d)
    np.testing.assert_array_equal(c, gt_c)
    np.testing.assert_array_equal(m, gt_m)


def test_invalid_pixels_skipped():
    """Pixels carrying an invalid bit are untouched: disparity kept, no
    stopped bit, NaN coefficient (refinement.cpp:54-60)."""
    disp = np.array([[0, 1, -1, -2]], np.float32)
    vmask = np.array(
        [[cst.PANDORA_MSK_PIXEL_INVALID, 0, cst.PANDORA_MSK_PIXEL_OCCLUSION, 0]],
        np.uint16,
    )
    d, m, c = _run(CV, disp, -2, 2, 1, "vfit", vmask)
    assert d[0, 0] == 0 and d[0, 2] == -1
    assert m[0, 0] == cst.PANDORA_MSK_PIXEL_INVALID
    assert m[0, 2] == cst.PANDORA_MSK_PIXEL_OCCLUSION
    assert np.isnan(c[0, 0]) and np.isnan(c[0, 2])
    # the valid pixel 1 still refines
    assert d[0, 1] == np.float32(1 + ((37 - 35.5) / (2 * (37 - 34))))
