"""WTA + refinement unit tests (reference test_disparity.py /
test_refinement.py style: tiny arrays, exact assertions)."""

import numpy as np
import jax.numpy as jnp

import pandora_tpu.constants as cst
from pandora_tpu.ops.wta import wta
from pandora_tpu.ops.refinement import refine


def test_wta_min_and_invalid():
    cv = np.full((1, 2, 3), np.nan, np.float32)
    cv[0, 0] = [5.0, 2.0, 7.0]
    # cv[0,1] all NaN -> invalid
    disp_vals = jnp.asarray([-1.0, 0.0, 1.0])
    disp, vmask, _ = wta(jnp.asarray(cv), disp_vals, "min", -9999.0, None)
    disp, vmask = np.asarray(disp), np.asarray(vmask)
    assert disp[0, 0] == 0.0
    assert disp[0, 1] == -9999.0
    assert vmask[0, 0] == 0
    assert vmask[0, 1] == cst.PANDORA_MSK_PIXEL_INVALID


def test_wta_max_first_tie():
    cv = np.array([[[1.0, 3.0, 3.0, 0.0]]], np.float32)
    disp_vals = jnp.asarray([-2.0, -1.0, 0.0, 1.0])
    disp, _, _ = wta(jnp.asarray(cv), disp_vals, "max", -9999.0, None)
    assert np.asarray(disp)[0, 0] == -1.0  # first occurrence like np.argmax


def _refine_single(c0, c1, c2, method, type_measure="min", disp=0.0, dmin=-1.0, dmax=1.0):
    cv = np.full((1, 1, 3), np.nan, np.float32)
    cv[0, 0] = [c0, c1, c2]
    vmask = jnp.zeros((1, 1), jnp.uint16)
    d, m, coeff = refine(
        jnp.asarray(cv), jnp.full((1, 1), disp, jnp.float32), vmask, dmin, dmax, 1, type_measure, method
    )
    return float(np.asarray(d)[0, 0]), int(np.asarray(m)[0, 0]), float(np.asarray(coeff)[0, 0])


def test_vfit_symmetric_v():
    # c0=4, c1=1, c2=2: a = c2-c1 = 1 (ic0>ic2 False... ic0=4>ic2=2 True -> a=c0-c1=3)
    d, m, coeff = _refine_single(4.0, 1.0, 2.0, "vfit")
    # sub = (c0-c2)/(2a) = 2/6 = 1/3 ; cost = a*(sub-1)+c2 = 3*(-2/3)+2 = 0
    assert abs(d - 1.0 / 3.0) < 1e-6
    assert m == 0
    assert abs(coeff - 0.0) < 1e-6


def test_vfit_flat_slope():
    d, m, coeff = _refine_single(1.0, 1.0, 1.0, "vfit")
    assert d == 0.0 and m == 0 and coeff == 1.0


def test_quadratic_vertex():
    # parabola through (−1,4),(0,1),(1,2): alpha=2, beta=−1 → sub=0.25
    d, m, coeff = _refine_single(4.0, 1.0, 2.0, "quadratic")
    assert abs(d - 0.25) < 1e-6
    assert abs(coeff - (2 * 0.25**2 - 0.25 + 1)) < 1e-6


def test_refinement_stopped_on_edge_and_nan():
    # disp at range edge -> stopped bit, no shift
    d, m, coeff = _refine_single(4.0, 1.0, 2.0, "vfit", disp=-1.0)
    assert d == -1.0 and m == cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION
    # NaN neighbor -> stopped bit
    d, m, coeff = _refine_single(np.nan, 1.0, 2.0, "vfit")
    assert d == 0.0 and m == cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION and coeff == 1.0


def test_refinement_not_extremum():
    # c1 not the minimum -> stopped
    d, m, coeff = _refine_single(0.5, 1.0, 2.0, "vfit")
    assert d == 0.0 and m == cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION and coeff == 1.0


def test_refinement_invalid_pixel_untouched():
    cv = np.zeros((1, 1, 3), np.float32)
    vmask = jnp.full((1, 1), cst.PANDORA_MSK_PIXEL_OCCLUSION, jnp.uint16)
    d, m, coeff = refine(
        jnp.asarray(cv), jnp.full((1, 1), -9999.0, jnp.float32), vmask, -1.0, 1.0, 1, "min", "vfit"
    )
    assert np.asarray(d)[0, 0] == -9999.0
    assert np.isnan(np.asarray(coeff)[0, 0])
    assert np.asarray(m)[0, 0] == cst.PANDORA_MSK_PIXEL_OCCLUSION


def test_refinement_max_measure():
    # similarity: c1 must be the max; fit happens on inverted comparison
    d, m, coeff = _refine_single(0.2, 0.9, 0.5, "quadratic", type_measure="max")
    alpha = (0.2 - 2 * 0.9 + 0.5) / 2
    beta = (0.5 - 0.2) / 2
    sub = max(-1.0, min(1.0, -beta / (2 * alpha)))
    assert abs(d - sub) < 1e-6
    assert m == 0
