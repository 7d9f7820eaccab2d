"""Sub-pixel disparity refinement: vfit and quadratic 3-point fits.

Branchless vectorized re-design of the reference's per-pixel C++ loop with
Python callbacks (refinement/cpp/src/refinement.cpp:28-181, vfit.cpp:28-56,
quadratic.cpp:28-50, refinement_tools.cpp:25-56) — the callback-per-pixel
pattern is replaced by three gathers along the disparity axis and
``jnp.where`` selects, identical numerics.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .. import constants as cst


def _vfit(c0, c1, c2, inverse):
    """vfit.cpp:28-56: symmetric-V tangent solve."""
    ic0, ic2 = inverse * c0, inverse * c2
    a = jnp.where(ic0 > ic2, c0 - c1, c2 - c1)
    flat = jnp.abs(a) < 1.0e-15
    safe_a = jnp.where(flat, 1.0, a)
    sub = jnp.where(flat, 0.0, (c0 - c2) / (2.0 * safe_a))
    cost = jnp.where(flat, c1, a * (sub - 1.0) + c2)
    return sub, cost


def _quadratic(c0, c1, c2, inverse):
    """quadratic.cpp:28-50: parabola vertex clamped to [-1, 1]; the
    degenerate 0/0 case yields -1 exactly like std::min/std::max NaN
    propagation in the C++."""
    alpha = (c0 - 2.0 * c1 + c2) / 2.0
    beta = (c2 - c0) / 2.0
    raw = -beta / (2.0 * alpha)
    sub = jnp.where(jnp.isnan(raw), -1.0, jnp.clip(raw, -1.0, 1.0))
    cost = alpha * sub * sub + beta * sub + c1
    return sub, cost


_METHODS = {"vfit": _vfit, "quadratic": _quadratic}


def refine(
    cv: jnp.ndarray,
    disp: jnp.ndarray,
    validity_mask: jnp.ndarray,
    d_min: float,
    d_max: float,
    subpix: int,
    type_measure: str,
    method: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """loop_refinement (refinement.cpp:28-99), vectorized.

    :return: (refined disparity, updated validity mask, interpolated_coeff)
    """
    n_disp = cv.shape[2]
    invalid = (validity_mask & cst.PANDORA_MSK_PIXEL_INVALID) != 0
    idx_f = (disp - d_min) * subpix
    idx = jnp.where(invalid, 0, idx_f.astype(jnp.int32))
    idx_c = jnp.clip(idx, 1, n_disp - 2)

    # one-hot masked reductions instead of take_along_axis: TPU gathers on
    # the minor (disp) axis are ~6x slower than one fused pass over the CV
    # computing the three selected planes as masked sums
    iota = jnp.arange(n_disp)[None, None, :]

    def _select(i):
        return jnp.sum(jnp.where(iota == i[:, :, None], cv, 0.0), axis=2)

    c1 = _select(jnp.clip(idx, 0, n_disp - 1))
    c0 = _select(idx_c - 1)
    c2 = _select(idx_c + 1)

    return refine_from_triplet(
        c0, c1, c2, disp, validity_mask, d_min, d_max, subpix, type_measure, method
    )


def refine_from_triplet(
    c0: jnp.ndarray,
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    disp: jnp.ndarray,
    validity_mask: jnp.ndarray,
    d_min: float,
    d_max: float,
    subpix: int,
    type_measure: str,
    method: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Refinement given the pre-extracted (c[idx-1], c[idx], c[idx+1])
    cost triplet — the Pallas fused SGM→WTA path emits the triplet in its
    combine pass, skipping the CV re-read."""
    fit = _METHODS[method]
    inverse = -1.0 if type_measure == "max" else 1.0
    invalid = (validity_mask & cst.PANDORA_MSK_PIXEL_INVALID) != 0

    at_edge = (disp == d_min) | (disp == d_max)
    c1_nan = jnp.isnan(c1)
    neighbors_nan = jnp.isnan(c0) | jnp.isnan(c2)
    ic0, ic1, ic2 = inverse * c0, inverse * c1, inverse * c2
    not_extremum = (ic1 > ic0) | (ic1 > ic2)

    sub, cost = fit(jnp.nan_to_num(c0), c1, jnp.nan_to_num(c2), inverse)

    # selection cascade mirroring the C++ early-returns (refinement.cpp:54-90)
    fit_ok = ~invalid & ~c1_nan & ~at_edge & ~neighbors_nan & ~not_extremum
    stopped = ~invalid & ~c1_nan & (at_edge | ((~at_edge) & (neighbors_nan | not_extremum)))

    new_disp = jnp.where(fit_ok, disp + sub / subpix, disp)
    coeff = jnp.where(invalid | c1_nan, jnp.nan, jnp.where(fit_ok, cost, c1))
    new_mask = jnp.where(
        stopped,
        validity_mask + jnp.uint16(cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION),
        validity_mask,
    ).astype(jnp.uint16)
    return new_disp, new_mask, coeff


def refine_approximate(
    cv_left: jnp.ndarray,
    disp_right: jnp.ndarray,
    validity_mask: jnp.ndarray,
    d_min: float,
    d_max: float,
    subpix: int,
    type_measure: str,
    method: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """loop_approximate_refinement (refinement.cpp:102-181): refine the
    *right* disparity map on the diagonal of the *left* cost volume
    (fast cross-checking mode); the triplet strides both col and disp."""
    fit = _METHODS[method]
    h, w, n_disp = cv_left.shape
    inverse = -1.0 if type_measure == "max" else 1.0
    col = jnp.arange(w)[None, :]

    invalid = (validity_mask & cst.PANDORA_MSK_PIXEL_INVALID) != 0
    safe_disp = jnp.where(invalid, 0.0, disp_right)
    idx = ((-safe_disp - d_min) * subpix).astype(jnp.int32)
    diag = (col + safe_disp).astype(jnp.int32)

    def take(c_off, d_off):
        cc = jnp.clip(diag + c_off, 0, w - 1)
        dd = jnp.clip(idx + d_off, 0, n_disp - 1)
        flat = cv_left.reshape(h, -1)
        return jnp.take_along_axis(flat, cc * n_disp + dd, axis=1)

    c1 = take(0, 0)
    c0 = take(-1, subpix)
    c2 = take(1, -subpix)

    at_edge = (
        (disp_right == d_min) | (disp_right == d_max) | (diag == 0) | (diag == w - 1)
    )
    c1_nan = jnp.isnan(c1)
    neighbors_nan = jnp.isnan(c0) | jnp.isnan(c2)
    ic0, ic1, ic2 = inverse * c0, inverse * c1, inverse * c2
    not_extremum = (ic1 > ic0) | (ic1 > ic2)

    sub, cost = fit(jnp.nan_to_num(c0), c1, jnp.nan_to_num(c2), inverse)

    fit_ok = ~invalid & ~c1_nan & ~at_edge & ~neighbors_nan & ~not_extremum
    stopped = ~invalid & ~c1_nan & (at_edge | ((~at_edge) & (neighbors_nan | not_extremum)))

    new_disp = jnp.where(fit_ok, disp_right + sub / subpix, disp_right)
    coeff = jnp.where(invalid | c1_nan, jnp.nan, jnp.where(fit_ok, cost, c1))
    new_mask = jnp.where(
        stopped,
        validity_mask + jnp.uint16(cst.PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION),
        validity_mask,
    ).astype(jnp.uint16)
    return new_disp, new_mask, coeff
