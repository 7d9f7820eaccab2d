"""Occlusion / mismatch interpolation as directional propagation scans.

Reference: validation/cpp/src/interpolated_disparity.cpp.  The C++ walks,
per invalid pixel, along 8 (SGM, Hirschmüller-2008 §interpolation) or 16
(MC-CNN, Žbontar) directions to the first valid pixel — an O(H·W·path)
pointer chase.  Here each direction's "first valid value" field is computed
for ALL pixels at once with a single scan along the direction's primary
axis (the recursion F(p) = valid(p+r) ? disp(p+r) : F(p+r) is a prefix
computation), then the fills are branchless selects.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import constants as cst

# 8 unit directions in the C++ scan order (interpolated_disparity.cpp:37-46)
EIGHT_DIRS = ((0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1))


def _first_valid_one(disp: jnp.ndarray, ok: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """First valid disparity strictly along direction (dr, dc) from each
    pixel (NaN when the border is reached first).

    Recursion: F(p) = ok(p+r) ? disp(p+r) : F(p+r), F(outside) = NaN —
    a prefix scan along the direction's primary axis, with the helper
    A(line) = where(ok, disp, F) carried between lines.
    """
    axis = 0 if dr != 0 else 1
    step_sign = dr if axis == 0 else dc
    sec = dc if axis == 0 else 0  # secondary (in-line) shift per step

    d = jnp.moveaxis(disp, axis, 0)  # (lines, m)
    o = jnp.moveaxis(ok, axis, 0)
    if step_sign > 0:  # dependency on later lines → process them first
        d, o = d[::-1], o[::-1]

    def shift_line(a):
        # F_line[c] = A_prev[c + sec]
        if sec == 0:
            return a
        if sec > 0:
            return jnp.concatenate([a[1:], jnp.full_like(a[:1], jnp.nan)])
        return jnp.concatenate([jnp.full_like(a[:1], jnp.nan), a[:-1]])

    def step(a_prev, x):
        f = shift_line(a_prev)
        a = jnp.where(x["o"], x["d"], f)
        return a, f

    init = jnp.full(d.shape[1:], jnp.nan)
    _, ys = jax.lax.scan(step, init, {"d": d, "o": o})
    if step_sign > 0:
        ys = ys[::-1]
    return jnp.moveaxis(ys, 0, axis)


def first_valid_8(disp: jnp.ndarray, validity: jnp.ndarray) -> jnp.ndarray:
    """(8, H, W): first valid disparity along each of the 8 directions
    (find_valid_neighbors, interpolated_disparity.cpp:27-73)."""
    ok = (validity & cst.PANDORA_MSK_PIXEL_INVALID) == 0
    return jnp.stack([_first_valid_one(disp, ok, dr, dc) for dr, dc in EIGHT_DIRS])


def _nan_median(vals: jnp.ndarray) -> jnp.ndarray:
    """Median over axis 0 ignoring NaN (compute_median,
    interpolated_disparity.cpp:143-167); NaN if all NaN."""
    k = vals.shape[0]
    s = jnp.sort(vals, axis=0)
    n = jnp.sum(~jnp.isnan(vals), axis=0)
    lo = jnp.clip((n - 1) // 2, 0, k - 1)
    hi = jnp.clip(n // 2, 0, k - 1)
    med = 0.5 * (
        jnp.take_along_axis(s, lo[None], axis=0)[0] + jnp.take_along_axis(s, hi[None], axis=0)[0]
    )
    return jnp.where(n == 0, jnp.nan, med)


def _second_min_abs(vals: jnp.ndarray) -> jnp.ndarray:
    """Value with the second-smallest |value| (get_second_min_val_abs,
    interpolated_disparity.cpp:75-99); +inf when fewer than 2 candidates."""
    k = vals.shape[0]
    absv = jnp.where(jnp.isnan(vals), jnp.inf, jnp.abs(vals))
    order = jnp.argsort(absv, axis=0, stable=True)
    second = jnp.take_along_axis(vals, order[1:2], axis=0)[0]
    n = jnp.sum(~jnp.isnan(vals), axis=0)
    return jnp.where(n >= 2, second, jnp.inf)


def interpolate_occlusion_sgm(
    disp: jnp.ndarray, validity: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SGM occlusion fill: second-smallest-|d| of the 8 directional first
    valid values (interpolated_disparity.cpp:101-140)."""
    occ = (validity & cst.PANDORA_MSK_PIXEL_OCCLUSION) != 0
    neigh = first_valid_8(disp, validity)
    fill = _second_min_abs(neigh)
    new_disp = jnp.where(occ, fill, disp)
    new_valid = jnp.where(
        occ,
        validity
        + jnp.uint16(cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION)
        - jnp.uint16(cst.PANDORA_MSK_PIXEL_OCCLUSION),
        validity,
    ).astype(jnp.uint16)
    return new_disp, new_valid


def interpolate_mismatch_sgm(
    disp: jnp.ndarray, validity: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SGM mismatch fill: median of the 8 directional first valid values;
    mismatches touching an occlusion become occlusions
    (interpolated_disparity.cpp:169-233)."""
    mis = (validity & cst.PANDORA_MSK_PIXEL_MISMATCH) != 0
    occ = (validity & cst.PANDORA_MSK_PIXEL_OCCLUSION) != 0
    # 3x3 neighborhood contains an occluded pixel?
    p = jnp.pad(occ, 1)
    h, w = disp.shape
    near_occ = jnp.zeros_like(occ)
    for dr in range(3):
        for dc in range(3):
            near_occ = near_occ | p[dr : dr + h, dc : dc + w]
    to_occ = mis & near_occ
    to_fill = mis & ~near_occ

    neigh = first_valid_8(disp, validity)
    fill = _nan_median(neigh)
    new_disp = jnp.where(to_fill, fill, disp)
    new_valid = validity
    new_valid = jnp.where(
        to_occ,
        new_valid
        - jnp.uint16(cst.PANDORA_MSK_PIXEL_MISMATCH)
        + jnp.uint16(cst.PANDORA_MSK_PIXEL_OCCLUSION),
        new_valid,
    )
    new_valid = jnp.where(
        to_fill,
        new_valid
        + jnp.uint16(cst.PANDORA_MSK_PIXEL_FILLED_MISMATCH)
        - jnp.uint16(cst.PANDORA_MSK_PIXEL_MISMATCH),
        new_valid,
    ).astype(jnp.uint16)
    return new_disp, new_valid


def interpolate_occlusion_mc_cnn(
    disp: jnp.ndarray, validity: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MC-CNN occlusion fill: nearest valid pixel to the left on the row,
    else nearest to the right (interpolated_disparity.cpp:236-300)."""
    ok = (validity & cst.PANDORA_MSK_PIXEL_INVALID) == 0
    occ = (validity & cst.PANDORA_MSK_PIXEL_OCCLUSION) != 0
    h, w = disp.shape
    col = jnp.broadcast_to(jnp.arange(w)[None, :], (h, w))
    # nearest valid at-or-left: cummax of col index where valid
    left_idx = jax.lax.cummax(jnp.where(ok, col, -1), axis=1)
    # nearest valid at-or-right: cummax over the flipped row, mapped back
    rev_ok = ok[:, ::-1]
    ridx_rev = jax.lax.cummax(jnp.where(rev_ok, col, -1), axis=1)
    right_idx = jnp.where(ridx_rev >= 0, w - 1 - ridx_rev, -1)[:, ::-1]
    has_left = left_idx >= 0
    has_right = right_idx >= 0
    pick = jnp.where(has_left, left_idx, jnp.where(has_right, right_idx, col))
    filled = jnp.take_along_axis(disp, pick, axis=1)
    found = has_left | has_right
    new_disp = jnp.where(occ & found, filled, disp)
    new_valid = jnp.where(
        occ & found,
        validity
        - jnp.uint16(cst.PANDORA_MSK_PIXEL_OCCLUSION)
        + jnp.uint16(cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION),
        validity,
    ).astype(jnp.uint16)
    return new_disp, new_valid


# 16 MC-CNN directions as (col_step, row_step) pairs exactly as *used* by the
# C++ (interpolated_disparity.cpp:316-333 applies dirs[2k] to col and
# dirs[2k+1] to row)
MCCNN_DIRS = (
    (0.0, 1.0), (-0.5, 1.0), (-1.0, 1.0), (-1.0, 0.5), (-1.0, 0.0), (-1.0, -0.5),
    (-1.0, -1.0), (-0.5, -1.0), (0.0, -1.0), (0.5, -1.0), (1.0, -1.0), (1.0, -0.5),
    (1.0, 0.0), (1.0, 0.5), (1.0, 1.0), (0.5, 1.0),
)


def _first_valid_halfstep(disp, ok, c_step, r_step):
    """First valid along a (possibly half-step) direction, starting at i=0
    (the pixel itself, matching the MC-CNN C++ loop); positions are
    (row + int(r_step·i), col + int(c_step·i)).

    Implemented as a scan over i with a growing shifted gather on a padded
    plane; path length is bounded by max(H, W) like the C++.
    """
    h, w = disp.shape
    n = max(h, w)
    # pad so any (row + dr_i, col + dc_i) lands inside
    pr0 = pr1 = n + 1
    pc0 = pc1 = n + 1
    pd = jnp.pad(disp, ((pr0, pr1), (pc0, pc1)), constant_values=jnp.nan)
    po = jnp.pad(ok, ((pr0, pr1), (pc0, pc1)), constant_values=False)
    inb = jnp.pad(jnp.ones_like(ok), ((pr0, pr1), (pc0, pc1)), constant_values=False)

    def step(carry, i):
        found_val, done = carry
        dr = (r_step * i).astype(jnp.int32)
        dc = (c_step * i).astype(jnp.int32)
        d_i = jax.lax.dynamic_slice(pd, (pr0 + dr, pc0 + dc), (h, w))
        o_i = jax.lax.dynamic_slice(po, (pr0 + dr, pc0 + dc), (h, w))
        in_i = jax.lax.dynamic_slice(inb, (pr0 + dr, pc0 + dc), (h, w))
        # border reached before a valid pixel -> NaN result (C++ break)
        hit_border = ~done & ~in_i
        hit_valid = ~done & in_i & o_i
        found_val = jnp.where(hit_valid, d_i, found_val)
        found_val = jnp.where(hit_border, jnp.nan, found_val)
        done = done | hit_border | hit_valid
        return (found_val, done), None

    # C++ inits the slot to 0.0 and may never overwrite it within max_path
    init = (jnp.zeros((h, w)), jnp.zeros((h, w), bool))
    (val, done), _ = jax.lax.scan(
        step, init, jnp.arange(n, dtype=jnp.float32)
    )
    return val


def interpolate_mismatch_mc_cnn(
    disp: jnp.ndarray, validity: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MC-CNN mismatch fill: median of the 16 directional first valid values
    (interpolated_disparity.cpp:303-394)."""
    ok = (validity & cst.PANDORA_MSK_PIXEL_INVALID) == 0
    mis = (validity & cst.PANDORA_MSK_PIXEL_MISMATCH) != 0
    vals = jnp.stack(
        [_first_valid_halfstep(disp, ok, jnp.float32(c), jnp.float32(r)) for c, r in MCCNN_DIRS]
    )
    fill = _nan_median(vals)
    new_disp = jnp.where(mis, fill, disp)
    new_valid = jnp.where(
        mis,
        validity
        + jnp.uint16(cst.PANDORA_MSK_PIXEL_FILLED_MISMATCH)
        - jnp.uint16(cst.PANDORA_MSK_PIXEL_MISMATCH),
        validity,
    ).astype(jnp.uint16)
    return new_disp, new_valid
