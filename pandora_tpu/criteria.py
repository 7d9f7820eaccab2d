"""Per-pixel criteria / validity-mask computation on the cost volume.

Vectorized JAX re-design of the reference criteria layer
(src/pandora/criteria.py:67-353 and cpp/src/criteria.cpp:27-103): every
per-pixel decision becomes a masked elementwise expression or a column-axis
cumulative scan — no Python loops over disparities or rows.

Internal mask convention (img_tools.add_mask, img_tools.py:287-316):
``msk == 0`` valid, ``msk == 1`` nodata, any other value = invalidated by the
user's input mask.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import constants as cst
from .ops.windows import box_sum_same

_VALID = 0
_NODATA = 1


def binary_dilation_msk(nodata: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """True where a window_size x window_size window contains a nodata pixel
    (scipy binary_dilation with a full square structure, criteria.py:36-63;
    pixels outside the image count as not-nodata)."""
    return box_sum_same(nodata.astype(jnp.float32), window_size, window_size) > 0


@partial(jax.jit, static_argnames=("d_min", "d_max", "offset", "window_size", "n_col_global"))
def validity_mask(
    d_min: int,
    d_max: int,
    offset: int,
    window_size: int,
    shape: jnp.ndarray,  # (row, col) zeros template for shape inference
    left_msk: Optional[jnp.ndarray] = None,
    right_msk: Optional[jnp.ndarray] = None,
    left_disp_min: Optional[jnp.ndarray] = None,
    left_disp_max: Optional[jnp.ndarray] = None,
    col0=None,
    n_col_global: Optional[int] = None,
) -> jnp.ndarray:
    """uint16 validity mask of the cost volume (criteria.validity_mask,
    criteria.py:67-160).

    bits set here: 0 (left nodata dilated), 1 (right range missing),
    2 (right range incomplete), 6 (left input mask), 7 (right input mask),
    12 (variable range partially masked in right).

    ``col0``/``n_col_global``: when the array is a halo-extended TILE of a
    larger scene (parallel tiling), the range bits 1/2 are keyed to GLOBAL
    column coordinates (col0 may be a traced per-shard scalar) so edge
    tiles reproduce the untiled criteria exactly.  Input masks are not
    supported together with global bounds (the tiled runners pass none).
    """
    n_row, n_col = shape.shape
    if col0 is not None:
        assert left_msk is None and right_msk is None
        col = jnp.arange(n_col) + col0
        w_ref = n_col_global  # range bits keyed to the SCENE width
    else:
        col = jnp.arange(n_col)
        w_ref = n_col
    mask = jnp.zeros((n_row, n_col), jnp.uint16)

    # --- fixed-range border bits 1 / 2 (criteria.py:113-150) -------------
    if d_max < 0:
        bit1_col = (col + d_max) < offset
        bit2_col = ((col + d_max) >= offset) & ((col + d_min) < offset)
    elif d_min > 0:
        bit1_col = (col + d_min) > (w_ref - 1 - offset)
        bit2_col = ((col + d_min) <= (w_ref - 1 - offset)) & ((col + d_max) > (w_ref - 1 - offset))
    else:
        bit1_col = jnp.zeros(n_col, bool)
        bit2_col = ((col + d_min) < offset) | ((col + d_max) > (w_ref - 1 - offset))
    mask += jnp.where(bit2_col, cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE, 0).astype(
        jnp.uint16
    )[None, :]
    mask += jnp.where(
        bit1_col, cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING, 0
    ).astype(jnp.uint16)[None, :]

    # --- left mask bits 0 / 6 (allocate_left_mask, criteria.py:182-217) --
    if left_msk is not None:
        dil = binary_dilation_msk(left_msk == _NODATA, window_size)
        mask += dil.astype(jnp.uint16) * cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
        invalid_l = (left_msk != _NODATA) & (left_msk != _VALID)
        mask += invalid_l.astype(jnp.uint16) * cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT

    # --- right mask bits 7 / 1 (allocate_right_mask, criteria.py:219-290) -
    if right_msk is not None:
        dil_r = binary_dilation_msk(right_msk == _NODATA, window_size).astype(jnp.int32)
        invalid_r = ((right_msk != _NODATA) & (right_msk != _VALID)).astype(jnp.int32)

        # For each disparity d in [d_min, d_max]: columns whose shifted
        # position col+d is interior accumulate the right flag at col+d,
        # others accumulate 1.  A pixel whose whole range is flagged gets
        # the bit.  Vectorized as a scan over the integer disparity axis.
        n_int = d_max - d_min + 1

        def step(carry, d):
            b27, ndr = carry
            col_d = col + d
            interior = (col_d >= offset) & (col_d <= n_col - 1 - offset)
            idx = jnp.clip(col_d, 0, n_col - 1)
            b27 = b27 + jnp.where(interior[None, :], invalid_r[:, idx], 1)
            ndr = ndr + jnp.where(interior[None, :], dil_r[:, idx], 1)
            return (b27, ndr), None

        init = (jnp.zeros((n_row, n_col), jnp.int32), jnp.zeros((n_row, n_col), jnp.int32))
        (b_2_7, no_data_right), _ = jax.lax.scan(step, init, jnp.arange(d_min, d_max + 1))
        # pixels already flagged bit 1 are excluded (criteria.py:276-278)
        b_2_7 = jnp.where(bit1_col[None, :], 0, b_2_7)
        no_data_right = jnp.where(bit1_col[None, :], 0, no_data_right)
        mask += (b_2_7 == n_int).astype(jnp.uint16) * cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT
        mask += (no_data_right == n_int).astype(
            jnp.uint16
        ) * cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING

        # --- bit 12: variable range partially masked (criteria.cpp:27-103) -
        if left_disp_min is not None:
            missing = partially_missing_variable_ranges(
                left_disp_min, left_disp_max, (right_msk != _VALID)
            )
            mask = mask | jnp.where(
                missing, cst.PANDORA_MSK_PIXEL_INCOMPLETE_VARIABLE_DISPARITY_RANGE, 0
            ).astype(jnp.uint16)

    return mask


def partially_missing_variable_ranges(
    disp_min: jnp.ndarray, disp_max: jnp.ndarray, right_invalid: jnp.ndarray
) -> jnp.ndarray:
    """True where the pixel's [col+dmin, col+dmax] span does not fit inside a
    single run of valid right pixels on its row (criteria.cpp:27-103).

    The C++ walks runs per row; here run starts/ends come from column-axis
    cummax/cummin scans, and the containment test is two gathers.
    """
    n_row, n_col = right_invalid.shape
    col = jnp.arange(n_col)[None, :]
    valid = ~right_invalid
    prev_invalid = jnp.concatenate(
        [jnp.ones((n_row, 1), bool), right_invalid[:, :-1]], axis=1
    )
    # start col of the valid run containing col (valid positions only)
    start_marker = jnp.where(valid & prev_invalid, col, -1)
    run_start = jax.lax.cummax(start_marker, axis=1)
    # end (exclusive) of the valid run containing col: next invalid position
    end_marker = jnp.where(right_invalid, col, n_col)
    run_end = jax.lax.cummin(end_marker[:, ::-1], axis=1)[:, ::-1]

    col_min = disp_min.astype(jnp.int32) + col  # C-cast truncation
    col_max = disp_max.astype(jnp.int32) + col
    in_bounds = (col_min >= 0) & (col_max < n_col) & (col_min <= col_max)
    cmin_idx = jnp.clip(col_min, 0, n_col - 1)
    valid_at = jnp.take_along_axis(valid, cmin_idx, axis=1)
    end_at = jnp.take_along_axis(run_end, cmin_idx, axis=1)
    found = in_bounds & valid_at & (col_max < end_at) & (
        jnp.take_along_axis(run_start, cmin_idx, axis=1) >= 0
    )
    return ~found


def mask_border(mask: jnp.ndarray, offset: int, bounds=None) -> jnp.ndarray:
    """Overwrite (not OR) the window border with the border bit
    (criteria.mask_border, criteria.py:325-353).

    ``bounds = (row0, col0, n_row_global, n_col_global)``: the array is a
    tile of a larger scene — the ring is keyed to the SCENE borders
    (row0/col0 may be traced per-shard scalars)."""
    if offset <= 0:
        return mask
    n_row, n_col = mask.shape
    if bounds is not None:
        row0, col0, n_row_ref, n_col_ref = bounds
        row = jnp.arange(n_row)[:, None] + row0
        col = jnp.arange(n_col)[None, :] + col0
    else:
        n_row_ref, n_col_ref = n_row, n_col
        row = jnp.arange(n_row)[:, None]
        col = jnp.arange(n_col)[None, :]
    border = (row < offset) | (row >= n_row_ref - offset) | (col < offset) | (col >= n_col_ref - offset)
    return jnp.where(
        border, jnp.uint16(cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER), mask
    )


def global_support_masks(d_min: int, subpix: int, offset: int, bounds,
                         n_rows: int, n_cols: int, n_disp: int):
    """The census.cpp:132-158 validity predicate keyed to GLOBAL scene
    coordinates, split into broadcastable parts: (rows_ok (H,),
    coldisp_ok (W, D)).  ``bounds = (row0, col0, H_scene, W_scene)`` with
    row0/col0 possibly traced per-shard scalars.  The single source of
    truth for both the lax cost volume (mask_cv_global_bounds) and the
    uint8 scan-layout fast path (fused._census_sgm_fast_path)."""
    row0, col0, n_row_g, n_col_g = bounds
    gr = jnp.arange(n_rows) + row0
    gc = (jnp.arange(n_cols) + col0)[:, None]  # (W, 1)
    k = jnp.arange(n_disp)[None, :]  # (1, D)
    d_int = d_min + k // subpix
    i_shift = k % subpix
    right_x = gc + d_int
    valid = (gc >= offset) & (gc < n_col_g - offset)
    valid &= (right_x >= offset) & (right_x < n_col_g - offset)
    valid &= jnp.where(i_shift > 0, right_x < n_col_g - offset - 1, True)
    rows_ok = (gr >= offset) & (gr < n_row_g - offset)
    return rows_ok, valid


def mask_cv_global_bounds(
    cv: jnp.ndarray,
    d_min: int,
    d_max: int,
    subpix: int,
    offset: int,
    bounds,
    invalid_value=jnp.nan,
) -> jnp.ndarray:
    """Invalidate cost-volume entries whose left or right window support
    crosses the TRUE scene bounds (census.cpp:132-158 validity, keyed to
    global coordinates).

    For a halo-extended tile this reproduces exactly the entries the
    untiled program never writes: edge tiles then behave like the untiled
    run at scene borders (path restarts, all-NaN WTA lanes, NaN-ignoring
    filters).  ``bounds = (row0, col0, H, W)`` with row0/col0 possibly
    traced per-shard scalars."""
    h, w, n_disp = cv.shape
    rows_ok, cd_ok = global_support_masks(d_min, subpix, offset, bounds, h, w, n_disp)
    full = rows_ok[:, None, None] & cd_ok[None, :, :]
    return jnp.where(full, cv, jnp.asarray(invalid_value, cv.dtype))


def mask_invalid_variable_disparity_range(cv: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Add bit 1 on pixels whose whole disparity axis is NaN and that are not
    already flagged (criteria.mask_invalid_variable_disparity_range,
    criteria.py:293-322)."""
    all_nan = jnp.all(jnp.isnan(cv), axis=2)
    not_flagged = (mask & cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING) == 0
    return jnp.where(
        all_nan & not_flagged,
        mask + cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING,
        mask,
    ).astype(jnp.uint16)
