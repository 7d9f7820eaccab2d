"""Shared cost-volume machinery: disparity axis, right-image gathers,
validity pattern, mask application and left↔right reversal.

All matching-cost measures share the same structure (reference
matching_cost/matching_cost.py): a subpix-expanded disparity axis, a
per-disparity gather of the (possibly sub-pixel shifted) right image at
column ``col + floor(d)``, a common window-validity pattern, and the same
``cv_masked`` post-pass.  Everything here is pure jittable JAX with static
shapes; the disparity loop is a ``lax.scan`` over a sliding column slice.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def disparity_range(dmin: int, dmax: int, subpix: int) -> np.ndarray:
    """Subpix-expanded disparity axis (matching_cost.py:409-427):
    d_k = dmin + k/subpix, ending exactly at dmax."""
    if subpix == 1:
        return np.arange(dmin, dmax + 1, dtype=np.float64)
    rng = np.arange(dmin, dmax, 1.0 / subpix, dtype=np.float64)
    return np.append(rng, [dmax])


def n_disparities(dmin: int, dmax: int, subpix: int) -> int:
    return (dmax - dmin) * subpix + 1


def pad_for_offset_scan(arr: jnp.ndarray, dmin: int, dmax: int, width: int) -> jnp.ndarray:
    """Pad a (row, cols_i, ...) right-side array so that the slice
    ``padded[:, k : k + width]`` reads columns ``col + dmin + k`` of the
    original array (zeros outside).  Works for any trailing dims."""
    wi = arr.shape[1]
    n_int = dmax - dmin + 1
    needed = n_int - 1 + width
    pad_l = max(0, -dmin)
    start = dmin + pad_l  # >= 0
    pad_r = max(0, needed + start - (pad_l + wi))
    pad_cfg = [(0, 0)] * arr.ndim
    pad_cfg[1] = (pad_l, pad_r)
    out = jnp.pad(arr, pad_cfg)
    return out[:, start:] if start > 0 else out


def scan_offsets(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    padded: Sequence[jnp.ndarray],
    n_int: int,
    width: int,
) -> jnp.ndarray:
    """Apply ``fn(*slices) -> (row, col) plane`` for each integer disparity
    offset; each ``padded`` array was prepared by :func:`pad_for_offset_scan`.
    Returns (n_int, row, col)."""

    def step(_, k):
        slices = [jax.lax.dynamic_slice_in_dim(p, k, width, axis=1) for p in padded]
        return None, fn(*slices)

    _, costs = jax.lax.scan(step, None, jnp.arange(n_int))
    return costs


def interleave_subpix(per_shift: List[jnp.ndarray], dmin: int, dmax: int, subpix: int) -> jnp.ndarray:
    """Merge per-shift (n_int, row, col) stacks into the (row, col, disp)
    cost volume with cv index k = (dd - dmin)*subpix + i."""
    n_int = dmax - dmin + 1
    n_disp = n_disparities(dmin, dmax, subpix)
    stacked = jnp.stack(per_shift, axis=1)  # (n_int, subpix, H, W)
    h, w = stacked.shape[-2:]
    cv = stacked.reshape(n_int * subpix, h, w)[:n_disp]
    return jnp.moveaxis(cv, 0, -1)


def window_validity(
    shape: Tuple[int, int], dmin: int, dmax: int, subpix: int, offset: int
) -> jnp.ndarray:
    """(row, col, disp) bool — True where the reference computes a cost:
    interior left window and interior right window in the (1-col-shorter for
    sub-pixel shifts) right image.  Derived from point_interval
    (matching_cost.py:429-481) + window aggregation; identical for
    census/sad/ssd/zncc."""
    h, w = shape
    n_disp = n_disparities(dmin, dmax, subpix)
    cols = jnp.arange(w)[:, None]
    k = jnp.arange(n_disp)[None, :]
    off = dmin + k // subpix
    i_shift = k % subpix
    wi_minus1 = jnp.where(i_shift > 0, w - 2, w - 1)
    right_x = cols + off
    valid = (cols >= offset) & (cols < w - offset)
    valid &= (right_x >= offset) & (right_x <= wi_minus1 - offset)
    rows_ok = (jnp.arange(h) >= offset) & (jnp.arange(h) < h - offset)
    return rows_ok[:, None, None] & valid[None, :, :]


def masks_dilatation(
    msk: Optional[jnp.ndarray], shape: Tuple[int, int], window_size: int, subpix: int
) -> List[jnp.ndarray]:
    """NaN-convention masks (matching_cost.masks_dilatation,
    matching_cost.py:484-602): 0 = valid, NaN = invalid or (window-dilated)
    nodata.  Returns [mask, half-shifted mask]; the shifted mask (used for
    all fractional shifts) is the 2-column sum so NaN propagates to any
    sub-pixel sample built from an invalid column."""
    from ..criteria import binary_dilation_msk

    if msk is None:
        base = jnp.zeros(shape, jnp.float32)
    else:
        invalid = (msk != 0) & (msk != 1)
        dil = binary_dilation_msk(msk == 1, window_size)
        base = jnp.where(invalid | dil, jnp.nan, 0.0).astype(jnp.float32)
    out = [base]
    if subpix > 1:
        out.append(base[:, :-1] + base[:, 1:])
    return out


def apply_cv_masks(
    cv: jnp.ndarray,
    left_mask: Optional[jnp.ndarray],
    right_masks: Optional[List[jnp.ndarray]],
    disp_vals: jnp.ndarray,
    disp_min_grid: Optional[jnp.ndarray],
    disp_max_grid: Optional[jnp.ndarray],
    dmin: int,
    dmax: int,
    subpix: int,
) -> jnp.ndarray:
    """``cv_masked`` semantics (matching_cost.py:770-872): add NaN-convention
    left/right masks onto every cost (the right one gathered at
    ``col + floor(d)``), then NaN any cost outside the per-pixel disparity
    grids."""
    h, w, n_disp = cv.shape

    if left_mask is not None:
        cv = cv + left_mask[:, :, None]

    if right_masks is not None:
        n_int = dmax - dmin + 1
        # gathered[i][dd] = right_masks[i][:, col + dmin + dd]
        gathered = []
        for m in right_masks:
            mp = pad_for_offset_scan(m[:, :, None], dmin, dmax, w)
            g = scan_offsets(lambda s: s[:, :, 0], [mp], n_int, w)  # (n_int, H, W)
            gathered.append(g)
        k = np.arange(n_disp)
        dd_idx = k // subpix
        i_idx = np.minimum(k % subpix, len(right_masks) - 1)
        sel = jnp.stack([gathered[i][dd] for i, dd in zip(i_idx, dd_idx)], axis=-1)
        cv = cv + sel

    if disp_min_grid is not None:
        d = disp_vals[None, None, :]
        out_of_range = (d < disp_min_grid[:, :, None]) | (d > disp_max_grid[:, :, None])
        cv = jnp.where(out_of_range, jnp.nan, cv)
    return cv


def reverse_cost_volume(cv: jnp.ndarray, dmin: int) -> jnp.ndarray:
    """Right cost volume from the left one: CV_R(r, c, d) = CV_L(r, c+d, -d)
    (matching_cost.cpp:26-57).  Only valid for subpix == 1.

    The disparity axis flips sign: right disparities span [-dmax, -dmin],
    index k_right reads left disparity index D-1-k_right at column
    c - dmin - ... — implemented as a gather along columns per disparity.
    """
    h, w, n_disp = cv.shape
    # right disp d_r = -dmax + k ; left index = n_disp - 1 - k at col c + d_r
    cols = jnp.arange(w)[None, :, None]
    k = jnp.arange(n_disp)[None, None, :]
    d_r = -(dmin + n_disp - 1) + k
    src_col = cols + d_r
    ok = (src_col >= 0) & (src_col < w)
    src_col = jnp.clip(src_col, 0, w - 1)
    flipped = cv[:, :, ::-1]  # left disp index n_disp-1-k at position k
    gathered = jnp.take_along_axis(flipped, jnp.broadcast_to(src_col, (h, w, n_disp)), axis=1)
    return jnp.where(ok, gathered, jnp.nan)


def reverse_disp_range(dmin: int, dmax: int) -> Tuple[int, int]:
    """Right image disparity range from the left one
    (matching_cost.cpp:59-132 reverse_disp_range)."""
    return -dmax, -dmin
