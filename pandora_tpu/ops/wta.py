"""Winner-takes-all disparity selection.

Reference: disparity/disparity.py:397-553 — argmin (or argmax for
similarity measures) over the disparity axis with NaN→±inf guarding,
first-occurrence tie-breaking (numpy argmin semantics == jnp.argmin),
invalid fill for all-NaN pixels and validity-mask merge.  The reference
chunks into 100×100 blocks purely to bound host RAM; on TPU the whole
volume reduction is a single fused pass over HBM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .. import constants as cst


def wta(
    cv: jnp.ndarray,
    disp_vals: jnp.ndarray,
    type_measure: str,
    invalid_value: float,
    validity_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (disparity_map, updated validity_mask, disp_indices).

    ``disp_indices`` is the reference's cv["disp_indices"] (the selected
    disparity *values*, disparity.py:459) consumed by refinement and
    coefficient maps.
    """
    nanmask = jnp.isnan(cv)
    if type_measure == "max":
        guarded = jnp.where(nanmask, -jnp.inf, cv)
        best = jnp.argmax(guarded, axis=2)
    else:
        guarded = jnp.where(nanmask, jnp.inf, cv)
        best = jnp.argmin(guarded, axis=2)
    disp = disp_vals.astype(jnp.float32)[best]

    invalid_mc = jnp.all(nanmask, axis=2)
    disp = jnp.where(invalid_mc, jnp.float32(invalid_value), disp)

    if validity_mask is None:
        validity_mask = jnp.zeros(disp.shape, jnp.uint16)
    # all-NaN pixels not already invalid get the full invalid code
    # (overwrite, not OR — disparity.py:468-474)
    newly = invalid_mc & ((validity_mask & cst.PANDORA_MSK_PIXEL_INVALID) == 0)
    validity_mask = jnp.where(
        newly, jnp.uint16(cst.PANDORA_MSK_PIXEL_INVALID), validity_mask
    )
    return disp, validity_mask, disp


def approximate_right_disparity(
    cv: jnp.ndarray,
    dmin: int,
    dmax: int,
    subpix: int,
    type_measure: str,
    invalid_value: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Right disparity map by diagonal search in the LEFT cost volume
    (Ernst–Hirschmüller; reference disparity/disparity.py:165-298).

    For right pixel (r, c) and each *integer* disparity d (subpix entries
    are skipped, :200-204), the candidate cost is CV(r, c − d, k(d)) — the
    left pixel whose match at disparity d lands on c.  The winner (min, or
    max for similarity measures) in DESCENDING-d order (the reference's
    np.flip tie-breaking) gives right disparity −d.

    Returns (disparity_map, validity_mask):

    * columns where no integer d keeps c − d inside the image: disparity =
      ``invalid_value``, bit RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING;
    * columns where only part of the range fits: bit
      RIGHT_INCOMPLETE_DISPARITY_RANGE;
    * pixels whose full left CV lane is NaN: disparity = ``invalid_value``
      (disparity.py:289-293, no extra bit).
    """
    h, w, _ = cv.shape
    n_int = dmax - dmin + 1
    sgn = -1.0 if type_measure == "max" else 1.0
    guard = jnp.where(jnp.isnan(cv), jnp.inf, sgn * cv)

    planes = []
    for i in range(n_int):  # static loop: n_int planes, shifted by d
        d = dmin + i
        plane = guard[:, :, i * subpix]  # integer-disparity lane
        # out[c] = plane[c - d]: shift along col by +d, inf outside
        # (|d| >= w shifts everything out of the image)
        dd = min(abs(d), w)
        if d > 0:
            plane = jnp.concatenate(
                [jnp.full((h, dd), jnp.inf, plane.dtype), plane[:, : w - dd]], axis=1
            )
        elif d < 0:
            plane = jnp.concatenate(
                [plane[:, dd:], jnp.full((h, dd), jnp.inf, plane.dtype)], axis=1
            )
        planes.append(plane)
    # descending-d order for the reference's flipped tie-breaking
    diag = jnp.stack(planes[::-1], axis=-1)  # (H, W, n_int)
    best = jnp.argmin(diag, axis=2)
    disp = -(jnp.float32(dmax) - best.astype(jnp.float32))  # -d of the winner

    cols = jnp.arange(w)
    d_vals = jnp.arange(dmin, dmax + 1)
    in_range = (cols[:, None] - d_vals[None, :] >= 0) & (
        cols[:, None] - d_vals[None, :] <= w - 1
    )  # (W, n_int)
    n_valid = jnp.sum(in_range, axis=1)  # (W,)
    none_valid = (n_valid == 0)[None, :]  # (1, W) -> broadcast rows
    partial = ((n_valid > 0) & (n_valid < n_int))[None, :]

    vmask = jnp.zeros((h, w), jnp.uint16)
    vmask = jnp.where(
        jnp.broadcast_to(none_valid, (h, w)),
        jnp.uint16(cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING),
        vmask,
    )
    vmask = vmask | jnp.where(
        jnp.broadcast_to(partial, (h, w)),
        jnp.uint16(cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE),
        jnp.uint16(0),
    )

    invalid_mc = jnp.all(jnp.isnan(cv), axis=2)  # left CV lane all-NaN
    disp = jnp.where(
        invalid_mc | jnp.broadcast_to(none_valid, (h, w)),
        jnp.float32(invalid_value),
        disp,
    )
    return disp, vmask


def mask_border_disparity(vmask: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Overwrite the ``offset``-wide border ring with
    LEFT_NODATA_OR_BORDER (reference criteria.mask_border, criteria.py:325-353)."""
    if offset <= 0:
        return vmask
    h, w = vmask.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    border = (row < offset) | (row >= h - offset) | (col < offset) | (col >= w - offset)
    return jnp.where(
        border, jnp.uint16(cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER), vmask
    )


def coefficient_map(cv: jnp.ndarray, disp_indices_pos: jnp.ndarray) -> jnp.ndarray:
    """Cost at the selected disparity (disparity.coefficient_map,
    disparity.py:142-163); ``disp_indices_pos`` are integer axis positions.
    One-hot masked reduction — minor-axis gathers are slow on TPU."""
    iota = jnp.arange(cv.shape[2])[None, None, :]
    return jnp.sum(jnp.where(iota == disp_indices_pos[:, :, None], cv, 0.0), axis=2)
