"""Left-right cross-checking consistency validation.

Vectorized re-design of the reference per-row loop
(validation/validation.py:225-371): one gather for the LR distance, one
disparity-axis scan for the mismatch-vs-occlusion discrimination.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import constants as cst


def cross_checking(
    disp_left: jnp.ndarray,
    disp_right: jnp.ndarray,
    validity_left: jnp.ndarray,
    d_min: int,
    d_max: int,
    threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Update the left validity mask with occlusion (bit 8) / mismatch
    (bit 9) and return the |disp_R + disp_L| consistency measure.

    Semantics mirror validation.py:289-359: only currently-valid pixels are
    checked; the right position is col + rint(disp_L); NaN disparities
    compare as +inf; pixels failing |dR + dL| <= threshold are mismatches if
    ∃ d ∈ [d_min, d_max]: rint(disp_R(col + d)) == −d, else occlusions.
    """
    h, w = disp_left.shape
    col = jnp.broadcast_to(jnp.arange(w)[None, :], (h, w))
    valid = (validity_left & cst.PANDORA_MSK_PIXEL_INVALID) == 0

    col_right_f = col.astype(jnp.float32) + disp_left
    col_right = jnp.rint(jnp.where(jnp.isnan(col_right_f), 0.0, col_right_f)).astype(jnp.int32)
    inside = (col_right >= 0) & (col_right < w) & ~jnp.isnan(col_right_f)
    checked = valid & inside

    d_r = jnp.take_along_axis(disp_right, jnp.clip(col_right, 0, w - 1), axis=1)
    d_r = jnp.where(jnp.isnan(d_r), jnp.inf, d_r)
    d_l = jnp.where(jnp.isnan(disp_left), jnp.inf, disp_left)
    distance = jnp.abs(d_r + d_l)

    conf = jnp.where(checked, distance, jnp.nan)
    bad = checked & (distance > threshold)

    # mismatch test: ∃ d: rint(disp_R(col + d)) == −d (validation.py:330-352)
    dr_rint = jnp.rint(jnp.where(jnp.isnan(disp_right), jnp.inf, disp_right))

    def step(acc, d):
        idx = col + d
        ok = (idx >= 0) & (idx < w)
        val = jnp.take_along_axis(dr_rint, jnp.clip(idx, 0, w - 1), axis=1)
        return acc | (ok & (val == -d.astype(jnp.float32))), None

    acc0 = jnp.zeros((h, w), bool)
    mismatch_any, _ = jax.lax.scan(step, acc0, jnp.arange(d_min, d_max + 1))

    add = jnp.where(
        bad & mismatch_any,
        jnp.uint16(cst.PANDORA_MSK_PIXEL_MISMATCH),
        jnp.where(bad, jnp.uint16(cst.PANDORA_MSK_PIXEL_OCCLUSION), jnp.uint16(0)),
    )
    return (validity_left + add).astype(jnp.uint16), conf
