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


def coefficient_map(cv: jnp.ndarray, disp_indices_pos: jnp.ndarray) -> jnp.ndarray:
    """Cost at the selected disparity (disparity.coefficient_map,
    disparity.py:142-163); ``disp_indices_pos`` are integer axis positions.
    One-hot masked reduction — minor-axis gathers are slow on TPU."""
    iota = jnp.arange(cv.shape[2])[None, None, :]
    return jnp.sum(jnp.where(iota == disp_indices_pos[:, :, None], cv, 0.0), axis=2)
