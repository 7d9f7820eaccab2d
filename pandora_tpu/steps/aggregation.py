"""Aggregation step: cross-based cost aggregation (cbca).

Reference: aggregation/cbca.py:90-295 + aggregation/cpp/src/aggregation.cpp.
Cross supports are computed on 3×3-median-filtered, mask-NaNed images
(NaN→inf for the comparisons); the cost volume interior (offset_row_col
cropped) is aggregated per disparity with the subpix-matched right cross,
and cmax grows by the maximal support area (2·distance−1)².
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..datamodel import CostVolume, Image
from ..margins import NULL_MARGINS, Margins
from ..ops import cbca as cbca_ops
from ..ops.filters import nanmedian_window
from ..ops.shift import shift_subpix
from ..utils.schema import And, validate
from .base import PipelineState, Step


@partial(jax.jit, static_argnames=("subpix", "len_arms", "intensity", "offset"))
def _cbca_apply(
    cv: jnp.ndarray,
    disp_vals: jnp.ndarray,
    left_im: jnp.ndarray,
    right_im: jnp.ndarray,
    left_msk: Optional[jnp.ndarray],
    right_msk: Optional[jnp.ndarray],
    valid_left: int,
    valid_right: int,
    subpix: int,
    len_arms: int,
    intensity: float,
    offset: int,
):
    """Full CBCA pass: cross supports + per-disparity aggregation."""

    def masked_median_inf(im, invalid):
        """mask → NaN, 3×3 median on valid pixels, NaN → inf
        (cbca.py computes_cross_supports).

        NOTE: jnp.nan_to_num(..., nan=inf) would CLAMP the substituted inf
        to float32 max (a finite value), silently giving masked pixels
        minimum 3×3 cross arms — use an explicit where so cross_support's
        isfinite test keeps them at zero arms."""
        m = jnp.where(invalid, jnp.nan, im) if invalid is not None else im
        med = jnp.where(jnp.isnan(m), jnp.nan, nanmedian_window(m, 3))
        return jnp.where(jnp.isnan(med), jnp.inf, med)

    def crop(a):
        return a[offset : a.shape[0] - offset, offset : a.shape[1] - offset] if offset else a

    left_invalid = (left_msk != valid_left) if left_msk is not None else None
    cross_left = cbca_ops.cross_support(
        crop(masked_median_inf(left_im, left_invalid)), len_arms, intensity
    )

    right_shifts = shift_subpix(right_im, subpix)
    crosses: List[jnp.ndarray] = []
    for i, img in enumerate(right_shifts):
        if right_msk is None:
            invalid = None
        elif i == 0:
            invalid = right_msk != valid_right
        else:
            # a linearly shifted pixel is invalid if either source column is
            # (cbca.py: 2-column sliding sum of the NaN mask)
            inv = right_msk != valid_right
            invalid = inv[:, :-1] | inv[:, 1:]
        crosses.append(
            cbca_ops.cross_support(crop(masked_median_inf(img, invalid)), len_arms, intensity)
        )

    w_crop = left_im.shape[1] - 2 * offset
    cross_right, widths = cbca_ops.stack_right_crosses(crosses, w_crop)

    inner = crop(cv)
    agg = cbca_ops.cbca_volume(
        inner, cross_left, cross_right, widths, disp_vals, subpix, len_arms
    )
    if offset:
        h, w, _ = cv.shape
        cv = cv.at[offset : h - offset, offset : w - offset].set(agg)
    else:
        cv = agg
    return cv


@Step.register("aggregation", "cbca")
class CbcaAggregation(Step):
    """Zhang-2009 cross-based cost aggregation."""

    def check_conf(self, **cfg):
        out = {"cbca_intensity": 30.0, "cbca_distance": 5, **cfg}
        schema = {
            "aggregation_method": "cbca",
            "cbca_intensity": And(float, lambda v: v > 0),
            "cbca_distance": And(int, lambda v: v > 0),
        }
        return validate(schema, out)

    def margins(self) -> Margins:
        return NULL_MARGINS  # reference AbstractAggregation.margins

    def _apply(self, cv: CostVolume, img_left: Image, img_right: Image) -> None:
        band = cv.band_correl
        cv.cv = _cbca_apply(
            cv.cv,
            cv.disp_range,
            img_left.band(band),
            img_right.band(band),
            img_left.msk,
            img_right.msk,
            int(img_left.valid_pixels),
            int(img_right.valid_pixels),
            subpix=cv.subpixel,
            len_arms=self.cfg["cbca_distance"],
            intensity=float(self.cfg["cbca_intensity"]),
            offset=cv.offset_row_col,
        )
        cv.cmax = cv.cmax * (2 * self.cfg["cbca_distance"] - 1) ** 2

    def run(self, state: PipelineState) -> None:
        self._apply(state.left_cv, state.left_img, state.right_img)
        if state.right_disp_map == "accurate":
            self._apply(state.right_cv, state.right_img, state.left_img)
