"""Disparity step: winner-takes-all (reference disparity/disparity.py:349-553).

Also owns the fast-mode right map derivation: in ``cross_checking_fast`` the
right cost volume is reindexed from the left one at WTA time
(state_machine.disparity_run, state_machine.py:434-448).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..datamodel import CostVolume, DisparityMap, Image
from ..ops import cost_volume as cv_ops
from ..ops.wta import approximate_right_disparity, mask_border_disparity, wta
from ..utils.schema import And, Or, validate
from .base import PipelineState, Step


@partial(jax.jit, static_argnames=("type_measure",))
def _wta_jit(cv, disp_vals, validity_mask, invalid_value, type_measure):
    return wta(cv, disp_vals, type_measure, invalid_value, validity_mask)


@Step.register("disparity", "wta")
class WinnerTakesAll(Step):
    _INVALID = -9999

    def check_conf(self, **cfg):
        out = {"invalid_disparity": self._INVALID, **cfg}
        if isinstance(out["invalid_disparity"], str) and out["invalid_disparity"] == "NaN":
            out["invalid_disparity"] = float("nan")
        schema = {
            "disparity_method": "wta",
            "invalid_disparity": Or(int, float),
        }
        return validate(schema, out)

    def to_disp(self, cv: CostVolume, transform=None, crs=None) -> DisparityMap:
        invalid = float(self.cfg["invalid_disparity"])
        disp, vmask, _ = _wta_jit(
            cv.cv, cv.disp_range, cv.validity_mask, jnp.float32(invalid), cv.type_measure
        )
        return DisparityMap(
            disparity_map=disp,
            validity_mask=vmask,
            confidence=cv.confidence,
            indicator_names=cv.indicator_names,
            invalid_disparity=None if np.isnan(invalid) else invalid,
            transform=transform,
            crs=crs,
        )

    def approximate_right_disparity(self, cv: CostVolume, img_right: Image) -> DisparityMap:
        """Right disparity map by diagonal search in the left cost volume
        (Ernst–Hirschmüller; reference disparity/disparity.py:165-298):
        ops.wta.approximate_right_disparity plus the reference's intensity-std
        confidence band and border masking."""
        from ..ops.windows import box_std_same

        invalid = float(self.cfg["invalid_disparity"])
        disp, vmask = _approx_right_jit(
            cv.cv,
            int(cv.disp_range[0]),
            int(cv.disp_range[-1]),
            cv.subpixel,
            cv.type_measure,
            jnp.float32(invalid),
        )
        offset = cv.offset_row_col
        if offset > 0:
            vmask = mask_border_disparity(vmask, offset)
        # confidence = window intensity std of the right image, interior only
        band = img_right.band(cv.band_correl)
        std = box_std_same(band, cv.window_size, cv.window_size)
        h, w = band.shape
        row = jnp.arange(h)[:, None]
        col = jnp.arange(w)[None, :]
        interior = (
            (row >= offset) & (row < h - offset) & (col >= offset) & (col < w - offset)
        )
        std = jnp.where(interior, std, jnp.nan)
        return DisparityMap(
            disparity_map=disp,
            validity_mask=vmask,
            confidence=std[:, :, None].astype(jnp.float32),
            indicator_names=("confidence_from_intensity_std",),
            invalid_disparity=None if np.isnan(invalid) else invalid,
            transform=img_right.transform,
            crs=img_right.crs,
        )

    def run(self, state: PipelineState) -> None:
        cv = state.require_cv()
        state.left_disparity = self.to_disp(
            cv, state.left_img.transform, state.left_img.crs
        )
        # keep WTA selection on the CV for refinement (disparity.py:459)
        state.left_cv.disp_indices = state.left_disparity.disparity_map

        if state.right_disp_map == "accurate":
            rcv = state.right_cv
            state.right_disparity = self.to_disp(
                rcv, state.right_img.transform, state.right_img.crs
            )
            state.right_cv.disp_indices = state.right_disparity.disparity_map
        elif state.right_disp_map == "fast":
            # derive the right CV by reindexing the left one
            # (matching_cost.cpp reverse_cost_volume, state_machine.py:438-448)
            state.dmin_right, state.dmax_right = -state.dmax, -state.dmin
            rcv_data = _reverse_jit(cv.cv, state.dmin)
            vmask_r = jnp.zeros_like(cv.validity_mask)
            disp_vals_r = jnp.asarray(
                cv_ops.disparity_range(state.dmin_right, state.dmax_right, 1), jnp.float32
            )
            state.right_cv = CostVolume(
                cv=rcv_data,
                disp_range=disp_vals_r,
                validity_mask=vmask_r,
                window_size=cv.window_size,
                subpixel=1,
                offset_row_col=cv.offset_row_col,
                measure=cv.measure,
                type_measure=cv.type_measure,
                cmax=cv.cmax,
            )
            state.right_disparity = self.to_disp(
                state.right_cv, state.right_img.transform, state.right_img.crs
            )
            state.right_cv.disp_indices = state.right_disparity.disparity_map


@jax.jit
def _reverse_jit(cv, dmin):
    return cv_ops.reverse_cost_volume(cv, dmin)


@partial(jax.jit, static_argnames=("dmin", "dmax", "subpix", "type_measure"))
def _approx_right_jit(cv, dmin, dmax, subpix, type_measure, invalid_value):
    return approximate_right_disparity(cv, dmin, dmax, subpix, type_measure, invalid_value)
