"""Multiscale step: fixed_zoom_pyramid coarse-to-fine disparity ranges
(reference multiscale/fixed_zoom_pyramid.py + state_machine.run_prepare /
run_multiscale, state_machine.py:521-692)."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as cst
from ..datamodel import Image
from ..ops.pyramid import fill_nodata_sgm, gaussian_pyramid, masks_pyramid, zoom_nearest
from ..utils.schema import And, validate
from .base import PipelineState, Step


@partial(jax.jit, static_argnames=("window_size", "marge"))
def _range_windows(disp, validity, window_size, marge):
    """Windowed nanmin/nanmax of the valid disparities ± marge
    (fixed_zoom_pyramid.disparity_range, :106-184); border rows/cols and
    invalid pixels are handled by the caller."""
    # invalid = mask-invalid OR naturally-NaN disparity: BOTH get the full
    # user range in the reference (fixed_zoom_pyramid.py:134-137 derives
    # invalid_ind from the NaN set of the masked map)
    invalid = ((validity & cst.PANDORA_MSK_PIXEL_INVALID) != 0) | jnp.isnan(disp)
    masked = jnp.where(invalid, jnp.nan, disp)
    lo = jnp.where(jnp.isnan(masked), jnp.inf, masked)
    hi = jnp.where(jnp.isnan(masked), -jnp.inf, masked)
    k = (1,) * 0 + (window_size, window_size)
    pad = [(window_size // 2,) * 2] * 2
    mins = jax.lax.reduce_window(lo, jnp.inf, jax.lax.min, k, (1, 1), pad)
    maxs = jax.lax.reduce_window(hi, -jnp.inf, jax.lax.max, k, (1, 1), pad)
    return mins - marge, maxs + marge, invalid


@Step.register("multiscale", "fixed_zoom_pyramid")
class FixedZoomPyramid(Step):
    _NUM_SCALES = 2
    _SCALE_FACTOR = 2
    _MARGE = 1

    def check_conf(self, **cfg):
        out = {
            "num_scales": self._NUM_SCALES,
            "scale_factor": self._SCALE_FACTOR,
            "marge": self._MARGE,
            **cfg,
        }
        schema = {
            "multiscale_method": "fixed_zoom_pyramid",
            "num_scales": And(int, lambda v: v > 1),
            "scale_factor": And(int, lambda v: v > 1),
            "marge": And(int, lambda v: v >= 0),
        }
        return validate(schema, out)

    def disparity_range(
        self, disp_map, validity, window_size: int, dmin_user: float, dmax_user: float
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Next-scale per-pixel range: window extrema ± marge, full user
        range on invalid pixels and at the window border, ×scale_factor
        nearest-neighbor upsampling."""
        h, w = disp_map.shape
        offset = (window_size - 1) // 2
        mins, maxs, invalid = _range_windows(
            disp_map, validity, window_size, float(self.cfg["marge"])
        )
        mins, maxs, invalid = np.asarray(mins), np.asarray(maxs), np.asarray(invalid)
        lo_fill = float(int(dmin_user))
        hi_fill = float(int(dmax_user))
        out_min = np.full((h, w), lo_fill, np.float32)
        out_max = np.full((h, w), hi_fill, np.float32)
        if offset > 0:
            out_min[offset:-offset, offset:-offset] = mins[offset:-offset, offset:-offset]
            out_max[offset:-offset, offset:-offset] = maxs[offset:-offset, offset:-offset]
        else:
            out_min, out_max = mins, maxs
        # all-NaN windows / inf sentinels → full range
        out_min = np.where(np.isfinite(out_min), out_min, lo_fill)
        out_max = np.where(np.isfinite(out_max), out_max, hi_fill)
        out_min[invalid] = lo_fill
        out_max[invalid] = hi_fill
        sf = self.cfg["scale_factor"]
        if sf != 1:
            out_min = zoom_nearest(out_min, sf)
            out_max = zoom_nearest(out_max, sf)
        return out_min, out_max

    def run(self, state: PipelineState) -> None:
        if state.current_scale == 0:
            return  # last scale: conditional transition not taken
        sf = self.cfg["scale_factor"]
        state.dmin_user *= sf
        state.dmax_user *= sf
        window_size = state.left_cv.window_size if state.left_cv is not None else 5

        def apply(disp_ds, img_next, dmin_u, dmax_u):
            mn, mx = self.disparity_range(
                np.asarray(disp_ds.disparity_map),
                np.asarray(disp_ds.validity_mask),
                window_size,
                dmin_u,
                dmax_u,
            )
            h, w = img_next.shape
            img_next.disp_min = jnp.asarray(mn[:h, :w], jnp.float32)
            img_next.disp_max = jnp.asarray(mx[:h, :w], jnp.float32)

        next_left = state.pyramid[0][0]
        next_right = state.pyramid[0][1]
        apply(state.left_disparity, next_left, state.dmin_user, state.dmax_user)
        state.left_disparity = None
        if state.right_disp_map != "none" and state.right_disparity is not None:
            state.dmin_user_right = -state.dmax_user
            state.dmax_user_right = -state.dmin_user
            apply(state.right_disparity, next_right, state.dmin_user_right, state.dmax_user_right)
            state.right_disparity = None

        state.left_img, state.right_img = state.pyramid.pop(0)
        state.current_scale -= 1


def prepare_pyramid_state(state: PipelineState, num_scales: int, scale_factor: int) -> None:
    """state_machine.run_prepare multiscale branch (:634-657): build the
    coarse-to-fine pyramid, select the coarsest pair, and downscale the user
    disparity range by scale_factor**num_scales."""
    left, right = state.left_img, state.right_img
    if left.disparity_source == "grid":
        raise TypeError("Multiscale processing does not accept input disparity grids.")

    def build(img: Image):
        msk = img.std_msk()
        filled, msk_fill = fill_nodata_sgm(np.asarray(img.im), None if msk is None else np.asarray(msk))
        imgs = gaussian_pyramid(filled, num_scales, scale_factor)
        msks = masks_pyramid(msk_fill, scale_factor, num_scales)
        return imgs, msks

    limgs, lmsks = build(left)
    rimgs, rmsks = build(right)

    dmin_u = float(np.asarray(left.disp_min).min()) / (scale_factor**num_scales)
    dmax_u = float(np.asarray(left.disp_max).max()) / (scale_factor**num_scales)

    import dataclasses

    levels = []
    for k in range(num_scales):
        shape = limgs[k].shape[-2:]
        li = dataclasses.replace(
            left,
            im=jnp.asarray(limgs[k] if limgs[k].ndim == 3 else limgs[k][None]),
            msk=jnp.asarray(lmsks[k], jnp.int16) if left.msk is not None else None,
            disp_min=jnp.full(shape, dmin_u, jnp.float32),
            disp_max=jnp.full(shape, dmax_u, jnp.float32),
        )
        ri = dataclasses.replace(
            right,
            im=jnp.asarray(rimgs[k] if rimgs[k].ndim == 3 else rimgs[k][None]),
            msk=jnp.asarray(rmsks[k], jnp.int16) if right.msk is not None else None,
            disp_min=jnp.full(shape, -dmax_u, jnp.float32),
            disp_max=jnp.full(shape, -dmin_u, jnp.float32),
        )
        levels.append((li, ri))
    levels.reverse()  # coarse first
    state.pyramid = levels
    state.left_img, state.right_img = state.pyramid.pop(0)
    state.current_scale = num_scales - 1
    state.num_scales = num_scales
    state.scale_factor = scale_factor
    state.dmin_user = dmin_u
    state.dmax_user = dmax_u
    state.dmin_user_right = -dmax_u
    state.dmax_user_right = -dmin_u
