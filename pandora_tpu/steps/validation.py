"""Validation step: cross_checking_accurate / cross_checking_fast with
optional occlusion/mismatch interpolation (reference validation/ and
state_machine.validation_run, state_machine.py:492-519)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import criteria
from ..ops.interpolation import (
    interpolate_mismatch_mc_cnn,
    interpolate_mismatch_sgm,
    interpolate_occlusion_mc_cnn,
    interpolate_occlusion_sgm,
)
from ..ops.validation import cross_checking
from ..utils.schema import And, Or, validate
from .base import PipelineState, Step


@partial(jax.jit, static_argnames=("d_min", "d_max", "threshold"))
def _cross_check_jit(dl, dr, vl, d_min, d_max, threshold):
    return cross_checking(dl, dr, vl, d_min, d_max, threshold)


_INTERP = {
    "sgm": (interpolate_mismatch_sgm, interpolate_occlusion_sgm),  # mismatch first
    "mc-cnn": (interpolate_occlusion_mc_cnn, interpolate_mismatch_mc_cnn),  # occlusion first
}


@jax.jit
def _interp_sgm_jit(disp, vmask):
    d, v = interpolate_mismatch_sgm(disp, vmask)
    return interpolate_occlusion_sgm(d, v)


@jax.jit
def _interp_mccnn_jit(disp, vmask):
    d, v = interpolate_occlusion_mc_cnn(disp, vmask)
    return interpolate_mismatch_mc_cnn(d, v)


class CrossCheckingBase(Step):
    def check_conf(self, **cfg):
        out = {"cross_checking_threshold": 1.0, **cfg}
        schema = {
            "validation_method": self.method,
            "cross_checking_threshold": Or(int, float),
            "interpolated_disparity": And(str, lambda v: v in ("sgm", "mc-cnn")),
        }
        optional = dict(schema)
        if "interpolated_disparity" not in out:
            optional.pop("interpolated_disparity")
        return validate(optional, out)

    def _check_one(self, disp_ds, other_ds, d_min, d_max, offset) -> None:
        vmask, conf = _cross_check_jit(
            disp_ds.disparity_map,
            other_ds.disparity_map,
            disp_ds.validity_mask,
            d_min,
            d_max,
            float(self.cfg["cross_checking_threshold"]),
        )
        if offset > 0:
            vmask = criteria.mask_border(vmask, offset)
        disp_ds.validity_mask = vmask
        band = conf[:, :, None]
        name = "confidence_from_left_right_consistency"
        if disp_ds.confidence is None:
            disp_ds.confidence = band
            disp_ds.indicator_names = (name,)
        else:
            disp_ds.confidence = jnp.concatenate([disp_ds.confidence, band], axis=2)
            disp_ds.indicator_names = (*disp_ds.indicator_names, name)

    def run(self, state: PipelineState) -> None:
        if state.right_disparity is None:
            raise RuntimeError(
                "validation requires a right disparity map "
                "(cross_checking_accurate/fast modes set it up at matching-cost/WTA time)"
            )
        offset = state.left_cv.offset_row_col if state.left_cv is not None else 0
        self._check_one(
            state.left_disparity, state.right_disparity, state.dmin, state.dmax, offset
        )
        self._check_one(
            state.right_disparity, state.left_disparity, state.dmin_right, state.dmax_right, offset
        )
        if "interpolated_disparity" in self.cfg:
            fn = _interp_sgm_jit if self.cfg["interpolated_disparity"] == "sgm" else _interp_mccnn_jit
            for ds in (state.left_disparity, state.right_disparity):
                d, v = fn(ds.disparity_map, ds.validity_mask)
                ds.disparity_map = d
                ds.validity_mask = v
        if state.right_disp_map == "fast":
            # fast mode: wipe derived right products after the check
            # (state_machine.py:514-519)
            state.right_disparity = None
            state.right_cv = None


@Step.register("validation", "cross_checking_accurate")
class CrossCheckingAccurate(CrossCheckingBase):
    pass


@Step.register("validation", "cross_checking_fast")
class CrossCheckingFast(CrossCheckingBase):
    pass
