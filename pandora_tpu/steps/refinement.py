"""Refinement step: vfit / quadratic sub-pixel fits
(reference refinement/refinement.py:77-180 driving refinement.cpp)."""

from __future__ import annotations

from functools import partial

import jax

from ..margins import Margins
from ..ops.refinement import refine, refine_approximate
from ..utils.schema import validate
from .base import PipelineState, Step


@partial(jax.jit, static_argnames=("d_min", "d_max", "subpix", "type_measure", "method"))
def _refine_jit(cv, disp, vmask, d_min, d_max, subpix, type_measure, method):
    return refine(cv, disp, vmask, d_min, d_max, subpix, type_measure, method)


@partial(jax.jit, static_argnames=("d_min", "d_max", "subpix", "type_measure", "method"))
def _refine_approx_jit(cv, disp, vmask, d_min, d_max, subpix, type_measure, method):
    return refine_approximate(cv, disp, vmask, d_min, d_max, subpix, type_measure, method)


class RefinementBase(Step):
    def check_conf(self, **cfg):
        return validate({"refinement_method": self.method}, cfg)

    def margins(self) -> Margins:
        return Margins(1, 1, 1, 1)

    def _apply(self, state: PipelineState, cv, disp_ds, d_min, d_max) -> None:
        disp, vmask, coeff = _refine_jit(
            cv.cv,
            disp_ds.disparity_map,
            disp_ds.validity_mask,
            float(d_min),
            float(d_max),
            cv.subpixel,
            cv.type_measure,
            self.method,
        )
        disp_ds.disparity_map = disp
        disp_ds.validity_mask = vmask
        disp_ds.interpolated_coeff = coeff
        cv.disp_indices = disp

    def run(self, state: PipelineState) -> None:
        self._apply(state, state.left_cv, state.left_disparity, state.dmin, state.dmax)
        if state.right_disp_map == "accurate":
            self._apply(
                state, state.right_cv, state.right_disparity, state.dmin_right, state.dmax_right
            )
        elif state.right_disp_map == "fast":
            # fast mode refines the right map on the left CV diagonal
            # (refinement.cpp:102-181, refinement/refinement.py approximate path)
            # the approximate path receives the LEFT cv's disparity bounds
            # (refinement.py:149-163)
            disp, vmask, coeff = _refine_approx_jit(
                state.left_cv.cv,
                state.right_disparity.disparity_map,
                state.right_disparity.validity_mask,
                float(state.dmin),
                float(state.dmax),
                state.left_cv.subpixel,
                state.left_cv.type_measure,
                self.method,
            )
            state.right_disparity.disparity_map = disp
            state.right_disparity.validity_mask = vmask
            state.right_disparity.interpolated_coeff = coeff


@Step.register("refinement", "vfit")
class VfitRefinement(RefinementBase):
    pass


@Step.register("refinement", "quadratic")
class QuadraticRefinement(RefinementBase):
    pass
