"""Matching-cost step: census / sad / ssd / zncc.

Orchestrates the jitted cost-volume ops and applies the reference's
criteria + masking semantics (matching_cost/matching_cost.py,
matching_cost/census.py, sad_ssd.py, zncc.py).  When validation runs in
``cross_checking_accurate`` mode the right cost volume is computed with the
roles mirrored (state_machine.matching_cost_run, state_machine.py:333-364).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import criteria
from ..datamodel import CostVolume, Image, disparity_extrema
from ..margins import Margins, half_window_margins
from ..ops import census as census_ops
from ..ops import cost_volume as cv_ops
from ..ops import local_costs
from ..utils.schema import And, Or, validate
from .base import PipelineState, Step


@partial(
    jax.jit,
    static_argnames=(
        "method",
        "dmin",
        "dmax",
        "subpix",
        "window_size",
        "spline_order",
        "has_masks",
        "has_grids",
    ),
)
def _compute_cv(
    left_im,
    right_im,
    left_msk,
    right_msk,
    disp_min_grid,
    disp_max_grid,
    mccnn_params=None,
    *,
    method: str,
    dmin: int,
    dmax: int,
    subpix: int,
    window_size: int,
    spline_order: int,
    has_masks: bool,
    has_grids: bool,
):
    """Fused: cost volume + cv_masked + validity criteria, one XLA program."""
    if method == "census":
        cv = census_ops.census_cost_volume(left_im, right_im, dmin, dmax, subpix, window_size)
    elif method in ("sad", "ssd"):
        cv = local_costs.sad_ssd_cost_volume(
            left_im, right_im, dmin, dmax, subpix, window_size, method == "ssd", spline_order
        )
    elif method == "zncc":
        cv = local_costs.zncc_cost_volume(left_im, right_im, dmin, dmax, subpix, window_size)
    elif method == "mc_cnn":
        from ..ops import mc_cnn as mc_cnn_ops

        cv = mc_cnn_ops.mc_cnn_cost_volume(mccnn_params, left_im, right_im, dmin, dmax)
    else:
        raise ValueError(method)

    disp_vals = jnp.asarray(cv_ops.disparity_range(dmin, dmax, subpix), jnp.float32)

    # cv_masked (matching_cost.py:770-872)
    if has_masks:
        left_mask = cv_ops.masks_dilatation(left_msk, left_im.shape, window_size, subpix)[0]
        right_masks = cv_ops.masks_dilatation(right_msk, right_im.shape, window_size, subpix)
    else:
        left_mask, right_masks = None, None
    cv = cv_ops.apply_cv_masks(
        cv,
        left_mask,
        right_masks,
        disp_vals,
        disp_min_grid if has_grids else None,
        disp_max_grid if has_grids else None,
        dmin,
        dmax,
        subpix,
    )

    # criteria validity mask (criteria.validity_mask, criteria.py:67-160)
    offset = (window_size - 1) // 2
    vmask = criteria.validity_mask(
        dmin,
        dmax,
        offset,
        window_size,
        jnp.zeros(left_im.shape, jnp.uint8),
        left_msk,
        right_msk,
        disp_min_grid if (has_grids and right_msk is not None) else None,
        disp_max_grid if (has_grids and right_msk is not None) else None,
    )
    vmask = criteria.mask_invalid_variable_disparity_range(cv, vmask)
    vmask = criteria.mask_border(vmask, offset)
    return cv, vmask, disp_vals


class MatchingCostBase(Step):
    """Shared config/margins for all local matching costs."""

    _DEFAULTS = {"window_size": 5, "subpix": 1, "band": None, "spline_order": 1, "step": 1}
    _WINDOWS: Any = And(int, lambda w: w > 0 and w % 2 == 1)

    def check_conf(self, **cfg):
        out = {**self._DEFAULTS, **cfg}
        schema = {
            "matching_cost_method": str,
            "window_size": self._WINDOWS,
            "subpix": And(int, lambda s: s in (1, 2, 4)),
            "band": Or(str, lambda b: b is None),
            "spline_order": And(int, lambda s: 1 <= s <= 5),
            "step": 1,  # step != 1 is reserved for Pandora2D (matching_cost.py:176-178)
        }
        return validate(schema, out)

    def margins(self) -> Margins:
        return half_window_margins(self.cfg["window_size"])

    # -- runtime ------------------------------------------------------------

    def _params(self):
        return None  # mc_cnn feature-net weights; None for local costs

    @property
    def _type_measure(self) -> str:
        return "min"

    def _cmax(self, left: np.ndarray, right: np.ndarray) -> float:
        raise NotImplementedError

    def compute(
        self,
        left_img: Image,
        right_img: Image,
        dmin: int,
        dmax: int,
        cmax: Optional[float] = None,
    ) -> CostVolume:
        band = self.cfg["band"]
        left_im = left_img.band(band)
        right_im = right_img.band(band)
        has_masks = left_img.msk is not None or right_img.msk is not None
        zero_msk = jnp.zeros(left_im.shape, jnp.int16)
        # masks are read through std_msk(): custom valid_pixels /
        # no_data_mask conventions translate to the standard 0/1/2 here
        left_msk = left_img.std_msk()
        right_msk = right_img.std_msk()
        # the reference builds (2,row,col) grids even for [min, max] pairs
        # (img_tools.add_disparity) and always applies the per-pixel range
        # mask — a no-op for constant grids, real masking for variable ones
        has_grids = left_img.disp_min is not None
        cv, vmask, disp_vals = _compute_cv(
            left_im,
            right_im,
            left_msk if left_msk is not None else (zero_msk if has_masks else None),
            right_msk if right_msk is not None else (zero_msk if has_masks else None),
            left_img.disp_min,
            left_img.disp_max,
            self._params(),
            method=self.method,
            dmin=dmin,
            dmax=dmax,
            subpix=self.cfg["subpix"],
            window_size=self.cfg["window_size"],
            spline_order=self.cfg["spline_order"],
            has_masks=has_masks,
            has_grids=has_grids,
        )
        return CostVolume(
            cv=cv,
            disp_range=disp_vals,
            validity_mask=vmask,
            window_size=self.cfg["window_size"],
            subpixel=self.cfg["subpix"],
            offset_row_col=(self.cfg["window_size"] - 1) // 2,
            measure=self.method,
            type_measure=self._type_measure,
            cmax=self._cmax(left_im, right_im) if cmax is None else cmax,
            band_correl=band,
        )

    def run(self, state: PipelineState) -> None:
        if state.scale_factor != 1:
            # disparity ranges are rescaled to the current pyramid level at
            # every matching-cost step (state_machine.matching_cost_prepare,
            # :304-315) — a no-op for single-scale runs
            sf = float(state.scale_factor)
            state.left_img.disp_min = state.left_img.disp_min * sf
            state.left_img.disp_max = state.left_img.disp_max * sf
            if state.right_img.disp_min is not None:
                state.right_img.disp_min = state.right_img.disp_min * sf
                state.right_img.disp_max = state.right_img.disp_max * sf
        if not state.extrema_preset:
            state.dmin, state.dmax = disparity_extrema(state.left_img)
        state.left_cv = self.compute(
            state.left_img, state.right_img, state.dmin, state.dmax, state.cmax_left
        )
        if state.right_disp_map == "accurate":
            if state.right_img.disp_min is None:
                raise ValueError("accurate cross-checking requires a right disparity range")
            if not state.extrema_preset:
                state.dmin_right, state.dmax_right = disparity_extrema(state.right_img)
            state.right_cv = self.compute(
                state.right_img,
                state.left_img,
                state.dmin_right,
                state.dmax_right,
                state.cmax_right,
            )


@Step.register("matching_cost", "census")
class CensusMatchingCost(MatchingCostBase):
    _WINDOWS = And(int, lambda w: w in (3, 5, 7, 9, 11, 13))

    def _cmax(self, left, right):
        return census_ops.census_cmax(self.cfg["window_size"])


@Step.register("matching_cost", "sad")
class SadMatchingCost(MatchingCostBase):
    def _cmax(self, left, right):
        return local_costs.sad_ssd_cmax(
            np.asarray(left), np.asarray(right), self.cfg["window_size"], False
        )


@Step.register("matching_cost", "ssd")
class SsdMatchingCost(MatchingCostBase):
    def _cmax(self, left, right):
        return local_costs.sad_ssd_cmax(
            np.asarray(left), np.asarray(right), self.cfg["window_size"], True
        )


@Step.register("matching_cost", "zncc")
class ZnccMatchingCost(MatchingCostBase):
    @property
    def _type_measure(self):
        return "max"

    def _cmax(self, left, right):
        return 1.0


@Step.register("matching_cost", "mc_cnn")
class McCnnMatchingCost(MatchingCostBase):
    """Learned MC-CNN fast cost (capability of pandora_plugin_mccnn,
    plugin_mccnn.rst:42-58: fixed window_size=11, subpix=1)."""

    _DEFAULTS = {
        "window_size": 11,
        "subpix": 1,
        "band": None,
        "spline_order": 1,
        "step": 1,
        "model_path": None,
    }

    def check_conf(self, **cfg):
        out = {**self._DEFAULTS, **cfg}
        schema = {
            "matching_cost_method": "mc_cnn",
            "window_size": 11,
            "subpix": 1,
            "band": Or(str, lambda b: b is None),
            "spline_order": And(int, lambda s: 1 <= s <= 5),
            "step": 1,
            "model_path": Or(str, lambda v: v is None),
        }
        return validate(schema, out)

    def _params(self):
        import os

        from ..ops import mc_cnn as mc_cnn_ops

        if getattr(self, "_cached_params", None) is None:
            path = self.cfg["model_path"]
            if not path:
                # bundled checkpoint trained in-framework on TPU
                # (scripts/train_mc_cnn.py) — the counterpart of the
                # plugin's pretrained Middlebury weights
                bundled = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "..", "data", "mc_cnn_fast.npz"
                )
                path = bundled if os.path.exists(bundled) else None
            if path:
                self._cached_params = mc_cnn_ops.load_params(path)
            else:
                import logging

                logging.warning(
                    "mc_cnn: no model_path and no bundled checkpoint - using "
                    "seeded random weights (untrained); run "
                    "scripts/train_mc_cnn.py or pass an .npz checkpoint"
                )
                self._cached_params = mc_cnn_ops.init_params()
        return self._cached_params

    def _cmax(self, left, right):
        return 1.0  # |cosine similarity| <= 1
