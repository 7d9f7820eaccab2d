"""Filter step: median / bilateral disparity filters
(reference filter/median.py, filter/bilateral.py).  Filters apply to the
left map and, when a validation step computes one, the right map
(state_machine.filter_run, state_machine.py:450-473)."""

from __future__ import annotations

from functools import partial

import jax

from .. import constants as cst
from ..margins import Margins
from ..ops.filters import bilateral_filter_disparity, median_filter_disparity
from ..utils.schema import And, validate
from .base import PipelineState, Step


@partial(jax.jit, static_argnames=("size",))
def _median_jit(disp, vmask, size):
    return median_filter_disparity(disp, vmask, cst.PANDORA_MSK_PIXEL_INVALID, size)


@partial(jax.jit, static_argnames=("sigma_color", "sigma_space"))
def _bilateral_jit(disp, vmask, sigma_color, sigma_space):
    return bilateral_filter_disparity(
        disp, vmask, cst.PANDORA_MSK_PIXEL_INVALID, sigma_color, sigma_space
    )


class FilterBase(Step):
    cumulative_margins = False

    def _filter_one(self, disp_ds) -> None:
        raise NotImplementedError

    def run(self, state: PipelineState) -> None:
        self._filter_one(state.left_disparity)
        if state.right_disparity is not None:
            self._filter_one(state.right_disparity)


@Step.register("filter", "median")
class MedianFilter(FilterBase):
    _FILTER_SIZE = 3

    def check_conf(self, **cfg):
        out = {"filter_size": self._FILTER_SIZE, **cfg}
        schema = {
            "filter_method": "median",
            "filter_size": And(int, lambda s: s >= 1 and s % 2 != 0),
        }
        return validate(schema, out)

    def margins(self) -> Margins:
        s = self.cfg["filter_size"]
        return Margins(s, s, s, s)

    def _filter_one(self, disp_ds) -> None:
        disp_ds.disparity_map = _median_jit(
            disp_ds.disparity_map, disp_ds.validity_mask, self.cfg["filter_size"]
        )


@Step.register("filter", "bilateral")
class BilateralFilter(FilterBase):
    def check_conf(self, **cfg):
        out = {"sigma_color": 2.0, "sigma_space": 6.0, **cfg}
        schema = {
            "filter_method": "bilateral",
            "sigma_color": float,
            "sigma_space": float,
        }
        return validate(schema, out)

    def margins(self) -> Margins:
        s = int(3.0 * self.cfg["sigma_space"] + 1.0)
        return Margins(s, s, s, s)

    def _filter_one(self, disp_ds) -> None:
        disp_ds.disparity_map = _bilateral_jit(
            disp_ds.disparity_map,
            disp_ds.validity_mask,
            float(self.cfg["sigma_color"]),
            float(self.cfg["sigma_space"]),
        )
