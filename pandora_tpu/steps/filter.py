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
from ..utils.schema import And, Or, validate
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

    def _filter_one(self, disp_ds, img) -> None:
        raise NotImplementedError

    def run(self, state: PipelineState) -> None:
        self._filter_one(state.left_disparity, state.left_img)
        # median_for_intervals skips the right map in fast mode
        # (state_machine.filter_run, state_machine.py:469-473)
        if state.right_disparity is not None and not (
            state.right_disp_map == "fast" and self.method == "median_for_intervals"
        ):
            self._filter_one(state.right_disparity, state.right_img)


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

    def _filter_one(self, disp_ds, img) -> None:
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

    def _filter_one(self, disp_ds, img) -> None:
        disp_ds.disparity_map = _bilateral_jit(
            disp_ds.disparity_map,
            disp_ds.validity_mask,
            float(self.cfg["sigma_color"]),
            float(self.cfg["sigma_space"]),
        )


@Step.register("filter", "disparity_denoiser")
class DisparityDenoiser(FilterBase):
    """Plane-aware bilateral denoiser (filter/disparity_denoiser.py)."""

    def check_conf(self, **cfg):
        out = {
            "filter_size": 11,
            "sigma_euclidian": 4.0,
            "sigma_color": 100.0,
            "sigma_planar": 12.0,
            "sigma_grad": 1.5,
            "band": None,
            **cfg,
        }
        schema = {
            "filter_method": "disparity_denoiser",
            "filter_size": And(int, lambda s: s > 0 and s % 2 != 0),
            "sigma_euclidian": And(float, lambda v: v > 0),
            "sigma_color": And(float, lambda v: v > 0),
            "sigma_planar": And(float, lambda v: v > 0),
            "sigma_grad": And(float, lambda v: v >= 0),
            "band": Or(str, lambda b: b is None),
        }
        return validate(schema, out)

    def margins(self) -> Margins:
        s = self.cfg["filter_size"]
        return Margins(s, s, s, s)

    def _filter_one(self, disp_ds, img) -> None:
        from ..ops.denoiser import denoise_disparity

        band = self.cfg["band"]
        if band is None and img.n_bands >= 3:
            # reference default picks band index 1 of multiband images
            # (disparity_denoiser.py:224-227)
            color = img.im[1]
        else:
            color = img.band(band)
        disp_ds.disparity_map = denoise_disparity(
            disp_ds.disparity_map,
            color,
            disp_ds.validity_mask,
            cst.PANDORA_MSK_PIXEL_INVALID,
            size=self.cfg["filter_size"],
            sigma_euclidian=float(self.cfg["sigma_euclidian"]),
            sigma_color=float(self.cfg["sigma_color"]),
            sigma_planar=float(self.cfg["sigma_planar"]),
            sigma_grad=float(self.cfg["sigma_grad"]),
        )


@Step.register("filter", "median_for_intervals")
class MedianForIntervalsFilter(FilterBase):
    """Median on the interval_bounds confidence bands + optional graph
    regularization re-run (filter/median_for_intervals.py:41-212)."""

    def check_conf(self, **cfg):
        out = {
            "filter_size": 3,
            "interval_indicator": "",
            "regularization": False,
            "vertical_depth": 0,
            "quantile_regularization": 1.0,
            "ambiguity_indicator": "",
            "ambiguity_threshold": 0.6,
            "ambiguity_kernel_size": 5,
            **cfg,
        }
        schema = {
            "filter_method": "median_for_intervals",
            "filter_size": And(int, lambda s: s >= 1 and s % 2 != 0),
            "interval_indicator": str,
            "regularization": bool,
            "vertical_depth": And(int, lambda v: v >= 0),
            "quantile_regularization": And(float, lambda v: 0 <= v <= 1),
            "ambiguity_indicator": str,
            "ambiguity_threshold": And(float, lambda v: 0 <= v <= 1),
            "ambiguity_kernel_size": And(int, lambda v: v % 2 == 1 and v > 0),
        }
        return validate(schema, out)

    def margins(self) -> Margins:
        s = self.cfg["filter_size"]
        return Margins(s, s, s, s)

    @staticmethod
    def _band_name(base: str, indicator: str) -> str:
        return base + ("." + indicator if indicator else "")

    def _filter_one(self, disp_ds, img) -> None:
        import jax.numpy as jnp
        import numpy as np

        from ..ops.filters import nanmedian_window

        ind = self.cfg["interval_indicator"]
        name_inf = self._band_name("confidence_from_interval_bounds_inf", ind)
        name_sup = self._band_name("confidence_from_interval_bounds_sup", ind)
        names = list(disp_ds.indicator_names)
        if name_inf not in names or name_sup not in names:
            raise ValueError(
                f"median_for_intervals requires {name_inf!r}/{name_sup!r} bands; "
                "add a cost_volume_confidence interval_bounds step first"
            )
        conf = disp_ds.confidence
        idx = {n: names.index(n) for n in (name_inf, name_sup)}
        bands = {}
        for n, i in idx.items():
            a = conf[:, :, i]
            med = jnp.where(jnp.isnan(a), jnp.nan, nanmedian_window(a, self.cfg["filter_size"]))
            bands[n] = med
        if self.cfg["regularization"]:
            from ..interval_tools import interval_regularization

            amb_name = self._band_name(
                "confidence_from_ambiguity", self.cfg["ambiguity_indicator"]
            )
            if amb_name not in names:
                raise ValueError(f"median_for_intervals regularization requires {amb_name!r}")
            inf_r, sup_r, mask = interval_regularization(
                np.asarray(bands[name_inf]),
                np.asarray(bands[name_sup]),
                np.asarray(conf[:, :, names.index(amb_name)]),
                float(self.cfg["ambiguity_threshold"]),
                int(self.cfg["ambiguity_kernel_size"]),
                int(self.cfg["vertical_depth"]),
                float(self.cfg["quantile_regularization"]),
            )
            bands[name_inf] = jnp.asarray(inf_r)
            bands[name_sup] = jnp.asarray(sup_r)
            disp_ds.validity_mask = jnp.where(
                jnp.asarray(mask),
                disp_ds.validity_mask | cst.PANDORA_MSK_PIXEL_INTERVAL_REGULARIZED,
                disp_ds.validity_mask,
            ).astype(disp_ds.validity_mask.dtype)
        for n, i in idx.items():
            conf = conf.at[:, :, i].set(bands[n])
        disp_ds.confidence = conf
