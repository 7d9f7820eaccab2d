"""Cost-volume confidence step family: ambiguity / risk / interval_bounds /
std_intensity (reference cost_volume_confidence/).

Indicator naming follows the reference exactly (allocate_confidence_map,
cost_volume_confidence.py:140-250): bands are appended to both the cost
volume and (when present) the disparity dataset, named
``confidence_from_<method><suffix>`` — except risk's disp_sup/disp_inf
helper bands which keep the reference's quirk of also being prefixed.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..datamodel import CostVolume, DisparityMap
from ..ops import confidence as conf_ops
from ..ops.windows import box_std_same, valid_crop
from ..utils.schema import And, Or, validate
from .base import PipelineState, Step


def _confidence_name(name: str) -> str:
    if "disp_min" not in name and "disp_max" not in name:
        return "confidence_from_" + name
    return name


def allocate_confidence_map(name, band, disp: Optional[DisparityMap], cv: Optional[CostVolume]):
    """Append an indicator band to the CV and disparity datasets."""
    name = _confidence_name(name)
    band = band[:, :, None].astype(jnp.float32)
    for ds in (cv, disp):
        if ds is None:
            continue
        if ds.confidence is None:
            ds.confidence = band
            ds.indicator_names = (name,)
        else:
            ds.confidence = jnp.concatenate([ds.confidence, band], axis=2)
            ds.indicator_names = (*ds.indicator_names, name)


class ConfidenceBase(Step):
    def _grids(self, img, shape):
        if img.disp_min is not None:
            return img.disp_min.astype(jnp.int32), img.disp_max.astype(jnp.int32)
        import jax.numpy as jnp2

        return jnp2.zeros(shape, jnp2.int32), jnp2.zeros(shape, jnp2.int32)

    def _predict(self, state, disp_ds, cv, img_left, img_right) -> None:
        raise NotImplementedError

    def run(self, state: PipelineState) -> None:
        self._predict(state, state.left_disparity, state.left_cv, state.left_img, state.right_img)
        if state.right_disp_map == "accurate" and state.right_cv is not None:
            self._predict(
                state, state.right_disparity, state.right_cv, state.right_img, state.left_img
            )


@Step.register("cost_volume_confidence", "ambiguity")
class AmbiguityConfidence(ConfidenceBase):
    _ETA_MAX = 0.7
    _ETA_STEP = 0.01

    def check_conf(self, **cfg):
        out = {
            "eta_max": self._ETA_MAX,
            "eta_step": self._ETA_STEP,
            "normalization": True,
            "indicator": "",
            **cfg,
        }
        schema = {
            "confidence_method": "ambiguity",
            "eta_max": And(float, lambda v: 0 < v < 1),
            "eta_step": And(float, lambda v: 0 < v < 1),
            "normalization": bool,
            "indicator": str,
        }
        return validate(schema, out)

    def _predict(self, state, disp_ds, cv, img_left, img_right) -> None:
        work = -cv.cv if cv.type_measure == "max" else cv.cv
        etas = np.arange(0.0, self.cfg["eta_max"], self.cfg["eta_step"])
        gmin, gmax = self._grids(img_left, work.shape[:2])
        amb = conf_ops.compute_ambiguity(
            work, jnp.asarray(etas), gmin, gmax, cv.disp_range
        )
        if self.cfg["normalization"]:
            gd = img_left.global_disparity or img_right.global_disparity
            if gd is not None:
                # tiled runs: normalize by the global extrema instead of
                # the per-tile percentile
                amb = conf_ops.normalize_with_extremum(
                    amb, gd, len(etas), cv.subpixel
                )
            elif state.spatial_axes:
                # sharded program without a global_disparity attr: the
                # percentile itself becomes a cross-tile collective so every
                # tile normalizes by the same scene-wide scalars
                amb = conf_ops.normalize_with_percentile_collective(
                    amb, state.spatial_axes, state.halo_rc
                )
            else:
                amb = conf_ops.normalize_with_percentile(amb)
        confidence = 1.0 - amb
        allocate_confidence_map("ambiguity" + self.cfg["indicator"], confidence, disp_ds, cv)


@Step.register("cost_volume_confidence", "risk")
class RiskConfidence(ConfidenceBase):
    def check_conf(self, **cfg):
        out = {"eta_max": 0.7, "eta_step": 0.01, "indicator": "", **cfg}
        schema = {
            "confidence_method": "risk",
            "eta_max": And(float, lambda v: 0 < v < 1),
            "eta_step": And(float, lambda v: 0 < v < 1),
            "indicator": str,
        }
        return validate(schema, out)

    def _predict(self, state, disp_ds, cv, img_left, img_right) -> None:
        work = -cv.cv if cv.type_measure == "max" else cv.cv
        etas = np.arange(0.0, self.cfg["eta_max"], self.cfg["eta_step"])
        gmin, gmax = self._grids(img_left, work.shape[:2])
        risk_max, risk_min, disp_sup, disp_inf = conf_ops.compute_risk(
            work, jnp.asarray(etas), gmin, gmax, cv.disp_range
        )
        suffix = self.cfg["indicator"]
        allocate_confidence_map("risk_max" + suffix, risk_max, disp_ds, cv)
        allocate_confidence_map("risk_min" + suffix, risk_min, disp_ds, cv)
        allocate_confidence_map("disp_sup_from_risk" + suffix, disp_sup, disp_ds, cv)
        allocate_confidence_map("disp_inf_from_risk" + suffix, disp_inf, disp_ds, cv)


@Step.register("cost_volume_confidence", "interval_bounds")
class IntervalBoundsConfidence(ConfidenceBase):
    _POSSIBILITY_THRESHOLD = 0.9

    def check_conf(self, **cfg):
        out = {
            "possibility_threshold": self._POSSIBILITY_THRESHOLD,
            "regularization": False,
            "ambiguity_indicator": "",
            "ambiguity_threshold": 0.6,
            "ambiguity_kernel_size": 5,
            "vertical_depth": 0,
            "quantile_regularization": 1.0,
            "indicator": "",
            **cfg,
        }
        schema = {
            "confidence_method": "interval_bounds",
            "possibility_threshold": And(float, lambda v: 0 <= v <= 1),
            "regularization": bool,
            "ambiguity_indicator": str,
            "ambiguity_threshold": And(float, lambda v: 0 <= v <= 1),
            "ambiguity_kernel_size": And(int, lambda v: v % 2 == 1 and v > 0),
            "vertical_depth": And(int, lambda v: v >= 0),
            "quantile_regularization": And(float, lambda v: 0 <= v <= 1),
            "indicator": str,
        }
        return validate(schema, out)

    def _predict(self, state, disp_ds, cv, img_left, img_right) -> None:
        type_factor = -1.0 if cv.type_measure == "min" else 1.0
        gmin, gmax = self._grids(img_left, cv.cv.shape[:2])
        inf_b, sup_b = conf_ops.compute_interval_bounds(
            cv.cv,
            cv.disp_range,
            float(self.cfg["possibility_threshold"]),
            type_factor,
            gmin,
            gmax,
        )
        if self.cfg["regularization"]:
            from ..interval_tools import interval_regularization

            indicator = "confidence_from_ambiguity" + (
                "." + self.cfg["ambiguity_indicator"] if self.cfg["ambiguity_indicator"] else ""
            )
            names = list(cv.indicator_names)
            if indicator not in names:
                raise ValueError(
                    f"interval_bounds regularization requires {indicator!r}; "
                    "add a cost_volume_confidence ambiguity step first"
                )
            amb = np.asarray(cv.confidence[:, :, names.index(indicator)])
            inf_r, sup_r, _ = interval_regularization(
                np.asarray(inf_b),
                np.asarray(sup_b),
                amb,
                float(self.cfg["ambiguity_threshold"]),
                int(self.cfg["ambiguity_kernel_size"]),
                int(self.cfg["vertical_depth"]),
                float(self.cfg["quantile_regularization"]),
            )
            inf_b, sup_b = jnp.asarray(inf_r), jnp.asarray(sup_r)
        suffix = self.cfg["indicator"]
        allocate_confidence_map("interval_bounds_inf" + suffix, inf_b, disp_ds, cv)
        allocate_confidence_map("interval_bounds_sup" + suffix, sup_b, disp_ds, cv)


@Step.register("cost_volume_confidence", "std_intensity")
class StdIntensityConfidence(ConfidenceBase):
    def check_conf(self, **cfg):
        out = {"indicator": "", **cfg}
        schema = {"confidence_method": "std_intensity", "indicator": str}
        return validate(schema, out)

    def _predict(self, state, disp_ds, cv, img_left, img_right) -> None:
        band = img_left.band(cv.band_correl)
        w = cv.window_size
        std = box_std_same(band, w, w)
        offset = (w - 1) // 2
        h, wdt = band.shape
        row = jnp.arange(h)[:, None]
        col = jnp.arange(wdt)[None, :]
        interior = (
            (row >= offset) & (row < h - offset) & (col >= offset) & (col < wdt - offset)
        )
        std = jnp.where(interior, std, jnp.nan)
        # the reference class's _method is "intensity_std", not the config
        # string (std_intensity.py:45,56)
        allocate_confidence_map("intensity_std" + self.cfg["indicator"], std, disp_ds, cv)
