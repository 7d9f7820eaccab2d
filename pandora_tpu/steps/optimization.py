"""Optimization step: SGM / 3SGM semi-global regularization.

First-class re-implementation of the external pandora_plugin_libsgm
capability (docs/source/userguide/plugins/plugin_libsgm.rst:9-120 and config
tables :95-330): penalty estimators (constant / negativeGradient /
inverseGradient / mc_cnn_fast_penalty), overcounting correction,
min_cost_paths direction-count confidence, ambiguity-weighted data term
(use_confidence) and 3SGM piecewise optimization from classif/segm/edges
geometric priors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..margins import SGM_MARGINS, Margins
from ..ops import sgm as sgm_ops
from ..utils.schema import And, Or, SchemaError, validate
from .base import PipelineState, Step

_PENALTY_DEFAULTS = {
    "sgm_penalty": {"P1": 8, "P2": 32, "alpha": 1.0, "beta": 1, "gamma": 1},
    "mc_cnn_fast_penalty": {"P1": 2.3, "P2": 55.9, "Q1": 4, "Q2": 2, "D": 0.08, "V": 1.5},
}


class SgmBase(Step):
    def check_conf(self, **cfg):
        out = {
            "overcounting": False,
            "min_cost_paths": False,
            "use_confidence": None,
            "geometric_prior": {"source": "internal"},
            "penalty": {},
            **cfg,
        }
        pen = dict(out["penalty"])
        method = pen.setdefault("penalty_method", "sgm_penalty")
        if method not in _PENALTY_DEFAULTS:
            raise SchemaError(f"unknown penalty_method {method!r}")
        if method == "sgm_penalty":
            pen.setdefault("p2_method", "constant")
            if pen["p2_method"] not in ("constant", "negativeGradient", "inverseGradient"):
                raise SchemaError(f"unknown p2_method {pen['p2_method']!r}")
        full_pen = {**_PENALTY_DEFAULTS[method], **pen}
        if full_pen["P2"] <= full_pen["P1"]:
            raise SchemaError("penalty: P2 must be > P1")
        out["penalty"] = full_pen
        schema = {
            "optimization_method": self.method,
            "overcounting": bool,
            "min_cost_paths": bool,
            "use_confidence": Or(str, lambda v: v is None),
            "geometric_prior": {"source": And(str, lambda s: s in ("internal", "classif", "segm", "edges"))},
            "penalty": dict,
        }
        return validate(schema, out, allow_extra=True)

    def margins(self) -> Margins:
        # SGM influence truncated to 40 px (reference marge.py:86-89)
        return SGM_MARGINS

    # ------------------------------------------------------------------

    def _segments(self, img, shape) -> Optional[jnp.ndarray]:
        source = self.cfg["geometric_prior"]["source"]
        if source == "internal" or self.method == "sgm":
            if self.method == "3sgm" and source == "internal":
                # the reference plugin computes no internal segmentation
                # either; make the degradation loud instead of silent
                import logging

                logging.warning(
                    "3sgm geometric_prior 'internal': no segmentation source, "
                    "running plain SGM (add a semantic_segmentation step or "
                    "use source classif/segm/edges for piecewise optimization)"
                )
            return None
        if source == "segm":
            if img.segm is None:
                raise ValueError("3sgm geometric_prior 'segm' requires an input segmentation")
            return img.segm.astype(jnp.int32)
        if source == "classif":
            if img.classif is None:
                raise ValueError("3sgm geometric_prior 'classif' requires an input classification")
            classes = self.cfg["geometric_prior"].get("classes")
            names = list(img.classif_names)
            idxs = [names.index(c) for c in classes] if classes else range(img.classif.shape[0])
            seg = jnp.zeros(shape, jnp.int32)
            for rank, b in enumerate(idxs):
                seg = jnp.where(img.classif[b] > 0, rank + 1, seg)
            return seg
        if source == "edges":
            if img.edges is None:
                raise ValueError("3sgm geometric_prior 'edges' requires an input edge map")
            # paths stop at the first edge: give every edge pixel a unique
            # segment id so any crossing is a boundary
            h, w = shape
            lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
            return jnp.where(img.edges > 0, lin + 1, 0)
        return None

    def _confidence(self, state: PipelineState, cv) -> Optional[jnp.ndarray]:
        key = self.cfg["use_confidence"]
        if key is None:
            return None
        if cv.confidence is not None:
            suffix = key.split(".")
            wanted = "confidence_from_ambiguity"
            if len(suffix) > 1:
                wanted = f"confidence_from_ambiguity.{suffix[1]}"
            names = list(cv.indicator_names)
            if wanted in names:
                return cv.confidence[:, :, names.index(wanted)]
        # the plugin falls back to an all-ones weighting when ambiguity is
        # absent — make the fallback loud so a typo'd indicator is noticed
        import logging

        logging.warning(
            "use_confidence=%r: no %r band on the cost volume "
            "(available: %s) — SGM runs UNWEIGHTED; add a "
            "cost_volume_confidence ambiguity step before optimization",
            key,
            "confidence_from_ambiguity" + ("." + key.split(".")[1] if "." in key else ""),
            list(cv.indicator_names) if cv.confidence is not None else "none",
        )
        return None

    def _apply(self, state: PipelineState, cv, img_left, img_right, dmin, dmax) -> None:
        pen = self.cfg["penalty"]
        band = cv.band_correl
        left_im = img_left.band(band)
        p1_const = p2_const = None
        if pen["penalty_method"] == "mc_cnn_fast_penalty":
            p1p, p2p, p2max = sgm_ops.mc_cnn_penalty_planes(
                left_im,
                img_right.band(band),
                dmin,
                dmax,
                pen["P1"],
                pen["P2"],
                pen["Q1"],
                pen["Q2"],
                pen["D"],
                pen["V"],
            )
        elif pen["p2_method"] == "constant":
            p1p = p2p = None
            p1_const, p2_const, p2max = float(pen["P1"]), float(pen["P2"]), float(pen["P2"])
        else:
            p1p, p2p, p2max = sgm_ops.penalty_planes(
                left_im,
                pen["p2_method"],
                pen["P1"],
                pen["P2"],
                float(pen["alpha"]),
                float(pen["beta"]),
                float(pen["gamma"]),
            )
            p1_const = float(pen["P1"])
        segments = self._segments(img_left, left_im.shape)
        confidence = self._confidence(state, cv)
        optimized, nb_dirs = sgm_ops.sgm_optimize_volume(
            cv.cv,
            p1p,
            p2p,
            jnp.float32(p2max),
            confidence,
            segments,
            type_measure=cv.type_measure,
            overcounting=self.cfg["overcounting"],
            min_cost_paths=self.cfg["min_cost_paths"],
            use_pallas=sgm_ops.default_use_pallas(),
            p1_const=p1_const,
            p2_const=p2_const,
        )
        cv.cv = optimized
        cv.type_measure = "min"  # optimized volume is in cost convention
        if nb_dirs is not None:
            band_name = "optimization_plugin_libsgm_nb_of_directions"
            extra = nb_dirs[:, :, None]
            if cv.confidence is None:
                cv.confidence = extra
                cv.indicator_names = (band_name,)
            else:
                cv.confidence = jnp.concatenate([cv.confidence, extra], axis=2)
                cv.indicator_names = (*cv.indicator_names, band_name)

    def run(self, state: PipelineState) -> None:
        self._apply(
            state, state.left_cv, state.left_img, state.right_img, state.dmin, state.dmax
        )
        if state.right_disp_map == "accurate":
            self._apply(
                state,
                state.right_cv,
                state.right_img,
                state.left_img,
                state.dmin_right,
                state.dmax_right,
            )


@Step.register("optimization", "sgm")
class SgmOptimization(SgmBase):
    pass


@Step.register("optimization", "3sgm")
class ThreeSgmOptimization(SgmBase):
    pass
