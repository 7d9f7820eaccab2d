"""Semantic-segmentation step: ARNN building segmentation.

Capability of pandora_plugin_arnn (plugin_arnn.rst:1-90): a LinkNet over
the RGB bands predicts a building mask which is inserted into the image
dataset as ``segm`` for 3SGM piecewise optimization
(state_machine.semantic_segmentation_run, state_machine.py:382-402).
The plugin's vegetation filtering applies here too: pixels belonging to
the configured vegetation classes of the input classification are
removed from the building mask (automatic-annotation false positives on
high vegetation, plugin_arnn.rst:24-30).
"""

from __future__ import annotations

import logging

import jax.numpy as jnp

from ..margins import NULL_MARGINS, Margins
from ..utils.schema import And, Or, validate
from .base import PipelineState, Step


@Step.register("semantic_segmentation", "ARNN")
class ArnnSegmentation(Step):
    _cached_params = None

    def check_conf(self, **cfg):
        out = {"model_path": None, "threshold": 0.5, **cfg}
        schema = {
            "segmentation_method": "ARNN",
            "RGB_bands": dict,
            "vegetation_band": dict,
            "model_path": Or(str, lambda v: v is None),
            "threshold": And(float, lambda v: 0.0 <= v <= 1.0),
        }
        out = validate(schema, out)
        if set(out["RGB_bands"]) != {"R", "G", "B"}:
            raise ValueError("RGB_bands must map exactly the R, G and B keys")
        if "classes" not in out["vegetation_band"]:
            raise ValueError("vegetation_band requires a 'classes' list")
        return out

    def margins(self) -> Margins:
        return NULL_MARGINS

    def _params(self):
        import os

        from ..ops import linknet

        if self._cached_params is None:
            path = self.cfg["model_path"]
            if not path:
                # bundled checkpoint trained in-framework on TPU
                # (scripts/train_linknet.py) — the counterpart of the
                # plugin's pretrained building weights (plugin_arnn.rst)
                bundled = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "..", "data", "linknet.npz"
                )
                path = bundled if os.path.exists(bundled) else None
            if path:
                self._cached_params = linknet.load_params(path)
            else:
                logging.warning(
                    "ARNN: no model_path and no bundled checkpoint - using "
                    "seeded random weights (untrained); run "
                    "scripts/train_linknet.py or pass an .npz checkpoint"
                )
                self._cached_params = linknet.init_params()
        return self._cached_params

    def _segment_one(self, img) -> None:
        from ..ops import linknet

        bands = self.cfg["RGB_bands"]
        rgb = jnp.stack([img.band(bands[k]) for k in ("R", "G", "B")])
        prob = linknet.segment(self._params(), rgb)
        segm = (prob >= self.cfg["threshold"]).astype(jnp.int16)
        # vegetation filtering: drop building pixels on configured classes
        classes = self.cfg["vegetation_band"]["classes"]
        if classes and img.classif is not None:
            names = list(img.classif_names)
            veg = jnp.zeros(segm.shape, bool)
            for c in classes:
                if c in names:
                    veg = veg | (img.classif[names.index(c)] > 0)
            segm = jnp.where(veg, 0, segm).astype(jnp.int16)
        img.segm = segm

    def run(self, state: PipelineState) -> None:
        self._segment_one(state.left_img)
        if state.right_disp_map == "accurate":
            self._segment_one(state.right_img)
