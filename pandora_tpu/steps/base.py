"""Step registry and pipeline state.

Re-design of the reference's abstract-factory pattern (e.g.
matching_cost/matching_cost.py:80-131: ``__new__`` dispatch on a config
string + ``register_subclass``): here a plain registry keyed by
(step family, method) with a decorator, and steps are pure-ish objects
acting on a :class:`PipelineState`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Type

import numpy as np

from ..datamodel import CostVolume, DisparityMap, Image
from ..margins import Margins, NULL_MARGINS

# family -> method -> class
STEP_FAMILIES: Dict[str, Dict[str, Type["Step"]]] = {}

# family -> config key holding the method name (reference *_method keys)
METHOD_KEYS = {
    "matching_cost": "matching_cost_method",
    "aggregation": "aggregation_method",
    "optimization": "optimization_method",
    "disparity": "disparity_method",
    "filter": "filter_method",
    "refinement": "refinement_method",
    "validation": "validation_method",
    "cost_volume_confidence": "confidence_method",
    "multiscale": "multiscale_method",
    "semantic_segmentation": "segmentation_method",
}


class Step:
    """Base class for all pipeline steps."""

    family: str = ""
    method: str = ""
    # margins accumulate (sum) across cumulative steps, max for filters
    cumulative_margins: bool = True

    def __init__(self, **cfg: Any):
        self.cfg = self.check_conf(**cfg)

    @classmethod
    def register(cls, family: str, method: str):
        def deco(subcls):
            subcls.family = family
            subcls.method = method
            STEP_FAMILIES.setdefault(family, {})[method] = subcls
            return subcls

        return deco

    def check_conf(self, **cfg: Any) -> Dict[str, Any]:
        return cfg

    def margins(self) -> Margins:
        return NULL_MARGINS

    def run(self, state: "PipelineState") -> None:
        raise NotImplementedError

    def desc(self) -> str:
        return f"{self.family}:{self.method}"


def make_step(family: str, cfg: Dict[str, Any]) -> Step:
    """Instantiate a step from its config dict (factory dispatch on the
    family's method key, like the reference ``Abstract*.__new__``)."""
    key = METHOD_KEYS[family]
    if key not in cfg:
        raise KeyError(f"step {family!r}: missing {key!r} in {cfg}")
    method = cfg[key]
    methods = STEP_FAMILIES.get(family, {})
    if method not in methods:
        raise KeyError(
            f"No method {method!r} registered for step {family!r}; "
            f"available: {sorted(methods)}"
        )
    return methods[method](**cfg)


@dataclass
class PipelineState:
    """All mutable pipeline state (the reference keeps this on the
    PandoraMachine instance, state_machine.py:207-290)."""

    left_img: Image
    right_img: Image
    # static integer disparity extrema of the cost volume axis
    dmin: int = 0
    dmax: int = 0
    dmin_right: int = 0
    dmax_right: int = 0
    left_cv: Optional[CostVolume] = None
    right_cv: Optional[CostVolume] = None
    left_disparity: Optional[DisparityMap] = None
    right_disparity: Optional[DisparityMap] = None
    # 'none' | 'accurate' | 'fast' (state_machine right_disp_map)
    right_disp_map: str = "none"
    # multiscale bookkeeping
    scale_factor: int = 1
    num_scales: int = 1
    current_scale: int = 0
    pyramid: list = field(default_factory=list)
    # user disparity range, rescaled per pyramid level (state_machine
    # dmin_user/dmax_user, :645-657)
    dmin_user: float = 0.0
    dmax_user: float = 0.0
    dmin_user_right: float = 0.0
    dmax_user_right: float = 0.0
    # --- tiled (shard_map) execution context --------------------------------
    # preset static extrema/cmax: the tiled runner computes them on the host
    # BEFORE sharding (disparity_extrema/_cmax device_get arrays, which is
    # illegal under a shard_map trace)
    extrema_preset: bool = False
    cmax_left: Optional[float] = None
    cmax_right: Optional[float] = None
    # mesh spatial axis names when running inside shard_map (() = unsharded);
    # steps needing cross-tile reductions (e.g. ambiguity percentile
    # normalization) use these with lax collectives
    spatial_axes: tuple = ()
    # (row_halo, col_halo) of the extended shard — lets collective steps crop
    # their local interior before gathering
    halo_rc: tuple = (0, 0)

    def require_cv(self) -> CostVolume:
        if self.left_cv is None:
            raise RuntimeError("no cost volume computed yet")
        return self.left_cv
