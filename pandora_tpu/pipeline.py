"""Pipeline orchestration: declarative sequencing instead of a runtime FSM.

The reference enforces step order with a ``transitions`` state machine
(state_machine.py:75-205).  The transition table is static, so here it is a
plain dict validated once when the pipeline is built; execution is a simple
ordered loop over step objects.  Repeated steps use the reference's
``name.suffix`` convention (state_machine.py:705-717).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Tuple

from .margins import GlobalMargins
from .profiler import Profiler, profile
from .steps.base import PipelineState, Step, make_step

# (source state, step family) -> destination state
# (mirrors _transitions_run, state_machine.py:75-140)
TRANSITIONS: Dict[Tuple[str, str], str] = {
    ("begin", "matching_cost"): "cost_volume",
    ("cost_volume", "aggregation"): "cost_volume",
    ("cost_volume", "semantic_segmentation"): "cost_volume",
    ("cost_volume", "optimization"): "cost_volume",
    ("cost_volume", "cost_volume_confidence"): "cost_volume",
    ("cost_volume", "disparity"): "disp_map",
    ("disp_map", "filter"): "disp_map",
    ("disp_map", "refinement"): "disp_map",
    ("disp_map", "validation"): "disp_map",
    ("disp_map", "multiscale"): "begin",
}

# steps whose margins accumulate; filters take the max
# (margins/margins.py:73-143)
_CUMULATIVE = {"matching_cost", "disparity", "refinement", "aggregation", "optimization"}


class MachineError(RuntimeError):
    """Invalid pipeline sequencing (mirrors transitions.MachineError)."""


class Pipeline:
    """An ordered, validated list of step instances."""

    def __init__(self, pipeline_cfg: Dict[str, Dict[str, Any]]):
        self.steps: List[Tuple[str, Step]] = []
        self.margins = GlobalMargins()
        self.right_disp_map = "none"
        state = "begin"
        for key, cfg in pipeline_cfg.items():
            family = key.split(".")[0]  # name.suffix convention
            dest = TRANSITIONS.get((state, family))
            if dest is None:
                raise MachineError(
                    f"step {key!r} (family {family!r}) cannot run from state {state!r}"
                )
            if family == "cost_volume_confidence":
                # repeated confidence steps get their suffix as indicator
                # (state_machine.cost_volume_confidence_run, :571-576)
                parts = key.split(".")
                cfg = {**cfg, "indicator": "." + parts[1] if len(parts) == 2 else ""}
            step = make_step(family, cfg)
            self.steps.append((key, step))
            if family in _CUMULATIVE:
                self.margins.add_cumulative(key, step.margins())
            elif family == "filter":
                self.margins.add_non_cumulative(key, step.margins())
            if family == "validation":
                self.right_disp_map = step.cfg["validation_method"]
            state = dest
        if state == "begin" and self.steps:
            state = "disp_map"  # multiscale last scale stays in disp_map
        self.final_state = state

    @property
    def multiscale_params(self) -> Tuple[int, int]:
        """(num_scales, scale_factor) — (1, 1) without a multiscale step
        (check_configuration.read_multiscale_params, :558-583)."""
        for key, step in self.steps:
            if key.split(".")[0] == "multiscale":
                return step.cfg["num_scales"], step.cfg["scale_factor"]
        return 1, 1

    @property
    def validated_cfg(self) -> Dict[str, Dict[str, Any]]:
        """Pipeline config with defaults folded in (the reference persists
        this as cfg/config.json, common.py:202-220)."""
        return {key: dict(step.cfg) for key, step in self.steps}

    def run(self, state: PipelineState) -> PipelineState:
        if self.right_disp_map == "cross_checking_accurate":
            state.right_disp_map = "accurate"
        elif self.right_disp_map == "cross_checking_fast":
            state.right_disp_map = "fast"
        for key, step in self.steps:
            logging.info("%s...", key)
            if Profiler.enabled:
                profile(key, memprof=True)(step.run)(state)
            else:
                step.run(state)
        return state
