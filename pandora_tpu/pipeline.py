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
        plan = self._fused_plan(state)
        if plan is not None:
            logging.info("pipeline: fused fast path (%s)", plan)
            self._run_fused(state, plan)
            return state
        for key, step in self.steps:
            logging.info("%s...", key)
            if Profiler.enabled:
                profile(key, memprof=True)(step.run)(state)
            else:
                step.run(state)
        return state

    # -- fused fast-path routing --------------------------------------------
    #
    # A census→SGM(constant penalties)→WTA(→vfit/quadratic)(→median) JSON
    # pipeline is EXACTLY the fused serving path (proven bit-equal by
    # tests/test_fused_parity.py), so on TPU the modular engine routes it
    # through the uint8 scan-layout kernels instead of materializing NaN
    # f32 (row, col, disp) volumes per step (~4x the HBM traffic).

    def _fused_plan(self, state: PipelineState):
        from .ops import sgm as sgm_ops

        if not sgm_ops.default_use_pallas():
            return None
        if state.right_disp_map != "none" or state.num_scales > 1:
            return None
        if state.spatial_axes or state.scale_factor != 1 or state.extrema_preset:
            return None
        img_l, img_r = state.left_img, state.right_img
        if img_l.msk is not None or img_r.msk is not None:
            # masks ARE supported by the fused path, but the modular CV
            # carries them through confidence-free steps only; keep the
            # conservative gate aligned with what the parity test pins
            pass
        if img_l.disp_min is None or img_l.disparity_source == "grid":
            return None
        plan = {}
        expect = iter(
            ["matching_cost", "optimization", "disparity", "refinement", "filter"]
        )
        pos = list(expect)
        i = 0
        for key, step in self.steps:
            family = key.split(".")[0]
            while i < len(pos) and pos[i] != family:
                # optional steps may be absent, but order must hold and
                # matching_cost/optimization/disparity are mandatory
                if pos[i] in ("matching_cost", "optimization", "disparity"):
                    return None
                i += 1
            if i >= len(pos):
                return None
            if family == "matching_cost":
                if step.cfg["matching_cost_method"] != "census":
                    return None
                plan.update(
                    window_size=step.cfg["window_size"],
                    subpix=step.cfg["subpix"],
                    band=step.cfg["band"],
                )
            elif family == "optimization":
                pen = step.cfg.get("penalty", {})
                if (
                    step.cfg["optimization_method"] != "sgm"
                    or pen.get("penalty_method") != "sgm_penalty"
                    or pen.get("p2_method") != "constant"
                    or step.cfg.get("overcounting")
                    or step.cfg.get("min_cost_paths")
                    or step.cfg.get("use_confidence") is not None
                ):
                    return None
                plan.update(p1=float(pen["P1"]), p2=float(pen["P2"]))
            elif family == "disparity":
                plan.update(invalid=float(step.cfg["invalid_disparity"]))
            elif family == "refinement":
                plan.update(refinement=step.cfg["refinement_method"])
            elif family == "filter":
                if step.cfg["filter_method"] != "median":
                    return None
                plan.update(median_size=step.cfg["filter_size"])
            i += 1
        if "p1" not in plan or "invalid" not in plan:
            return None
        from .ops.sgm_pallas import pallas_supported

        from .datamodel import disparity_extrema

        dmin, dmax = disparity_extrema(img_l)
        n_disp = (dmax - dmin) * plan["subpix"] + 1
        shape = img_l.band(plan["band"]).shape
        if not pallas_supported((*shape, n_disp), None, None, None, False):
            return None
        plan.update(dmin=dmin, dmax=dmax)
        return plan

    _fused_cache: Dict[tuple, Any] = {}

    def _run_fused(self, state: PipelineState, plan) -> None:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from .datamodel import DisparityMap
        from .fused import stereo_pipeline

        img_l, img_r = state.left_img, state.right_img
        invalid = plan["invalid"]
        # NaN hashes by object identity on Python >= 3.10 — normalize it
        # or every Pipeline instance would miss the cache and recompile
        cfg_key = (
            plan["dmin"], plan["dmax"], plan["subpix"], plan["window_size"],
            plan["p1"], plan["p2"], plan.get("refinement"),
            plan.get("median_size", 0),
            "nan" if np.isnan(invalid) else invalid,
        )
        fn = Pipeline._fused_cache.get(cfg_key)
        if fn is None:
            from functools import partial

            base = partial(
                stereo_pipeline,
                dmin=plan["dmin"],
                dmax=plan["dmax"],
                subpix=plan["subpix"],
                window_size=plan["window_size"],
                matching_cost="census",
                optimization="sgm",
                p1=plan["p1"],
                p2=plan["p2"],
                refinement=plan.get("refinement"),
                median_size=plan.get("median_size", 0),
            )

            # ONE jitted program including the invalid-value substitution:
            # wta() fills all-NaN lanes with the configured invalid value,
            # and the fused path's NaN marks exactly those lanes (a
            # separate post-jit where() would cost an extra dispatch round
            # trip per frame on a remote-tunneled TPU)
            def run(li, ri, lm, rm):
                d, v = base(li, ri, lm, rm)
                if not np.isnan(invalid):
                    d = jnp.where(jnp.isnan(d), jnp.float32(invalid), d)
                return d, v

            fn = jax.jit(run)
            Pipeline._fused_cache[cfg_key] = fn
        left = img_l.band(plan["band"])
        right = img_r.band(plan["band"])
        # stereo_pipeline's mask consumers assume the standard 0/1/2
        # convention; translate custom valid_pixels/no_data_mask first
        lmsk = img_l.std_msk()
        rmsk = img_r.std_msk()
        disp, vmask = fn(left, right, lmsk, rmsk)
        state.dmin, state.dmax = plan["dmin"], plan["dmax"]
        state.left_disparity = DisparityMap(
            disparity_map=disp,
            validity_mask=vmask,
            invalid_disparity=None if np.isnan(invalid) else invalid,
            transform=img_l.transform,
            crs=img_l.crs,
        )
