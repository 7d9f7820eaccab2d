"""Configuration reading, validation and defaults.

Same JSON surface as the reference (check_configuration.py): an ``input``
section (left/right image paths, nodata, masks, disparity as an [min, max]
pair or grid rasters) and a ``pipeline`` section whose keys replay the step
sequence.  Validation is two-phase like the reference: input schema variants
by disparity type (check_configuration.py:461-473), then pipeline sequencing
+ per-step schemas via :class:`pandora_tpu.pipeline.Pipeline`.
"""

from __future__ import annotations

import copy
import json
import math
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from .utils.schema import And, Or, SchemaError, validate

_OPT_STR = Or(str, lambda v: v is None)

INPUT_SCHEMA = {
    "left": {
        "img": str,
        "nodata": Or(int, float),
        "mask": _OPT_STR,
        "classif": _OPT_STR,
        "segm": _OPT_STR,
        "edges": _OPT_STR,
        "disp": Or([int, int], str),
    },
    "right": {
        "img": str,
        "nodata": Or(int, float),
        "mask": _OPT_STR,
        "classif": _OPT_STR,
        "segm": _OPT_STR,
        "edges": _OPT_STR,
        "disp": Or([int, int], str, lambda v: v is None),
    },
}

DEFAULT_INPUT = {
    "left": {"nodata": -9999, "mask": None, "classif": None, "segm": None, "edges": None},
    "right": {
        "nodata": -9999,
        "mask": None,
        "classif": None,
        "segm": None,
        "edges": None,
        "disp": None,
    },
}


def update_conf(default: Dict[str, Any], user: Mapping[str, Any]) -> Dict[str, Any]:
    """Deep-merge user config over defaults, coercing the JSON strings
    "NaN"/"inf"/"-inf" (check_configuration.update_conf, :693-716)."""
    out = copy.deepcopy(default)
    for key, value in user.items():
        if isinstance(value, Mapping):
            out[key] = update_conf(out.get(key, {}), value)
        else:
            if value == "NaN":
                value = float("nan")
            elif value == "inf":
                value = float("inf")
            elif value == "-inf":
                value = float("-inf")
            out[key] = value
    return out


def read_config_file(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as fh:
        return json.load(fh)


def check_input_section(user_input: Dict[str, Any]) -> Dict[str, Any]:
    cfg = update_conf(DEFAULT_INPUT, user_input)
    validate(INPUT_SCHEMA, cfg)
    # disparity coherence (check_configuration.py:233-297)
    disp = cfg["left"]["disp"]
    if isinstance(disp, (list, tuple)):
        if disp[0] > disp[1]:
            raise SchemaError("left disp: min must be <= max")
        rdisp = cfg["right"]["disp"]
        if isinstance(rdisp, (list, tuple)) and rdisp[0] > rdisp[1]:
            raise SchemaError("right disp: min must be <= max")
    else:
        # grid disparities: right must be a grid or None
        if isinstance(cfg["right"]["disp"], (list, tuple)):
            raise SchemaError("right disp must be a grid (or None) when left disp is a grid")
    return cfg


def check_conf(user_cfg: Dict[str, Any]) -> Tuple[Dict[str, Any], "Pipeline"]:
    """Full two-phase validation; returns (validated config with defaults,
    built Pipeline)."""
    from .pipeline import Pipeline

    if "input" not in user_cfg:
        raise SchemaError("missing 'input' section")
    if "pipeline" not in user_cfg:
        raise SchemaError("missing 'pipeline' section")
    cfg_input = check_input_section(user_cfg["input"])
    pipeline = Pipeline(user_cfg["pipeline"])
    out = {
        "input": cfg_input,
        "pipeline": pipeline.validated_cfg,
    }
    if "profiling" in user_cfg:
        out["profiling"] = user_cfg["profiling"]
    return out, pipeline


# --- memory estimation (check_configuration.py:336-412, 657-671) -----------

MEMORY_CONSUMPTION_LIST = [
    ["matching_cost", "matching_cost_method", "mc_cnn", 1.57e-05, 265],
    ["optimization", "optimization_method", "sgm", 1.26e-05, 237],
    ["aggregation", "aggregation_method", "cbca", 1.65e-05, 221],
    ["matching_cost", "matching_cost_method", "sad", 1.14e-05, 236],
    ["matching_cost", "matching_cost_method", "ssd", 1.14e-05, 236],
    ["disparity", "disparity_method", "wta", 8.68e-06, 243],
    ["cost_volume_confidence", "confidence_method", "ambiguity", 7.68e-06, 273],
    ["cost_volume_confidence", "confidence_method", "std_intensity", 7.68e-06, 273],
    ["validation", "interpolated_disparity", "sgm", 7.88e-06, 263],
    ["validation", "interpolated_disparity", "mc_cnn", 7.88e-06, 263],
    ["matching_cost", "matching_cost_method", "census", 7.77e-06, 223],
    ["filter", "filter_method", "bilateral", 7.77e-06, 259],
    ["matching_cost", "matching_cost_method", "zncc", 7.69e-06, 254],
]


def memory_consumption_estimation(
    pipeline_cfg: Dict[str, Any],
    img_shape: Tuple[int, int],
    disp_min: int,
    disp_max: int,
    verbose: bool = False,
) -> Optional[Tuple[float, float]]:
    """Estimate peak host-equivalent memory (MiB) as the max linear model
    over the configured steps, ±10% (check_configuration.py:336-412).

    On TPU this doubles as an HBM sanity bound for the dense cost volume.
    """
    rows, cols = img_shape
    cv_size = rows * cols * (disp_max - disp_min + 1)
    consumptions = []
    pipe = pipeline_cfg.get("pipeline", pipeline_cfg)
    for step, method_key, method, m, n in MEMORY_CONSUMPTION_LIST:
        for key, sub in pipe.items():
            if key.split(".")[0] == step and sub.get(method_key) == method:
                consumptions.append(m * cv_size + n)
    if not consumptions:
        return None
    peak = max(consumptions)
    lo, hi = 0.9 * peak, 1.1 * peak
    if verbose:
        print(f"Estimated maximum memory consumption between {lo:.0f} MiB and {hi:.0f} MiB")
    return lo, hi
