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
        if isinstance(rdisp, str):
            # mixed forms are rejected like the reference's json-checker
            # schemas (tests/test_config.py:151-166)
            raise SchemaError("right disp must be an int pair (or None) when left disp is a pair")
    else:
        # grid disparities: right must be a grid or None
        if isinstance(cfg["right"]["disp"], (list, tuple)):
            raise SchemaError("right disp must be a grid (or None) when left disp is a grid")
    return cfg


# --- image-level checks (check_configuration.py:170-297) -------------------


def check_image_dimension(h1: Dict[str, Any], h2: Dict[str, Any]) -> None:
    """Two raster headers must agree on width/height
    (check_configuration.check_image_dimension, :171-182)."""
    if h1["width"] != h2["width"] or h1["height"] != h2["height"]:
        raise AttributeError("Images must have the same size")


def check_images(cfg_input: Dict[str, Any]) -> None:
    """Header-only dimension coherence of every configured raster
    (check_configuration.check_images, :184-205): left/right images equal,
    and each auxiliary layer (mask/classif/segm/edges) matches its image."""
    from .io.raster import read_raster_header

    left = read_raster_header(cfg_input["left"]["img"])
    right = read_raster_header(cfg_input["right"]["img"])
    check_image_dimension(left, right)
    for side, ref in (("left", left), ("right", right)):
        for layer in ("mask", "classif", "segm", "edges"):
            path = cfg_input[side].get(layer)
            if path is not None:
                check_image_dimension(ref, read_raster_header(path))


def check_band_names(band_names) -> None:
    """Band names must be strings (check_configuration.check_band_names,
    :207-218)."""
    if band_names is not None and not all(isinstance(b, str) for b in band_names):
        raise TypeError("Band value must be str")


def check_disparity_ranges_are_inside_image(disparity, width: int) -> None:
    """The search range must intersect the image columns
    (check_configuration.check_disparity_ranges_are_inside_image, :220-231)."""
    if np.abs(np.asarray(disparity)).min() > width:
        raise ValueError("Disparity range out of image")


def check_disparities_from_input(disparity, img_left: Optional[str]) -> None:
    """Disparity/image coherence (check_configuration.
    check_disparities_from_input, :233-272): int pairs must be ordered and
    inside the image; grid rasters must be 2-band, image-sized, with
    min <= max everywhere."""
    from .io.raster import read_raster, read_raster_header

    if isinstance(disparity, (list, tuple)):
        if disparity[1] < disparity[0]:
            raise ValueError("disp_max must be bigger than disp_min")
        if img_left is not None:
            check_disparity_ranges_are_inside_image(
                disparity, read_raster_header(img_left)["width"]
            )
    elif isinstance(disparity, str):
        header = read_raster_header(img_left)
        grid_header = read_raster_header(disparity)
        if grid_header["count"] != 2:
            raise AttributeError("Disparity grids must be a 2-channel grid")
        if grid_header["width"] != header["width"] or grid_header["height"] != header["height"]:
            raise AttributeError("Disparity grids and image must have the same size")
        grid, *_ = read_raster(disparity)
        if (grid[0] > grid[1]).any():
            raise ValueError("disp_max must be bigger than disp_min")
        check_disparity_ranges_are_inside_image(
            [grid[0].min(), grid[1].max()], header["width"]
        )


ROI_SCHEMA = {
    "col": {"first": And(int, lambda v: v >= 0), "last": And(int, lambda v: v >= 0)},
    "row": {"first": And(int, lambda v: v >= 0), "last": And(int, lambda v: v >= 0)},
    "margins": lambda v: v is None
    or (isinstance(v, (list, tuple)) and len(v) == 4 and all(isinstance(m, int) for m in v)),
}


def check_roi_section(roi: Dict[str, Any]) -> Dict[str, Any]:
    """Validate the optional ``ROI`` config section (windowed processing,
    the reference's CARS entry point img_tools.get_window, :61-98)."""
    roi = dict(roi)
    # an explicit "margins": null means no margins (setdefault would keep
    # the None and crash get_window's subscripting later)
    if roi.get("margins") is None:
        roi["margins"] = [0, 0, 0, 0]
    validate(ROI_SCHEMA, roi)
    if roi["col"]["first"] > roi["col"]["last"] or roi["row"]["first"] > roi["row"]["last"]:
        raise SchemaError("ROI: 'first' must be <= 'last'")
    return roi


def _check_input_files_exist(cfg_input: Dict[str, Any]) -> None:
    """Every configured raster path must exist on disk — the reference
    always opens the rasters during validation, so a typo'd path fails at
    check time with a clear message, not at read time (check_configuration
    .py:450-473)."""
    import os

    for side in ("left", "right"):
        for key in ("img", "mask", "classif", "segm", "edges", "disp"):
            path = cfg_input[side].get(key)
            if isinstance(path, str) and not os.path.isfile(path):
                raise SchemaError(f"input.{side}.{key}: file not found: {path!r}")


def check_pipeline_metadata(cfg_input, pipeline, left_meta, right_meta) -> None:
    """Config-time image/pipeline coherence, mirrored left↔right like the
    reference's second check round (state_machine.check_conf, :950-1008):

    * the matching-cost ``band`` must exist in BOTH images' band names
      (check_band_pipeline, state_machine.py), and multiband images
      require an explicit band;
    * 3SGM geometric priors need their classif/segm/edges input layer on
      the left (and on the right for accurate cross-checking, whose
      mirrored run optimizes the right cost volume too); classif
      ``classes`` must be among the classif band names.
    """
    accurate = pipeline.right_disp_map == "cross_checking_accurate"
    sides = (("left", left_meta), ("right", right_meta))
    for key, step in pipeline.steps:
        family = key.split(".")[0]
        if family == "multiscale":
            # the pyramid rescales the range per level — per-pixel grids
            # cannot ride it (fixed_zoom_pyramid.py:85-87)
            for side in ("left", "right"):
                if isinstance(cfg_input[side].get("disp"), str):
                    raise SchemaError(
                        "Multiscale processing does not accept input disparity grids."
                    )
        if family == "matching_cost":
            band = step.cfg.get("band")
            for side, meta in sides:
                bands = meta.get("band_im") or ()
                if band is not None:
                    if band not in bands:
                        raise SchemaError(
                            f"{key}: band {band!r} not in {side} image bands {tuple(bands)}"
                        )
                elif len(bands) > 1:
                    raise SchemaError(
                        f"{key}: {side} image is multiband {tuple(bands)} — 'band' is required"
                    )
        if family in ("optimization", "semantic_segmentation"):
            prior = step.cfg.get("geometric_prior") or {}
            source = prior.get("source")
            if source in ("classif", "segm", "edges"):
                layer = "classif" if source == "classif" else source
                for side, meta in sides if accurate else sides[:1]:
                    if cfg_input[side].get(layer) is None:
                        raise SchemaError(
                            f"{key}: geometric_prior {source!r} requires input.{side}.{layer}"
                        )
                classes = prior.get("classes")
                if source == "classif" and classes:
                    for side, meta in sides if accurate else sides[:1]:
                        names = meta.get("band_classif") or ()
                        missing = [c for c in classes if c not in names]
                        if missing:
                            raise SchemaError(
                                f"{key}: classes {missing} not in {side} classif bands {tuple(names)}"
                            )


def check_conf(user_cfg: Dict[str, Any]) -> Tuple[Dict[str, Any], "Pipeline"]:
    """Full two-phase validation; returns (validated config with defaults,
    built Pipeline).  The configured rasters must exist on disk — the
    header-level image/disparity/band coherence checks always run, like
    the reference (check_configuration.py:450-473)."""
    from .pipeline import Pipeline

    if "input" not in user_cfg:
        raise SchemaError("missing 'input' section")
    if "pipeline" not in user_cfg:
        raise SchemaError("missing 'pipeline' section")
    cfg_input = check_input_section(user_cfg["input"])
    _check_input_files_exist(cfg_input)
    check_images(cfg_input)
    check_disparities_from_input(cfg_input["left"]["disp"], cfg_input["left"]["img"])
    check_disparities_from_input(cfg_input["right"]["disp"], cfg_input["right"]["img"])
    from .io.raster import read_raster_header

    check_band_names(read_raster_header(cfg_input["left"]["img"])["band_names"])
    check_band_names(read_raster_header(cfg_input["right"]["img"])["band_names"])
    pipeline = Pipeline(user_cfg["pipeline"])

    from .api import get_metadata

    left_meta = get_metadata(
        cfg_input["left"]["img"],
        cfg_input["left"]["disp"],
        classif=cfg_input["left"].get("classif"),
        segm=cfg_input["left"].get("segm"),
        edges=cfg_input["left"].get("edges"),
    )
    right_meta = get_metadata(
        cfg_input["right"]["img"],
        cfg_input["right"]["disp"],
        classif=cfg_input["right"].get("classif"),
        segm=cfg_input["right"].get("segm"),
        edges=cfg_input["right"].get("edges"),
    )
    check_pipeline_metadata(cfg_input, pipeline, left_meta, right_meta)
    out = {
        "input": cfg_input,
        "pipeline": pipeline.validated_cfg,
    }
    if "ROI" in user_cfg:
        out["ROI"] = check_roi_section(user_cfg["ROI"])
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
