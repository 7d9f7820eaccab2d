"""Fused single-program pipelines for benchmarking and deployment.

The step-by-step orchestration in :mod:`pandora_tpu.pipeline` jits each op
separately (convenient for the modular JSON surface).  For production
serving the whole census→SGM→WTA(→vfit→median) path should be ONE XLA
program: no host round-trips, full fusion of the masking/criteria
elementwise work into the scans, one HBM round trip per stage.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import constants as cst
from .ops import sgm as sgm_ops
from .ops.census import census_cost_volume
from .ops.cost_volume import disparity_range
from .ops.filters import median_filter_disparity
from .ops.local_costs import sad_ssd_cost_volume, zncc_cost_volume
from .ops.refinement import refine
from .ops.wta import wta


def stereo_pipeline(
    left: jnp.ndarray,
    right: jnp.ndarray,
    *,
    dmin: int,
    dmax: int,
    subpix: int = 1,
    window_size: int = 5,
    matching_cost: str = "census",
    optimization: Optional[str] = "sgm",
    p1: float = 8.0,
    p2: float = 32.0,
    refinement: Optional[str] = "vfit",
    median_size: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full stereo step as a pure function: (left, right) → (disparity,
    validity_mask).  All config is static."""
    if matching_cost == "census":
        cv = census_cost_volume(
            left, right, dmin, dmax, subpix, window_size, unroll=optimization is None
        )
        type_measure = "min"
    elif matching_cost in ("sad", "ssd"):
        cv = sad_ssd_cost_volume(
            left, right, dmin, dmax, subpix, window_size, matching_cost == "ssd"
        )
        type_measure = "min"
    else:
        cv = zncc_cost_volume(left, right, dmin, dmax, subpix, window_size)
        type_measure = "max"

    if optimization == "sgm":
        cv, _ = sgm_ops.sgm_optimize_volume(
            cv,
            None,
            None,
            jnp.float32(p2),
            type_measure=type_measure,
            use_pallas=sgm_ops.default_use_pallas(),
            p1_const=float(p1),
            p2_const=float(p2),
        )
        type_measure = "min"

    disp_vals = jnp.asarray(disparity_range(dmin, dmax, subpix), jnp.float32)
    disp, vmask, _ = wta(cv, disp_vals, type_measure, jnp.nan, None)

    if refinement in ("vfit", "quadratic"):
        disp, vmask, _ = refine(
            cv, disp, vmask, float(dmin), float(dmax), subpix, type_measure, refinement
        )
    if median_size:
        disp = median_filter_disparity(
            disp, vmask, cst.PANDORA_MSK_PIXEL_INVALID, median_size
        )
    return disp, vmask


def make_jitted_pipeline(**static_cfg):
    """jit-compiled fused pipeline with the config baked in."""
    return jax.jit(partial(stereo_pipeline, **static_cfg))
