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
    left_msk: Optional[jnp.ndarray] = None,
    right_msk: Optional[jnp.ndarray] = None,
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
    sgm_fused_epilogue: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full stereo step as a pure function: (left, right[, masks]) →
    (disparity, validity_mask).  All config is static.

    The validity mask carries the FULL criteria bitmask (border bit 0,
    right-range bits 1/2, input-mask bits 6/7 when masks are given,
    criteria.validity_mask + mask_border) merged with the WTA/refinement
    bits — same 13-bit product as the modular Pipeline.

    ``sgm_fused_epilogue=False`` forces the materializing Σ+WTA+refine
    epilogue instead of the combine-kernel fast path (A/B benchmarking)."""
    from . import criteria

    offset = (window_size - 1) // 2
    vmask0 = criteria.validity_mask(
        dmin,
        dmax,
        offset,
        window_size,
        jnp.zeros(left.shape, jnp.uint8),
        left_msk,
        right_msk,
    )
    vmask0 = criteria.mask_border(vmask0, offset)
    # decide the fused-SGM fast path up front: census can then bake the
    # super-cost sentinel into its masking pass (one less volume round trip)
    n_disp = (dmax - dmin) * subpix + 1
    sgm_fast = False
    if optimization == "sgm":
        from .ops.sgm_pallas import pallas_supported

        sgm_fast = (
            sgm_fused_epilogue
            and sgm_ops.default_use_pallas()
            and pallas_supported((*left.shape, n_disp), None, None, None, False)
        )

    if matching_cost == "census" and sgm_fast:
        # fully fused fast path: the cost volume is built DIRECTLY in the
        # two SGM scan layouts (no intra-tile volume transpose), as uint8
        # when the cost family fits (4x less HBM traffic than f32, exact)
        return _census_sgm_fast_path(
            left, right, dmin, dmax, subpix, window_size, p1, p2,
            refinement, median_size,
        )
    if matching_cost == "census":
        cv = census_cost_volume(
            left,
            right,
            dmin,
            dmax,
            subpix,
            window_size,
            unroll=optimization is None,
        )
        type_measure = "min"
        presubstituted = False
    elif matching_cost in ("sad", "ssd"):
        cv = sad_ssd_cost_volume(
            left, right, dmin, dmax, subpix, window_size, matching_cost == "ssd"
        )
        type_measure = "min"
        presubstituted = False
    else:
        cv = zncc_cost_volume(left, right, dmin, dmax, subpix, window_size)
        type_measure = "max"
        presubstituted = False

    if optimization == "sgm":
        use_pallas = sgm_ops.default_use_pallas()
        if sgm_fast:
            # fused fast path for the non-census cost families: NaN→super-
            # cost, 8-path partials, then one combine kernel doing Σ + WTA
            # + vfit-triplet in VMEM — the aggregated volume never reaches
            # HBM (census rides the even faster layouts path above)
            disp, vmask = _sgm_wta_pallas_path(
                cv,
                type_measure,
                dmin,
                dmax,
                subpix,
                p1,
                p2,
                refinement,
                False,
                presubstituted,
            )
            if median_size:
                disp = median_filter_disparity(
                    disp, vmask, cst.PANDORA_MSK_PIXEL_INVALID, median_size
                )
            return disp, vmask

        cv, _ = sgm_ops.sgm_optimize_volume(
            cv,
            None,
            None,
            jnp.float32(p2),
            type_measure=type_measure,
            use_pallas=use_pallas,
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


# super-cost sentinel for invalid CV entries on the fused Pallas path.
# Valid aggregated totals are bounded by 8·(cmax + P2): census w²≤169 is
# tiny, but SSD on 8-bit imagery reaches 255²·w² ≈ 1.6e6 per entry
# (~1.3e7 over 8 paths), so the sentinel must sit far above any plausible
# cost family.  1e12 keeps f32 math exact where it matters: sentinel
# entries only ever meet valid ones through min()/>= comparisons, and
# same-magnitude sentinel subtractions in the recurrence are exact
# (Sterbenz).  THRESH separates as long as 8·(cmax + P2) < 5e11, i.e.
# per-entry costs up to ~6e10 — any real imagery.
_SUPER = 1.0e12
_THRESH = 5.0e11

# uint8 census volumes: invalid entries hold 255, so 8-path totals of
# invalid entries are >= 8*255 = 2040 while valid ones are <= 8*(cmax+P2);
# gating on 8*(cmax+P2) <= 1600 leaves a >400 margin (far beyond the ±8
# worst-case bf16 rounding of invalid partials)
_U8_THRESH = 1800.0


def _census_sgm_fast_path(
    left, right, dmin, dmax, subpix, window_size, p1, p2, refinement, median_size
):
    """census → 8-path SGM → WTA → refine → median as three Pallas kernels
    plus XLA glue, with the cost volume built directly in both scan
    layouts (uint8 when the cost family fits)."""
    from .ops.census import census_cost_volume_scan_layouts
    from .ops.refinement import refine_from_triplet
    from .ops.sgm_pallas import combine_wta_pallas, sgm_partials_from_layouts

    cmax = float(window_size**2)
    u8_ok = 8.0 * (cmax + float(p2)) <= 1600.0
    dtype = jnp.uint8 if u8_ok else jnp.float32
    threshold = _U8_THRESH if u8_ok else _THRESH
    # bf16 partial volumes are bit-exact when every path cost is an
    # integer <= 256 (integer penalties, census costs <= w², row triples
    # <= 3·(cmax+P2)) — half the HBM traffic for free
    bf16_ok = (
        float(p1).is_integer()
        and float(p2).is_integer()
        and 3 * (cmax + float(p2)) <= 256
    )
    out_dtype = jnp.bfloat16 if bf16_ok else jnp.float32

    cost_rdw, cost_cdh, hwd = census_cost_volume_scan_layouts(
        left, right, dmin, dmax, subpix, window_size, dtype
    )
    parts = sgm_partials_from_layouts(
        cost_rdw, cost_cdh, hwd, float(p1), float(p2), out_dtype=out_dtype
    )
    idx, c0, c1, c2 = combine_wta_pallas(parts, threshold)

    disp = jnp.float32(dmin) + idx.astype(jnp.float32) / jnp.float32(subpix)
    invalid_mc = jnp.isnan(c1)  # every disparity invalid (wta all-NaN rule)
    disp = jnp.where(invalid_mc, jnp.nan, disp)
    vmask = jnp.where(
        invalid_mc, jnp.uint16(cst.PANDORA_MSK_PIXEL_INVALID), jnp.uint16(0)
    )
    if refinement in ("vfit", "quadratic"):
        disp, vmask, _ = refine_from_triplet(
            c0, c1, c2, disp, vmask, float(dmin), float(dmax), subpix, "min", refinement
        )
    if median_size:
        disp = median_filter_disparity(
            disp, vmask, cst.PANDORA_MSK_PIXEL_INVALID, median_size
        )
    return disp, vmask


def _sgm_wta_pallas_path(
    cv,
    type_measure,
    dmin,
    dmax,
    subpix,
    p1,
    p2,
    refinement,
    bf16_partials=False,
    presubstituted=False,
):
    from .ops.refinement import refine_from_triplet
    from .ops.sgm_pallas import combine_wta_pallas, sgm_partials_pallas

    if presubstituted:  # invalid entries already hold the super-cost sentinel
        work = cv
    else:
        work = -cv if type_measure == "max" else cv
        work = jnp.where(jnp.isnan(work), _SUPER, work)
    out_dtype = jnp.bfloat16 if bf16_partials else jnp.float32
    parts = sgm_partials_pallas(work, float(p1), float(p2), out_dtype=out_dtype)
    idx, c0, c1, c2 = combine_wta_pallas(parts, _THRESH)

    disp = jnp.float32(dmin) + idx.astype(jnp.float32) / jnp.float32(subpix)
    invalid_mc = jnp.isnan(c1)  # every disparity invalid (wta all-NaN rule)
    disp = jnp.where(invalid_mc, jnp.nan, disp)
    vmask = jnp.where(
        invalid_mc, jnp.uint16(cst.PANDORA_MSK_PIXEL_INVALID), jnp.uint16(0)
    )
    if refinement in ("vfit", "quadratic"):
        disp, vmask, _ = refine_from_triplet(
            c0, c1, c2, disp, vmask, float(dmin), float(dmax), subpix, "min", refinement
        )
    return disp, vmask


def make_jitted_pipeline(**static_cfg):
    """jit-compiled fused pipeline with the config baked in."""
    return jax.jit(partial(stereo_pipeline, **static_cfg))
