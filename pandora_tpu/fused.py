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
    global_bounds=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full stereo step as a pure function: (left, right[, masks]) →
    (disparity, validity_mask).  All config is static.

    The validity mask carries the FULL criteria bitmask (border bit 0,
    right-range bits 1/2, input-mask bits 6/7 when masks are given,
    criteria.validity_mask + mask_border) merged with the WTA/refinement
    bits — same 13-bit product as the modular Pipeline.

    ``sgm_fused_epilogue=False`` forces the materializing Σ+WTA+refine
    epilogue instead of the combine-kernel fast path (A/B benchmarking).

    ``global_bounds = (row0, col0, H, W)``: the input is a halo-extended
    TILE of an H×W scene starting at (row0, col0) (traced per-shard
    scalars; H/W static).  Criteria bits and cost-volume validity are then
    keyed to the SCENE bounds, so scene-edge tiles reproduce the untiled
    program exactly (input masks unsupported in this mode)."""
    from . import criteria
    from .ops import cost_volume as cv_ops

    offset = (window_size - 1) // 2
    if global_bounds is not None:
        assert left_msk is None and right_msk is None
    # the reference always materializes (2, row, col) disparity grids
    # (img_tools.add_disparity), so the bit-12 variable-range check runs
    # whenever the right image is masked, even for constant pairs
    # (criteria.py:155-158) — mirror that with constant grids
    grid_min = grid_max = None
    if right_msk is not None:
        grid_min = jnp.full(left.shape, float(dmin), jnp.float32)
        grid_max = jnp.full(left.shape, float(dmax), jnp.float32)
    vmask0 = criteria.validity_mask(
        dmin,
        dmax,
        offset,
        window_size,
        jnp.zeros(left.shape, jnp.uint8),
        left_msk,
        right_msk,
        grid_min,
        grid_max,
        col0=None if global_bounds is None else global_bounds[1],
        n_col_global=None if global_bounds is None else global_bounds[3],
    )
    # NOTE: mask_border is applied AFTER the all-NaN bit-1 pass below,
    # matching the modular _compute_cv ordering (steps/matching_cost.py).
    # decide the fused-SGM fast path up front: census can then bake the
    # super-cost sentinel into its masking pass (one less volume round trip)
    n_disp = (dmax - dmin) * subpix + 1
    sgm_fast = False
    if optimization == "sgm":
        from .ops.sgm_pallas import pallas_supported

        sgm_fast = (
            sgm_fused_epilogue
            and (sgm_ops.default_use_pallas() or _INTERPRET)
            and pallas_supported((*left.shape, n_disp), None, None, None, False)
        )

    if matching_cost == "census" and sgm_fast:
        # fully fused fast path: the cost volume is built DIRECTLY in the
        # two SGM scan layouts (no intra-tile volume transpose), as uint8
        # when the cost family fits (4x less HBM traffic than f32, exact);
        # input-mask invalidation is baked into the census sentinel pass
        return _census_sgm_fast_path(
            left, right, left_msk, right_msk, vmask0, dmin, dmax, subpix,
            window_size, p1, p2, refinement, median_size, global_bounds,
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
    elif matching_cost in ("sad", "ssd"):
        cv = sad_ssd_cost_volume(
            left, right, dmin, dmax, subpix, window_size, matching_cost == "ssd"
        )
        type_measure = "min"
    else:
        cv = zncc_cost_volume(left, right, dmin, dmax, subpix, window_size)
        type_measure = "max"
    if global_bounds is not None:
        # entries whose support crosses the TRUE scene bounds are never
        # written by the untiled program — scene-edge tiles must match
        cv = criteria.mask_cv_global_bounds(
            cv, dmin, dmax, subpix, offset, global_bounds
        )
    presubstituted = False
    disp_vals = jnp.asarray(disparity_range(dmin, dmax, subpix), jnp.float32)

    # cv_masked (matching_cost.py:770-872): NaN the costs built from
    # input-masked pixels, so they can never win WTA
    if left_msk is not None or right_msk is not None:
        left_mask = cv_ops.masks_dilatation(left_msk, left.shape, window_size, subpix)[0]
        right_masks = cv_ops.masks_dilatation(right_msk, right.shape, window_size, subpix)
        cv = cv_ops.apply_cv_masks(
            cv, left_mask, right_masks, disp_vals, None, None, dmin, dmax, subpix
        )
    vmask0 = criteria.mask_invalid_variable_disparity_range(cv, vmask0)
    vmask0 = criteria.mask_border(vmask0, offset, bounds=global_bounds)

    if optimization == "sgm":
        use_pallas = sgm_ops.default_use_pallas()
        if sgm_fast:
            # fused fast path for the non-census cost families: NaN→super-
            # cost, 8-path partials, then one combine kernel doing Σ + WTA
            # + vfit-triplet in VMEM — the aggregated volume never reaches
            # HBM (census rides the even faster layouts path above)
            disp, vmask = _sgm_wta_pallas_path(
                cv,
                vmask0,
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

    disp, vmask, _ = wta(cv, disp_vals, type_measure, jnp.nan, vmask0)

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

# uint8 PARTIAL volumes: row triples of invalid lines wrap to 253
# (3*255 = 765 mod 256, sgm_pallas._store_cast bounded path), col singles
# stay 255, so invalid totals are >= 2*253 + 2*255 = 1016 while valid
# ones stay <= 8*(cmax+P2) <= 677 under the u8-partials gate
# 3*(cmax+P2) <= 254
_U8P_THRESH = 900.0


# test hook: interpret-mode Pallas on CPU (tests/conftest forces 8 virtual
# CPU devices; setting this True exercises the fused fast paths there)
_INTERPRET = False


def _invalid_bool(msk, window_size):
    """Input mask → bool invalid plane, the masks_dilatation convention
    (matching_cost.py:484-602): invalid where the user's mask flags the
    pixel, or a window around it contains nodata."""
    from .criteria import binary_dilation_msk

    if msk is None:
        return None
    invalid = (msk != 0) & (msk != 1)
    return invalid | binary_dilation_msk(msk == 1, window_size)


def _finish_vmask(vmask0, invalid_mc, offset, global_bounds=None):
    """Replicate the modular pipeline's mask flow after WTA-equivalent
    invalid detection: all-invalid lanes get bit 1 if unflagged
    (criteria.mask_invalid_variable_disparity_range), the border ring is
    overwritten with bit 0 (criteria.mask_border), and wta()'s overwrite
    rule runs last (disparity.py:468-474)."""
    from .criteria import mask_border

    bit1 = jnp.uint16(cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING)
    vm = jnp.where(
        invalid_mc & ((vmask0 & bit1) == 0), vmask0 + bit1, vmask0
    ).astype(jnp.uint16)
    vm = mask_border(vm, offset, bounds=global_bounds)
    newly = invalid_mc & ((vm & cst.PANDORA_MSK_PIXEL_INVALID) == 0)
    return jnp.where(newly, jnp.uint16(cst.PANDORA_MSK_PIXEL_INVALID), vm)


def _census_sgm_fast_path(
    left, right, left_msk, right_msk, vmask0, dmin, dmax, subpix, window_size,
    p1, p2, refinement, median_size, global_bounds=None,
):
    """census → 8-path SGM → WTA → refine → median as three Pallas kernels
    plus XLA glue, with the cost volume built directly in both scan
    layouts (uint8 when the cost family fits).  Input-mask invalidation
    rides the census sentinel pass; ``vmask0`` is the criteria mask
    (pre-border) merged into the output exactly like the modular path."""
    from .ops.census import census_cost_volume_scan_layouts
    from .ops.refinement import refine_from_triplet
    from .ops.sgm_pallas import combine_wta_pallas, sgm_partials_from_layouts

    cmax = float(window_size**2)
    u8_ok = 8.0 * (cmax + float(p2)) <= 1600.0
    dtype = jnp.uint8 if u8_ok else jnp.float32
    int_pen = float(p1).is_integer() and float(p2).is_integer()
    # partial-volume dtype ladder (all bit-exact under their gates):
    # * uint8: directional sums clamp to 255 — 4x less HBM than f32;
    #   needs integer penalties, u8 costs and 3*(cmax+P2) <= 254 so valid
    #   row triples never clamp
    # * bf16: integers <= 256 are exact — 2x less HBM than f32
    u8p_ok = u8_ok and int_pen and 3 * (cmax + float(p2)) <= 254
    bf16_ok = int_pen and 3 * (cmax + float(p2)) <= 256
    if u8p_ok:
        out_dtype, threshold = jnp.uint8, _U8P_THRESH
    elif u8_ok:
        out_dtype = jnp.bfloat16 if bf16_ok else jnp.float32
        threshold = _U8_THRESH
    else:
        out_dtype, threshold = jnp.float32, _THRESH

    cost_rdw, cost_cdh, hwd = census_cost_volume_scan_layouts(
        left, right, dmin, dmax, subpix, window_size, dtype,
        left_invalid=_invalid_bool(left_msk, window_size),
        right_invalid=_invalid_bool(right_msk, window_size),
        interpret=_INTERPRET,
    )
    if global_bounds is not None:
        # sentinel-invalidate entries whose support crosses the TRUE scene
        # bounds, in both scan layouts (cheap elementwise pass; same
        # predicate as the lax path via criteria.global_support_masks)
        from .criteria import global_support_masks

        sentinel = 255 if dtype == jnp.uint8 else _SUPER
        h8, d8, w8 = cost_rdw.shape
        rows_ok, cd_ok = global_support_masks(
            dmin, subpix, (window_size - 1) // 2, global_bounds, h8, w8, d8
        )
        ok_rdw = rows_ok[:, None, None] & cd_ok.T[None, :, :]  # (H8, D8, W8)
        cost_rdw = jnp.where(ok_rdw, cost_rdw, jnp.asarray(sentinel, cost_rdw.dtype))
        ok_cdh = jnp.transpose(ok_rdw, (2, 1, 0))[: cost_cdh.shape[0], :, : cost_cdh.shape[2]]
        cost_cdh = jnp.where(ok_cdh, cost_cdh, jnp.asarray(sentinel, cost_cdh.dtype))
    # block=16 halves the grid-step count of the scan passes (measured
    # ~8% faster than 8, scripts/sweep_kernels.py; 32 regresses)
    parts = sgm_partials_from_layouts(
        cost_rdw, cost_cdh, hwd, float(p1), float(p2), out_dtype=out_dtype,
        interpret=_INTERPRET, block=16,
    )
    idx, c0, c1, c2 = combine_wta_pallas(parts, threshold, interpret=_INTERPRET)

    disp = jnp.float32(dmin) + idx.astype(jnp.float32) / jnp.float32(subpix)
    invalid_mc = jnp.isnan(c1)  # every disparity invalid (wta all-NaN rule)
    disp = jnp.where(invalid_mc, jnp.nan, disp)
    vmask = _finish_vmask(vmask0, invalid_mc, (window_size - 1) // 2, global_bounds)
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
    vmask0,
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
    parts = sgm_partials_pallas(
        work, float(p1), float(p2), out_dtype=out_dtype, interpret=_INTERPRET
    )
    idx, c0, c1, c2 = combine_wta_pallas(parts, _THRESH, interpret=_INTERPRET)

    disp = jnp.float32(dmin) + idx.astype(jnp.float32) / jnp.float32(subpix)
    invalid_mc = jnp.isnan(c1)  # every disparity invalid (wta all-NaN rule)
    disp = jnp.where(invalid_mc, jnp.nan, disp)
    if vmask0 is None:
        vmask0 = jnp.zeros(disp.shape, jnp.uint16)
    # vmask0 already carries bit 1 / border from the caller's
    # mask_invalid_variable_disparity_range + mask_border pass; wta()'s
    # overwrite rule is all that remains (a no-op when those bits are set)
    newly = invalid_mc & ((vmask0 & cst.PANDORA_MSK_PIXEL_INVALID) == 0)
    vmask = jnp.where(newly, jnp.uint16(cst.PANDORA_MSK_PIXEL_INVALID), vmask0)
    if refinement in ("vfit", "quadratic"):
        disp, vmask, _ = refine_from_triplet(
            c0, c1, c2, disp, vmask, float(dmin), float(dmax), subpix, "min", refinement
        )
    return disp, vmask


def make_jitted_pipeline(**static_cfg):
    """jit-compiled fused pipeline with the config baked in."""
    return jax.jit(partial(stereo_pipeline, **static_cfg))
