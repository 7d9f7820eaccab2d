"""Tiled SGM with boundary-STATE exchange (SURVEY §2.5's "segmented SGM
with boundary reduction" — the scan-parallel alternative to the
replication halo of :mod:`pandora_tpu.parallel.tiling`).

The replication scheme extends every tile by the full SGM influence
margin (40 px, marge.py:86-89) plus disparity reach and RECOMPUTES the
whole pipeline inside the halo — O(halo · tile_height) redundant work for
all 8 scan directions, census, WTA and filters.  This module instead:

1. exchanges only the small matching-cost halo ``win/2 + max|disp|``
   (needed by any scheme for census windows and right-image gathers),
2. runs each tile's 8-path scans on its OWN columns (sweep 1, path
   restarts at tile edges — the untiled program restarted at scene edges
   behaves identically after 40 px by the reference's influence
   truncation),
3. ``ppermute``s the per-direction boundary L-state across the mesh:
   for the horizontal pass the carry entering the neighbor is one
   (H, D) slice per direction (the last column of the directional L
   volume); for the row pass (whose ±1-column diagonal channels couple
   tiles laterally) it is the per-row per-channel L history of the edge
   column — an (H, 6, D) tensor,
4. re-sweeps only an ``influence``-wide band per tile edge, injecting
   the received state at a virtual edge lane each row (diagonals) or as
   the initial scan carry (horizontals) — the tile's own interior
   histories seal the band's inner edge, so every band column is exact,
5. patches the band back into the directional sums before WTA.

Redundant compute is O(influence · boundary) for the scans and ZERO for
census/WTA/refinement (vs O((influence + |disp| + win) · tile_extent) for
everything under replication).  Where the reference's 40 px contract
gives exact convergence (natural images — the same premise
tests/test_tiling.py pins for the replication scheme), tiled == untiled
bit-exactly on the interior; see tests/test_sgm_exchange.py.

Fidelity is governed by ``influence``: 40 is the reference's published
contract (marge.py:86-89); raising it to the replication scheme's halo
width reproduces that scheme's bit-exactness on cones while keeping the
O(influence · boundary) redundancy.  The contract presumes penalties
scaled to the cost range — a P2 far above the data term's dynamic range
(e.g. census-scale 32 against zncc's [-1, 1] costs) makes smoothing
dominate and influence travel arbitrarily far, breaking ANY fixed margin
(replication halos included).

This build ships the 1-D column-mesh instantiation on the lax-scan
backend.  The Pallas scan kernels implement the SAME hooks
(``ops/sgm_pallas._run_pass``: ``init_carry`` / ``want_final`` /
``edge_cols`` / ``inj_lanes``) — pinned bit-equal to the lax hooks in
interpret mode (tests/test_sgm_pallas.py::test_exchange_hooks_*) and
compile-gated on real TPU
(tests/test_tpu_hw.py::test_exchange_hooks_compile_and_match_lax) — so
wiring this orchestration onto the uint8 kernel path on a multi-chip TPU
slice is a drop-in swap of the scan calls.  Reference contract:
marge.py:85-106, optimization.py:43.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import constants as cst
from ..fused import _SUPER
from ..ops import sgm as sgm_ops
from ..ops.cost_volume import disparity_range
from ..ops.filters import median_filter_disparity
from ..ops.refinement import refine
from ..ops.wta import wta
from .tiling import _exchange_halo

# emitted edge-history column ordering (sweep 1): outer-lo, inner-lo,
# inner-hi, outer-hi
_E_LO, _E_ILO, _E_IHI, _E_HI = range(4)


def _row_pen(p1, p2):
    return (
        jnp.full((6, 1, 1), p1, jnp.float32),
        jnp.full((6, 1, 1), p2, jnp.float32),
    )


def _col_pen(p1, p2):
    return (
        jnp.full((2, 1, 1), p1, jnp.float32),
        jnp.full((2, 1, 1), p2, jnp.float32),
    )


def _arrange_hist(hist):
    """(H, 6, D) edge history in PHYSICAL row order → the row scan's
    native channel order (channels 0-2 normal rows, 3-5 flipped rows)."""
    return jnp.concatenate([hist[:, :3], hist[::-1, 3:]], axis=1)


def _sweep1(work, n_disp, p1, p2, band):
    """Tile-local 8-path scans + boundary histories.

    work: (H, W, D) finite costs.  Returns (row_norm, row_flip_unflipped,
    col_norm_vol (W, H, D), col_flip_vol (W, H, D) in scan order, edges
    (H, 6, 4, D) in physical row order)."""
    h, w, _ = work.shape
    edge_cols = (0, band, w - 1 - band, w - 1)
    ys_r = sgm_ops._row_scan(
        jnp.stack([work, work[::-1]]), _row_pen(p1, p2), None, None, n_disp,
        False, edge_cols=edge_cols,
    )
    ys_c = sgm_ops._col_scan(
        jnp.stack([work, work[:, ::-1]]), _col_pen(p1, p2), None, None, n_disp,
        False,
    )
    # edges: (H, 6, 4, D) — channels 3-5 rows are in flipped order; undo
    edges = ys_r["edges"]
    edges = jnp.concatenate([edges[:, :3], edges[::-1, 3:]], axis=1)
    return ys_r["norm"], ys_r["flip"][::-1], ys_c["norm"], ys_c["flip"], edges


def _row_band_resweep(work_band, n_disp, p1, p2, inj_outer, inj_inner, outer_side):
    """Re-sweep one row-pass band with both edges injected.

    work_band: (H, B, D) tile costs of the band columns; two virtual lanes
    are added (outer, inner).  inj_*: (H, 6, D) physical-row histories for
    the virtual lanes.  Returns (norm, flip) partial sums over the band's
    REAL columns, physical row order."""
    h, b, d = work_band.shape
    super_col = jnp.full((h, 1, d), _SUPER, work_band.dtype)
    if outer_side == "lo":  # band = tile cols [0, B): virtual outer at lane 0
        ext = jnp.concatenate([super_col, work_band, super_col], axis=1)
        lanes, real = (0, b + 1), slice(1, b + 1)
        inj = jnp.stack([_arrange_hist(inj_outer), _arrange_hist(inj_inner)], axis=1)
    else:  # band = tile cols [W-B, W): virtual outer at lane B+1
        ext = jnp.concatenate([super_col, work_band, super_col], axis=1)
        lanes, real = (0, b + 1), slice(1, b + 1)
        inj = jnp.stack([_arrange_hist(inj_inner), _arrange_hist(inj_outer)], axis=1)
    ys = sgm_ops._row_scan(
        jnp.stack([ext, ext[::-1]]), _row_pen(p1, p2), None, None, n_disp,
        False, inj_lanes=lanes, inj=inj,
    )
    return ys["norm"][:, real], ys["flip"][::-1][:, real]


def _col_band_resweep(work, band, n_disp, p1, p2, carry_l2r, carry_r2l):
    """Re-sweep the horizontal pass over both edge bands at once: the
    normal channel runs left→right over cols [0, band) seeded with the
    left neighbor's outgoing carry; the flipped channel runs right→left
    over cols [W-band, W) seeded with the right neighbor's.

    Returns (l2r (band, H, D) physical col order from 0, r2l (band, H, D)
    in scan order from col W-1 leftward)."""
    left_band = work[:, :band]
    right_band_flipped = work[:, -band:][:, ::-1]
    init = jnp.stack([carry_l2r, carry_r2l])
    ys = sgm_ops._col_scan(
        jnp.stack([left_band, right_band_flipped]), _col_pen(p1, p2), None,
        None, n_disp, False, init_l=init,
    )
    return ys["norm"], ys["flip"]


def _shift_from(x, axis_name, direction, fill):
    """Receive x from the lower (direction=+1) or upper (-1) mesh
    neighbor; mesh-edge shards receive ``fill``."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    if direction > 0:  # from lower neighbor
        recv = jax.lax.ppermute(x, axis_name, [(i, i + 1) for i in range(n - 1)])
        edge = idx == 0
    else:
        recv = jax.lax.ppermute(x, axis_name, [(i + 1, i) for i in range(n - 1)])
        edge = idx == n - 1
    return jnp.where(edge, jnp.full_like(recv, fill), recv)


def exchange_tiled_stereo_pipeline(
    mesh: Mesh,
    *,
    dmin: int,
    dmax: int,
    subpix: int = 1,
    window_size: int = 5,
    matching_cost: str = "census",
    p1: float = 8.0,
    p2: float = 32.0,
    refinement: Optional[str] = "vfit",
    median_size: int = 0,
    influence: int = 40,
):
    """Build a jitted (batch, rows, cols) ×2 → (disparity, validity)
    function over a ``("data", "tile")`` column mesh using SGM
    boundary-state exchange instead of a replication halo.

    Interface-compatible with :func:`tiling.tiled_stereo_pipeline` for the
    census/sad/ssd/zncc + SGM(constant penalties) configurations."""
    from .. import criteria
    from ..ops.census import census_cost_volume
    from ..ops.local_costs import sad_ssd_cost_volume, zncc_cost_volume

    offset = (window_size - 1) // 2
    fm = median_size // 2
    hm = offset + max(abs(dmin), abs(dmax))
    n_disp = (dmax - dmin) * subpix + 1
    axis = "tile"

    def build_cv(left_ext, right_ext):
        if matching_cost == "census":
            cv = census_cost_volume(left_ext, right_ext, dmin, dmax, subpix, window_size)
            measure = "min"
        elif matching_cost in ("sad", "ssd"):
            cv = sad_ssd_cost_volume(
                left_ext, right_ext, dmin, dmax, subpix, window_size,
                matching_cost == "ssd",
            )
            measure = "min"
        else:
            cv = zncc_cost_volume(left_ext, right_ext, dmin, dmax, subpix, window_size)
            measure = "max"
        return cv, measure

    def prep_tile(left_ext, right_ext, w, ch, col0, w_global):
        """Cost volume + validity on the halo-extended block, cropped to
        the tile's own columns (mirrors fused.stereo_pipeline's ordering).
        Criteria bits and cost validity are keyed to the GLOBAL scene
        bounds so scene-edge tiles match the untiled program.

        ``ch`` is the halo ACTUALLY exchanged (clamped to the shard width
        for tiny dry-run shapes) — the crop offset must match it, not the
        nominal ``hm``."""
        bounds = (0, col0, left_ext.shape[0], w_global)
        vmask0 = criteria.validity_mask(
            dmin, dmax, offset, window_size,
            jnp.zeros(left_ext.shape, jnp.uint8), None, None, None, None,
            col0=col0, n_col_global=w_global,
        )
        cv, measure = build_cv(left_ext, right_ext)
        cv = criteria.mask_cv_global_bounds(cv, dmin, dmax, subpix, offset, bounds)
        vmask0 = criteria.mask_invalid_variable_disparity_range(cv, vmask0)
        vmask0 = criteria.mask_border(vmask0, offset, bounds=bounds)
        cv = jax.lax.dynamic_slice_in_dim(cv, ch, w, axis=1)
        vmask0 = jax.lax.dynamic_slice_in_dim(vmask0, ch, w, axis=1)
        work = -cv if measure == "max" else cv
        invalid = jnp.isnan(work)
        work = jnp.where(invalid, _SUPER, work)
        return work, invalid, vmask0

    def per_shard(left, right):
        # left/right: (local_batch, rows, local_cols)
        w = left.shape[-1]
        band = min(influence, max(w // 2 - 1, 1))
        ch = min(hm, w)
        left_ext = _exchange_halo(left, ch, -1, axis)
        right_ext = _exchange_halo(right, ch, -1, axis)

        col0 = jax.lax.axis_index(axis) * w - ch
        w_global = w * jax.lax.axis_size(axis)
        work, invalid, vmask0 = jax.vmap(
            partial(prep_tile, w=w, ch=ch, col0=col0, w_global=w_global)
        )(left_ext, right_ext)

        # ---- sweep 1: tile-local scans + boundary histories ----------------
        row_n, row_f, col_n, col_f, edges = jax.vmap(
            partial(_sweep1, n_disp=n_disp, p1=p1, p2=p2, band=band)
        )(work)

        # ---- boundary-state exchange over ICI ------------------------------
        # row-pass edge histories: my col W-1 history feeds the right
        # neighbor's outer-lo lane; my col 0 history the left neighbor's
        # outer-hi lane.  The horizontal carries are single (H, D) slices.
        inf = jnp.inf
        hist_from_left = _shift_from(edges[:, :, :, _E_HI], axis, +1, inf)
        hist_from_right = _shift_from(edges[:, :, :, _E_LO], axis, -1, inf)
        carry_l2r = _shift_from(col_n[:, -1], axis, +1, inf)  # (B, H, D)
        carry_r2l = _shift_from(col_f[:, -1], axis, -1, inf)

        # ---- band re-sweeps ------------------------------------------------
        rowL_n, rowL_f = jax.vmap(
            partial(_row_band_resweep, n_disp=n_disp, p1=p1, p2=p2, outer_side="lo")
        )(work[:, :, :band], inj_outer=hist_from_left, inj_inner=edges[:, :, :, _E_ILO])
        rowR_n, rowR_f = jax.vmap(
            partial(_row_band_resweep, n_disp=n_disp, p1=p1, p2=p2, outer_side="hi")
        )(work[:, :, -band:], inj_outer=hist_from_right, inj_inner=edges[:, :, :, _E_IHI])
        colL, colR = jax.vmap(
            partial(_col_band_resweep, band=band, n_disp=n_disp, p1=p1, p2=p2)
        )(work, carry_l2r=carry_l2r, carry_r2l=carry_r2l)

        # ---- patch + total -------------------------------------------------
        def patch_cols(vol, lo, hi):
            mid = vol[:, :, band : w - band]
            return jnp.concatenate([lo, mid, hi], axis=2)

        row_n = patch_cols(row_n, rowL_n, rowR_n)
        row_f = patch_cols(row_f, rowL_f, rowR_f)
        col_nv = jnp.moveaxis(col_n, 1, 2)  # (B, H, W, D)
        col_fv = jnp.moveaxis(col_f, 1, 2)[:, :, ::-1]
        col_nv = patch_cols(col_nv, jnp.moveaxis(colL, 1, 2), col_nv[:, :, -band:])
        col_fv = patch_cols(col_fv, col_fv[:, :, :band], jnp.moveaxis(colR, 1, 2)[:, :, ::-1])

        total = row_n + row_f + col_nv + col_fv
        total = jnp.where(invalid, jnp.nan, total)

        # ---- epilogue ------------------------------------------------------
        disp_vals = jnp.asarray(disparity_range(dmin, dmax, subpix), jnp.float32)

        def finish(tot, vm0):
            disp, vm, _ = wta(tot, disp_vals, "min", jnp.nan, vm0)
            if refinement in ("vfit", "quadratic"):
                disp, vm, _ = refine(
                    tot, disp, vm, float(dmin), float(dmax), subpix, "min", refinement
                )
            return disp, vm

        disp, vmask = jax.vmap(finish)(total, vmask0)
        if median_size and fm:
            disp_ext = _exchange_halo(disp, fm, -1, axis)
            vm_ext = _exchange_halo(vmask, fm, -1, axis)
            filtered = jax.vmap(
                lambda d, v: median_filter_disparity(
                    d, v, cst.PANDORA_MSK_PIXEL_INVALID, median_size
                )
            )(disp_ext, vm_ext)[:, :, fm:-fm]
            # the untiled nanmedian keeps INPUT values closer than fm to
            # the array border (median.py:148-175); restore them on the
            # scene-edge ring, where the zero-filled halo would otherwise
            # pollute the window (rows are unsharded: the array's own row
            # borders coincide with the scene's)
            gcol = col0 + ch + jnp.arange(w)
            ring = (gcol < fm) | (gcol >= w_global - fm)
            disp = jnp.where(ring[None, None, :], disp, filtered)
        elif median_size:
            disp = jax.vmap(
                lambda d, v: median_filter_disparity(
                    d, v, cst.PANDORA_MSK_PIXEL_INVALID, median_size
                )
            )(disp, vmask)
        return disp, vmask

    spec = P("data", None, "tile")
    shard_fn = jax.shard_map(
        per_shard, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
        check_vma=False,
    )
    return jax.jit(shard_fn)
