"""Spatially tiled stereo pipeline with halo exchange over the device mesh.

TPU-native replacement for the reference's host-side ROI/margins scale-out
hooks (img_tools.get_window, GlobalMargins — SURVEY §2.5): the scene is
sharded over the mesh's spatial axes; before compute each shard gathers a
halo from its neighbors via ``lax.ppermute`` (ICI), runs the fused
census→SGM→WTA pipeline on the extended block, and crops the halo away.

Halo widths follow the reference's tiling contract (marge.py:85-106):

* columns: matching-cost half window + the 40 px SGM influence truncation
  (marge.py:86-89) + ``max(|disp|)`` for the right-image column gathers;
* rows: half window + the 40 px SGM truncation (no disparity reach — the
  pair is rectified, disparity shifts are purely horizontal).

Within that contract the tiled result equals the untiled one everywhere
further than one halo from a scene edge (scene-edge halos are zero-filled,
whereas the untiled program sees true image borders — exactly the
approximation the reference accepts when CARS tiles a scene).

Mesh layouts (``make_mesh`` / ``make_mesh2d``):

* ``("data", "tile")`` — batch of pairs × column tiling;
* ``("data", "row", "col")`` — batch × 2-D spatial tiling.

The ``data`` axis shards a leading batch-of-pairs dimension (pure data
parallelism over DCN for multi-host; no communication).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fused import stereo_pipeline
from ..margins import SGM_MARGINS


def _exchange_halo(x: jnp.ndarray, halo: int, axis: int, axis_name: str) -> jnp.ndarray:
    """Extend array axis ``axis`` with ``halo`` elements from each mesh
    neighbor along ``axis_name``; scene-edge shards get zero fill."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    lo_slice = [slice(None)] * x.ndim
    hi_slice = [slice(None)] * x.ndim
    lo_slice[axis] = slice(None, halo)
    hi_slice[axis] = slice(-halo, None)
    lo_edge = x[tuple(lo_slice)]
    hi_edge = x[tuple(hi_slice)]
    # receive from the lower neighbor its high edge, and vice versa
    from_lo = jax.lax.ppermute(hi_edge, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_hi = jax.lax.ppermute(lo_edge, axis_name, [(i + 1, i) for i in range(n - 1)])
    from_lo = jnp.where(idx == 0, jnp.zeros_like(from_lo), from_lo)
    from_hi = jnp.where(idx == n - 1, jnp.zeros_like(from_hi), from_hi)
    return jnp.concatenate([from_lo, x, from_hi], axis=axis)


def halo_width(
    dmin: int, dmax: int, window_size: int, use_sgm: bool, filter_margin: int = 0,
    sgm_margin: Optional[int] = None,
) -> int:
    """Column halo: half window + disparity reach (the zone whose cost
    support is incomplete at a block edge), + the SGM influence margin
    (the reference's 40 px truncation by default), + the spatial reach of
    post-WTA filters (which read halo-column disparities)."""
    halo = (window_size - 1) // 2 + max(abs(dmin), abs(dmax))
    if use_sgm:
        halo += SGM_MARGINS.left if sgm_margin is None else sgm_margin
    return halo + filter_margin


def row_halo_width(
    window_size: int, use_sgm: bool, filter_margin: int = 0,
    sgm_margin: Optional[int] = None,
) -> int:
    """Row halo: half window (border-invalid zone) + SGM influence margin
    + post-WTA filter reach (no disparity reach — shifts are horizontal).

    Near heavy invalid runs (e.g. the NaN wedge at a scene's disparity-
    reach edge) SGM influence decays slower than the 40 px contract;
    raising ``sgm_margin`` to ~100 makes 2-D tiling bit-exact against
    untiled on cones (tests/test_tiling.py)."""
    halo = (window_size - 1) // 2
    if use_sgm:
        halo += SGM_MARGINS.up if sgm_margin is None else sgm_margin
    return halo + filter_margin


def tiled_stereo_pipeline(
    mesh: Mesh,
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
    sgm_margin: Optional[int] = None,
):
    """Build a jitted function (batch, rows, cols) ×2 → (disparity, validity)
    sharded over the mesh.

    Supports the ``("data", "tile")`` mesh (column tiling; inputs sharded
    P("data", None, "tile")) and the ``("data", "row", "col")`` mesh (2-D
    tiling; inputs sharded P("data", "row", "col")).  Per-shard extents must
    divide the global ones.  ``sgm_margin`` overrides the 40 px influence
    truncation (fidelity/redundancy knob; see row_halo_width).
    """
    two_d = "row" in mesh.axis_names and "col" in mesh.axis_names
    col_axis = "col" if two_d else "tile"
    filter_margin = median_size // 2
    col_halo = halo_width(
        dmin, dmax, window_size, optimization == "sgm", filter_margin, sgm_margin
    )
    row_halo = (
        row_halo_width(window_size, optimization == "sgm", filter_margin, sgm_margin)
        if two_d
        else 0
    )

    def per_shard(left, right):
        # left/right: (local_batch, local_rows, local_cols)
        # a halo cannot exceed one shard extent (ppermute reaches direct
        # neighbors only) — tiny dry-run shapes clamp it
        ch = min(col_halo, left.shape[-1])
        rh = min(row_halo, left.shape[-2])
        left_ext = _exchange_halo(left, ch, -1, col_axis)
        right_ext = _exchange_halo(right, ch, -1, col_axis)
        if two_d and rh:
            left_ext = _exchange_halo(left_ext, rh, -2, "row")
            right_ext = _exchange_halo(right_ext, rh, -2, "row")

        # GLOBAL scene coordinates of the extended block: criteria bits
        # and cost validity are keyed to the true scene bounds, so
        # scene-edge tiles reproduce the untiled program exactly (no
        # zero-fill artifacts; the halo beyond the scene is sentinel-
        # invalidated, which equals the untiled restart-at-border)
        col0 = jax.lax.axis_index(col_axis) * left.shape[-1] - ch
        w_global = left.shape[-1] * jax.lax.axis_size(col_axis)
        if two_d and rh:
            row0 = jax.lax.axis_index("row") * left.shape[-2] - rh
            h_global = left.shape[-2] * jax.lax.axis_size("row")
        else:
            row0, h_global = 0, left.shape[-2]

        run = partial(
            stereo_pipeline,
            dmin=dmin,
            dmax=dmax,
            subpix=subpix,
            window_size=window_size,
            matching_cost=matching_cost,
            optimization=optimization,
            p1=p1,
            p2=p2,
            refinement=refinement,
            median_size=median_size,
            global_bounds=(row0, col0, h_global, w_global),
        )
        disp, vmask = jax.vmap(run)(left_ext, right_ext)
        if two_d and rh:
            disp, vmask = disp[..., rh:-rh, :], vmask[..., rh:-rh, :]
        return disp[..., ch:-ch], vmask[..., ch:-ch]

    spec = P("data", "row", "col") if two_d else P("data", None, "tile")
    # check_vma=False: scan carries inside the per-shard pipeline start as
    # unvarying literals, which trips the varying-manual-axes check
    shard_fn = jax.shard_map(
        per_shard, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec), check_vma=False
    )
    return jax.jit(shard_fn)
