"""Spatially tiled stereo pipeline with halo exchange over the device mesh.

TPU-native replacement for the reference's host-side ROI/margins scale-out
hooks (img_tools.get_window, GlobalMargins — SURVEY §2.5): the scene is
sharded column-wise over the ``tile`` mesh axis; before compute each shard
gathers a halo from its neighbors via ``lax.ppermute`` (ICI), runs the
fused census→SGM→WTA pipeline on the extended block, and crops the halo
away.  Halo width = matching-cost window margin + the reference's 40 px SGM
influence truncation + ``max(|disp|)`` for the right-image column gathers —
so the tiled result matches the untiled one everywhere the reference's own
tiling contract (margins + truncated SGM influence) guarantees it.

The ``data`` mesh axis shards a leading batch-of-pairs dimension (pure data
parallelism, no communication).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fused import stereo_pipeline
from ..margins import SGM_MARGINS


def _exchange_col_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Extend a (..., rows, cols) shard with ``halo`` columns from each
    neighbor along the mesh axis; scene-edge shards get zero fill."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    left_edge = x[..., :, :halo]
    right_edge = x[..., :, -halo:]
    # receive from the left neighbor its right edge, and vice versa
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=-1)


def halo_width(dmin: int, dmax: int, window_size: int, use_sgm: bool) -> int:
    """Column halo: half window + SGM 40 px margin + disparity reach."""
    halo = (window_size - 1) // 2
    if use_sgm:
        halo += SGM_MARGINS.left
    return halo + max(abs(dmin), abs(dmax))


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
):
    """Build a jitted function (batch, rows, cols) x2 → (disparity, validity)
    sharded over the ("data", "tile") mesh.

    Input batches must be sharded with P("data", None, "tile"); cols must be
    divisible by the tile axis size.
    """
    halo = halo_width(dmin, dmax, window_size, optimization == "sgm")

    def per_shard(left, right):
        # left/right: (local_batch, rows, local_cols)
        # a halo cannot exceed one shard width (ppermute reaches direct
        # neighbors only) — tiny dry-run shapes clamp it
        halo_eff = min(halo, left.shape[-1])
        left_ext = _exchange_col_halo(left, halo_eff, "tile")
        right_ext = _exchange_col_halo(right, halo_eff, "tile")

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
        )
        disp, vmask = jax.vmap(run)(left_ext, right_ext)
        return disp[..., halo_eff:-halo_eff], vmask[..., halo_eff:-halo_eff]

    spec = P("data", None, "tile")
    # check_vma=False: scan carries inside the per-shard pipeline start as
    # unvarying literals, which trips the varying-manual-axes check
    shard_fn = jax.shard_map(
        per_shard, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec), check_vma=False
    )
    return jax.jit(shard_fn)
