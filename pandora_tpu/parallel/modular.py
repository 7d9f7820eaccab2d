"""FULL modular pipeline under ``shard_map``: every configured step —
criteria/masks, CBCA, SGM/3SGM, confidence with cross-tile collectives,
WTA, filters, refinement, validation + interpolation — executes inside one
sharded XLA program over the device mesh.

This is the scale-out contract the reference delegates to CARS via ROI
windows + margins (img_tools.get_window, img_tools.py:61-98; marge.py:
85-106) made first-class: any JSON pipeline the modular engine accepts
(minus the host-side exclusions below) runs tiled with

* **halo exchange** (``lax.ppermute`` over ICI) sized by the pipeline's own
  ``GlobalMargins`` plus the disparity reach on the col axis — the
  volume-domain steps (matching cost, aggregation, optimization,
  confidence, WTA, refinement, local filters) then run per-shard on the
  extended block exactly like the untiled program;
* **cross-tile collectives** for scene-global scalars: ambiguity's
  percentile normalization gathers tile interiors over the mesh's spatial
  axes (see ops/confidence.normalize_with_percentile_collective); with a
  ``global_disparity`` range the extremum normalization is deterministic
  per-tile, mirroring the reference's tiling contract
  (img_tools.add_global_disparity, img_tools.py:319-342);
* **map-domain gather** for the row/scene-global steps: validation's
  cross-checking reads the *other* map at ``col + d`` arbitrarily far away
  and occlusion/mismatch interpolation propagates along whole rows, so at
  the first validation step the (small) disparity maps are
  ``all_gather``-ed into full-scene maps, the remaining steps run
  replicated, and each shard keeps its slice.

Tiled == untiled equality contract (same as the fused tiled path and the
reference's CARS tiling): interior pixels further than one halo from a
scene edge are identical; scene-edge halos are zero-filled where the
untiled program sees true image borders.

Exclusions (host-side or cross-scale steps): ``multiscale``,
``semantic_segmentation``, ``filter.median_for_intervals``, and
``interval_bounds`` confidence with ``regularization`` — their graph
regularization runs on host NumPy (like the reference's C++ helper) and
cannot live inside a sharded trace.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..datamodel import Image
from ..pipeline import Pipeline
from ..steps.base import PipelineState
from .tiling import _exchange_halo

_UNSUPPORTED_FAMILIES = ("multiscale", "semantic_segmentation")


def check_shardable(pipe: Pipeline) -> None:
    """Raise for pipeline steps that cannot run inside a sharded trace."""
    for key, step in pipe.steps:
        family = key.split(".")[0]
        if family in _UNSUPPORTED_FAMILIES:
            raise ValueError(
                f"step {key!r}: {family} is not supported in the tiled modular "
                "pipeline (host-side / cross-scale step)"
            )
        if family == "filter" and step.cfg.get("filter_method") == "median_for_intervals":
            raise ValueError(
                "filter median_for_intervals runs its graph regularization on "
                "host NumPy and cannot run inside the sharded program"
            )
        if (
            family == "cost_volume_confidence"
            and step.cfg.get("confidence_method") == "interval_bounds"
            and step.cfg.get("regularization")
        ):
            raise ValueError(
                "interval_bounds with regularization runs on host NumPy and "
                "cannot run inside the sharded program"
            )


def _first_validation_index(pipe: Pipeline) -> int:
    for i, (key, _) in enumerate(pipe.steps):
        if key.split(".")[0] == "validation":
            return i
    return len(pipe.steps)


def _crop(a: jnp.ndarray, rh: int, ch: int) -> jnp.ndarray:
    return a[rh : a.shape[0] - rh if rh else None, ch : a.shape[1] - ch if ch else None]


def _gather_full(x: jnp.ndarray, spatial_axes: Tuple[str, ...], two_d: bool) -> jnp.ndarray:
    """Interior shard (rows, cols[, k]) → full scene map, identical on all
    shards (tiled all_gather over the spatial mesh axes)."""
    if two_d:
        x = jax.lax.all_gather(x, spatial_axes[0], axis=0, tiled=True)
        x = jax.lax.all_gather(x, spatial_axes[1], axis=1, tiled=True)
    else:
        x = jax.lax.all_gather(x, spatial_axes[0], axis=1, tiled=True)
    return x


def tiled_modular_pipeline(
    mesh: Mesh,
    pipeline_cfg: Dict[str, Dict[str, Any]],
    *,
    dmin: int,
    dmax: int,
    has_masks: bool = False,
    use_global_disparity: bool = True,
    image_meta: Optional[Dict[str, Any]] = None,
):
    """Build a jitted, mesh-sharded executor for a FULL modular pipeline.

    Returns ``fn(left, right[, left_msk, right_msk]) -> outputs`` where the
    images are ``(batch, rows, cols)`` float32 sharded
    ``P("data", None, "tile")`` (1-D col tiling) or ``P("data", "row",
    "col")`` (2-D), and ``outputs`` is a dict with ``disparity_map``,
    ``validity_mask`` and optional ``confidence`` (plus ``right_*`` when
    the pipeline validates with cross-checking), all sharded like the
    inputs.

    ``dmin``/``dmax``: the GLOBAL disparity range (static; the reference's
    int-pair input).  ``use_global_disparity`` sets the images'
    ``global_disparity`` attr so confidence normalization is deterministic
    per tile (the reference's documented tiling mechanism); set it False to
    exercise the collective-percentile path instead.
    """
    pipe = Pipeline(pipeline_cfg)
    check_shardable(pipe)
    two_d = "row" in mesh.axis_names and "col" in mesh.axis_names
    col_axis = "col" if two_d else "tile"
    spatial_axes = ("row", col_axis) if two_d else (col_axis,)

    gm = pipe.margins.global_margins
    disp_reach = max(abs(dmin), abs(dmax))
    col_halo = max(gm.left, gm.right) + disp_reach
    row_halo = max(gm.up, gm.down) if two_d else 0
    i_val = _first_validation_index(pipe)
    meta = dict(image_meta or {})
    if use_global_disparity:
        meta["global_disparity"] = (int(dmin), int(dmax))

    def _one_pair(left, right, lmsk, rmsk):
        # left/right: (rows, cols) local shard
        ch = min(col_halo, left.shape[-1])
        rh = min(row_halo, left.shape[-2])
        local_rows, local_cols = left.shape

        def extend(x):
            if x is None:
                return None
            x = _exchange_halo(x, ch, -1, col_axis)
            if two_d and rh:
                x = _exchange_halo(x, rh, -2, "row")
            return x

        left_e, right_e = extend(left), extend(right)
        lmsk_e, rmsk_e = extend(lmsk), extend(rmsk)
        ext_shape = left_e.shape

        def image(im, msk, lo, hi):
            return Image(
                im=im[None],
                disp_min=jnp.full(ext_shape, float(lo), jnp.float32),
                disp_max=jnp.full(ext_shape, float(hi), jnp.float32),
                msk=msk,
                **meta,
            )

        state = PipelineState(
            left_img=image(left_e, lmsk_e, dmin, dmax),
            right_img=image(right_e, rmsk_e, -dmax, -dmin),
            dmin=dmin,
            dmax=dmax,
            dmin_right=-dmax,
            dmax_right=-dmin,
            extrema_preset=True,
            spatial_axes=spatial_axes,
            halo_rc=(rh, ch),
        )
        if pipe.right_disp_map == "cross_checking_accurate":
            state.right_disp_map = "accurate"
        elif pipe.right_disp_map == "cross_checking_fast":
            state.right_disp_map = "fast"

        # ---- phase A: volume-domain steps on the halo-extended shard ------
        for _key, step in pipe.steps[:i_val]:
            step.run(state)

        def interior_ds(ds):
            if ds is None:
                return None
            ds.disparity_map = _crop(ds.disparity_map, rh, ch)
            ds.validity_mask = _crop(ds.validity_mask, rh, ch)
            if ds.confidence is not None:
                ds.confidence = _crop(ds.confidence, rh, ch)
            if ds.interpolated_coeff is not None:
                ds.interpolated_coeff = _crop(ds.interpolated_coeff, rh, ch)
            return ds

        interior_ds(state.left_disparity)
        interior_ds(state.right_disparity)

        if i_val < len(pipe.steps):
            # ---- phase B: map-domain steps on gathered full-scene maps ----
            def gather_ds(ds):
                if ds is None:
                    return None
                ds.disparity_map = _gather_full(ds.disparity_map, spatial_axes, two_d)
                ds.validity_mask = _gather_full(ds.validity_mask, spatial_axes, two_d)
                if ds.confidence is not None:
                    ds.confidence = _gather_full(ds.confidence, spatial_axes, two_d)
                if ds.interpolated_coeff is not None:
                    ds.interpolated_coeff = _gather_full(
                        ds.interpolated_coeff, spatial_axes, two_d
                    )
                return ds

            gather_ds(state.left_disparity)
            gather_ds(state.right_disparity)
            for _key, step in pipe.steps[i_val:]:
                step.run(state)

            # keep this shard's slice of the replicated full-scene maps
            r0 = (jax.lax.axis_index("row") * local_rows) if two_d else 0
            c0 = jax.lax.axis_index(col_axis) * local_cols

            def local_slice(a):
                start = (r0, c0) + (0,) * (a.ndim - 2)
                sizes = (local_rows, local_cols) + a.shape[2:]
                return jax.lax.dynamic_slice(a, start, sizes)

            def slice_ds(ds):
                if ds is None:
                    return None
                ds.disparity_map = local_slice(ds.disparity_map)
                ds.validity_mask = local_slice(ds.validity_mask)
                if ds.confidence is not None:
                    ds.confidence = local_slice(ds.confidence)
                if ds.interpolated_coeff is not None:
                    ds.interpolated_coeff = local_slice(ds.interpolated_coeff)
                return ds

            slice_ds(state.left_disparity)
            slice_ds(state.right_disparity)

        out = {
            "disparity_map": state.left_disparity.disparity_map,
            "validity_mask": state.left_disparity.validity_mask,
        }
        if state.left_disparity.confidence is not None:
            out["confidence"] = state.left_disparity.confidence
        if state.right_disparity is not None:
            out["right_disparity_map"] = state.right_disparity.disparity_map
            out["right_validity_mask"] = state.right_disparity.validity_mask
        return out

    def per_shard(*arrays):
        if has_masks:
            left, right, lmsk, rmsk = arrays
        else:
            (left, right), lmsk, rmsk = arrays, None, None
        args = (left, right) + ((lmsk, rmsk) if has_masks else ())
        if has_masks:
            return jax.vmap(lambda l, r, lm, rm: _one_pair(l, r, lm, rm))(*args)
        return jax.vmap(lambda l, r: _one_pair(l, r, None, None))(*args)

    spec = P("data", "row", "col") if two_d else P("data", None, "tile")
    n_in = 4 if has_masks else 2
    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(spec,) * n_in,
        out_specs=spec,
        check_vma=False,
    )
    return jax.jit(shard_fn)
