"""Cost-volume confidence measures: ambiguity, risk, interval bounds.

η-vectorized JAX re-designs of the reference C++ kernels
(cost_volume_confidence/cpp/src/ambiguity.cpp:28-142, risk.cpp:29-197,
interval_bounds.cpp:28-162).  All reductions over the (disp, η) axes run as
a single lax.scan over η with fully vectorized (row, col, disp) steps —
memory stays at O(H·W·D), never O(H·W·D·E).

All functions expect a *min*-convention cost volume (callers negate
similarity volumes first, like the reference drivers).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _searchsorted_clamped(disp_range: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """The reference's bounded binary search (cost_volume_confidence_tools
    .cpp:22-40): lower_bound clamped to the last index."""
    n = disp_range.shape[0]
    idx = jnp.searchsorted(disp_range, values.astype(disp_range.dtype), side="left")
    return jnp.clip(idx, 0, n - 1)


def _normalized_costs(cv, disp_range, grids_min, grids_max):
    """Shared preamble: globally normalized costs with NaN→∓inf encoding
    inside/outside the per-pixel disparity interval (ambiguity.cpp:69-115)."""
    min_cost = jnp.nanmin(cv)
    max_cost = jnp.nanmax(cv)
    diff = max_cost - min_cost
    min_img = jnp.nanmin(cv, axis=2)
    norm_ext = (min_img - min_cost) / diff  # NaN at all-NaN pixels

    d = cv.shape[2]
    idx_min = _searchsorted_clamped(disp_range, grids_min)
    idx_max = _searchsorted_clamped(disp_range, grids_max) + 1
    karange = jnp.arange(d)[None, None, :]
    in_range = (karange >= idx_min[:, :, None]) & (karange < idx_max[:, :, None])
    norm = (cv - min_cost) / diff
    norm = jnp.where(jnp.isnan(cv), jnp.where(in_range, -jnp.inf, jnp.inf), norm)
    return norm, norm_ext


@jax.jit
def compute_ambiguity(
    cv: jnp.ndarray,
    etas: jnp.ndarray,
    grids_min: jnp.ndarray,
    grids_max: jnp.ndarray,
    disp_range: jnp.ndarray,
) -> jnp.ndarray:
    """Integral ambiguity (ambiguity.cpp:28-142): Σ_η #{d : normcost_d ≤
    norm_extremum + η}; all-NaN pixels get the maximal value η·D."""
    norm, norm_ext = _normalized_costs(cv, disp_range, grids_min, grids_max)
    n_disp = cv.shape[2]
    nbr_etas = etas.shape[0]

    def step(acc, eta):
        amb_eta = jnp.sum(norm <= (norm_ext + eta)[:, :, None], axis=2)
        return acc + amb_eta, None

    amb, _ = jax.lax.scan(step, jnp.zeros(cv.shape[:2], jnp.float32), etas.astype(jnp.float32))
    return jnp.where(jnp.isnan(norm_ext), jnp.float32(nbr_etas * n_disp), amb)


@jax.jit
def compute_risk(
    cv: jnp.ndarray,
    etas: jnp.ndarray,
    grids_min: jnp.ndarray,
    grids_max: jnp.ndarray,
    disp_range: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Risk measures (risk.cpp:29-197): per η the index spread of the
    'ambiguous' disparity set; risk_min = mean(1 + spread − ambiguity_η).

    :return: (risk_max, risk_min, disp_sup, disp_inf), all (row, col),
        NaN at all-NaN pixels.
    """
    norm, norm_ext = _normalized_costs(cv, disp_range, grids_min, grids_max)
    h, w, d = cv.shape
    nbr_etas = etas.shape[0]
    idxs = jnp.arange(d)[None, None, :]
    dr = disp_range.astype(jnp.float32)

    def step(acc, eta):
        mask = norm <= (norm_ext + eta)[:, :, None]
        amb_eta = jnp.sum(mask, axis=2).astype(jnp.float32)
        min_idx = jnp.min(jnp.where(mask, idxs, d), axis=2)
        max_idx = jnp.max(jnp.where(mask, idxs, -1), axis=2)
        spread = (max_idx - min_idx).astype(jnp.float32)
        s_max, s_min, s_sup, s_inf = acc
        s_max = s_max + spread
        s_min = s_min + 1.0 + spread - amb_eta
        s_sup = s_sup + dr[jnp.clip(max_idx, 0, d - 1)]
        s_inf = s_inf + dr[jnp.clip(min_idx, 0, d - 1)]
        return (s_max, s_min, s_sup, s_inf), None

    zeros = jnp.zeros((h, w), jnp.float32)
    (s_max, s_min, s_sup, s_inf), _ = jax.lax.scan(
        step, (zeros, zeros, zeros, zeros), etas.astype(jnp.float32)
    )
    invalid = jnp.isnan(norm_ext)
    out = []
    for s in (s_max, s_min, s_sup, s_inf):
        out.append(jnp.where(invalid, jnp.nan, s / nbr_etas))
    return tuple(out)


@partial(jax.jit, static_argnames=("possibility_threshold", "type_factor"))
def compute_interval_bounds(
    cv: jnp.ndarray,
    disp_range: jnp.ndarray,
    possibility_threshold: float,
    type_factor: float,
    grids_min: jnp.ndarray,
    grids_max: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Possibility-distribution disparity interval (interval_bounds.cpp:
    28-162): threshold the per-pixel possibility π_d = tf·normcost_d + 1 −
    max_d(tf·normcost), ±1 extension at exact minima.

    Note: unlike ambiguity/risk this kernel takes the volume in its native
    convention and adapts via ``type_factor`` (−1 for cost, +1 for
    similarity)."""
    h, w, d = cv.shape
    min_cost = jnp.nanmin(cv)
    max_cost = jnp.nanmax(cv)
    diff = max_cost - min_cost

    idx_min = _searchsorted_clamped(disp_range, grids_min)
    idx_max = _searchsorted_clamped(disp_range, grids_max) + 1
    karange = jnp.arange(d)[None, None, :]
    in_range = (karange >= idx_min[:, :, None]) & (karange < idx_max[:, :, None])

    norm = (cv - min_cost) / diff
    tf_norm = type_factor * norm
    max_pix = jnp.max(
        jnp.where(in_range & ~jnp.isnan(cv), tf_norm, -jnp.inf), axis=2, keepdims=True
    )
    no_finite = jnp.isinf(max_pix[:, :, 0])

    poss = tf_norm + 1.0 - max_pix  # NaN propagates
    mask = in_range & (poss >= possibility_threshold)  # NaN compares False
    found = jnp.any(mask, axis=2)

    idxs = jnp.arange(d)[None, None, :]
    min_idx = jnp.min(jnp.where(mask, idxs, d), axis=2)
    max_idx = jnp.max(jnp.where(mask, idxs, -1), axis=2)
    min_idx_c = jnp.clip(min_idx, 0, d - 1)
    max_idx_c = jnp.clip(max_idx, 0, d - 1)

    # ±1 extension where the bound sits exactly on the cost minimum
    # (int cast of possibility == 1, interval_bounds.cpp:140-151)
    poss_at_min = jnp.take_along_axis(poss, min_idx_c[:, :, None], axis=2)[:, :, 0]
    poss_at_max = jnp.take_along_axis(poss, max_idx_c[:, :, None], axis=2)[:, :, 0]
    min_idx_c = jnp.where((min_idx_c > 0) & (poss_at_min >= 1.0), min_idx_c - 1, min_idx_c)
    max_idx_c = jnp.where((max_idx_c < d - 1) & (poss_at_max >= 1.0), max_idx_c + 1, max_idx_c)

    dr = disp_range.astype(jnp.float32)
    inf_out = jnp.where(found & ~no_finite, dr[min_idx_c], jnp.nan)
    sup_out = jnp.where(found & ~no_finite, dr[max_idx_c], jnp.nan)
    return inf_out, sup_out


def normalize_with_extremum(
    amb: jnp.ndarray, global_disparity, nbr_etas: int, subpixel: int = 1
) -> jnp.ndarray:
    """Normalize by the scene-GLOBAL disparity extrema instead of the
    per-tile percentile (ambiguity.normalize_with_extremum,
    cost_volume_confidence.py:107-139) — the CARS tiled-normalization
    contract: every tile divides by the same scene-wide constant."""
    gmin, gmax = global_disparity
    return amb / ((gmax - gmin) * nbr_etas * subpixel)


def normalize_with_percentile(amb: jnp.ndarray, percentile: float = 1.0) -> jnp.ndarray:
    """Clip to [p%, 100−p%] percentiles then min-max normalize
    (ambiguity.normalize_with_percentile, ambiguity.py:177-193)."""
    lo = jnp.percentile(amb, percentile)
    hi = jnp.percentile(amb, 100.0 - percentile)
    clipped = jnp.clip(amb, lo, hi)
    mn = jnp.min(clipped)
    mx = jnp.max(clipped)
    return (clipped - mn) / (mx - mn)


def normalize_with_percentile_collective(
    amb: jnp.ndarray,
    spatial_axes,
    halo_rc,
    percentile: float = 1.0,
) -> jnp.ndarray:
    """Cross-tile percentile normalization inside a ``shard_map`` program.

    A per-tile percentile would make each tile's confidence scale depend on
    its own content (the exact tiling hazard the reference's
    ``global_disparity`` attribute exists to avoid).  Here the percentile is
    computed over the SCENE: every shard crops its halo-free interior,
    ``all_gather``s the (small, map-sized) interiors over the mesh's spatial
    axes, and evaluates the same global percentile — so all tiles normalize
    by identical scalars and the local values are then rescaled in place.

    ``spatial_axes`` are mesh axis names ordered (row_axis?, col_axis);
    ``halo_rc`` is the (row, col) halo width of the extended shard."""
    import jax

    rh, ch = halo_rc
    interior = amb[rh : amb.shape[0] - rh if rh else None, ch : amb.shape[1] - ch if ch else None]
    full = interior
    if len(spatial_axes) == 2:
        full = jax.lax.all_gather(full, spatial_axes[0], axis=0, tiled=True)
        full = jax.lax.all_gather(full, spatial_axes[1], axis=1, tiled=True)
    else:
        full = jax.lax.all_gather(full, spatial_axes[0], axis=1, tiled=True)
    lo = jnp.percentile(full, percentile)
    hi = jnp.percentile(full, 100.0 - percentile)
    clipped = jnp.clip(amb, lo, hi)
    full_c = jnp.clip(full, lo, hi)
    mn = jnp.min(full_c)
    mx = jnp.max(full_c)
    return (clipped - mn) / (mx - mn)
