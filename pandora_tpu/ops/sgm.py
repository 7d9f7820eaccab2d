"""Semi-global matching: 8-path cost-volume regularization.

TPU-native re-design of the reference's external libSGM C++ plugin
(capability documented in docs/source/userguide/plugins/plugin_libsgm.rst:
9-120; recurrence L_r(p,d) = C(p,d) + min(L_r(p−r,d), L_r(p−r,d±1)+P1,
min_d' L_r(p−r,d') + P2) − min_d' L_r(p−r,d')).

Design for XLA/TPU instead of the CPU per-pixel loops:

* the 8 directions collapse into TWO ``lax.scan``s — one over rows carrying
  the 6 vertical/diagonal directions (down-going directions in normal space,
  up-going ones as down-going over the row-flipped volume, batched in one
  carry of shape (6, cols, disp)), and one over columns carrying the 2
  horizontal directions (the right-to-left one over the col-flipped volume);
* each scan step is a fully vectorized (dirs, cols, disp) VPU expression:
  disparity-neighbor mins via padded shifts, path minimum via a lane-axis
  reduction;
* path starts (image borders, 3SGM segment boundaries) are handled by a
  +inf-free reset mask rather than control flow.

Supports per-direction per-pixel P2 (negativeGradient / inverseGradient,
Banz-2012), per-(pixel, disp) P1/P2 (mc_cnn_fast_penalty, Žbontar-2016),
overcounting correction, min_cost_paths direction counting and 3SGM
piecewise optimization from a segment-id map.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# direction vectors (drow, dcol) in scan-channel order: channels 0-2 run
# top->bottom on the normal volume, channels 3-5 top->bottom on the
# row-flipped volume (flipped (1,dc) == original (-1,dc)), 6-7 are the
# horizontal pair (7 runs on the col-flipped volume).
ALL_DIRS = (
    (1, 0), (1, 1), (1, -1), (-1, 0), (-1, 1), (-1, -1), (0, 1), (0, -1),
)


def _shift_disp(a: jnp.ndarray, big: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Neighbors along the (last) disparity axis, edge-padded with +big."""
    up = jnp.concatenate([a[..., 1:], big[..., :1]], axis=-1)  # d+1
    down = jnp.concatenate([big[..., :1], a[..., :-1]], axis=-1)  # d-1
    return down, up


def _sgm_message(prev, p1, p2, valid_prev):
    """min(prev_d, prev_{d∓1}+P1, min_d prev + P2) − min_d prev, with path
    restart (message 0) where there is no valid predecessor.

    prev: (..., D); p1/p2: broadcastable to prev; valid_prev: (..., 1) bool.
    """
    big = jnp.full_like(prev, jnp.inf)
    d_down, d_up = _shift_disp(prev, big)
    min_prev = jnp.min(prev, axis=-1, keepdims=True)
    msg = jnp.minimum(prev, jnp.minimum(d_down, d_up) + p1)
    msg = jnp.minimum(msg, min_prev + p2) - min_prev
    return jnp.where(valid_prev, msg, 0.0)


def _row_scan(cost2, pen_static, pen_xs, seg2, n_disp, track_mins,
              edge_cols=(), inj_lanes=(), inj=None):
    """One scan over rows carrying 6 directions.

    cost2: (2, H, W, D) — [normal, row-flipped] cost volumes.
    pen_static: (p1, p2) as (6, 1, 1) closure constants, or None.
    pen_xs: (p1, p2) as (H, 6, W, D-or-1) scanned inputs, or None.
    seg2: (2, H, W) int32 segment ids or None.

    Tiled SGM boundary-state hooks (parallel/sgm_exchange.py):

    * ``edge_cols``: static column indices whose per-channel L values are
      emitted each row — out["edges"] (H, 6, k, D).  Channels 0-2 rows
      are in normal order, 3-5 in flipped order (the scan's native order).
    * ``inj_lanes`` + ``inj`` (H, k, 6, D): after computing each row, the
      L values at these columns are OVERWRITTEN with the injected values
      (a neighbor tile's boundary history) so the next row's column
      shifts read cross-tile state instead of a path restart.  Non-finite
      injections reproduce the restart (isfinite validity).
    """
    h, w = cost2.shape[1], cost2.shape[2]
    shifts = (0, 1, -1)  # dcol of ROW_DIRS

    def shift_cols(a, dc, fill):
        # out[c] = a[c - dc]: the direction-(1, dc) predecessor of col c
        # lives at col c - dc in the previous row
        if dc == 0:
            return a
        if dc > 0:
            return jnp.concatenate([jnp.full_like(a[:dc], fill), a[:-dc]], axis=0)
        return jnp.concatenate([a[-dc:], jnp.full_like(a[:-dc], fill)], axis=0)

    def step(carry, xs):
        prev_l, prev_seg, first = carry  # (6, W, D), (2, W), bool
        cost_row = xs["cost"]  # (2, W, D)
        p1, p2 = (xs["p1"], xs["p2"]) if pen_xs is not None else pen_static
        seg_row = xs.get("seg")  # (2, W) or None

        l_new = []
        for ch in range(6):
            grp = 0 if ch < 3 else 1  # normal / flipped volume
            dc = shifts[ch % 3]
            prev = shift_cols(prev_l[ch], dc, jnp.inf)  # (W, D)
            valid = jnp.isfinite(prev[..., :1]) & (~first)
            if seg_row is not None:
                pseg = shift_cols(prev_seg[grp], dc, -1)  # (W,)
                valid = valid & (pseg == seg_row[grp])[:, None]
            msg = _sgm_message(prev, p1[ch], p2[ch], valid)
            l_new.append(cost_row[grp] + msg)
        l_new = jnp.stack(l_new)  # (6, W, D)
        out = {"norm": l_new[0] + l_new[1] + l_new[2], "flip": l_new[3] + l_new[4] + l_new[5]}
        if track_mins:
            out["amins"] = jnp.argmin(l_new, axis=-1).astype(jnp.int32)  # (6, W)
        if edge_cols:
            out["edges"] = jnp.stack([l_new[:, c] for c in edge_cols], axis=1)
        for i, lane in enumerate(inj_lanes):
            l_new = l_new.at[:, lane].set(xs["inj"][i])
        new_seg = seg_row if seg_row is not None else prev_seg
        return (l_new, new_seg, jnp.zeros((), bool)), out

    xs = {"cost": jnp.moveaxis(cost2, 1, 0)}  # (H, 2, W, D)
    if pen_xs is not None:
        xs["p1"], xs["p2"] = pen_xs
    if seg2 is not None:
        xs["seg"] = jnp.moveaxis(seg2, 1, 0)
    if inj_lanes:
        xs["inj"] = inj  # (H, k, 6, D): scan slices the leading (row) axis
    init = (
        jnp.zeros((6, w, n_disp), cost2.dtype),
        jnp.zeros((2, w), jnp.int32),
        jnp.ones((), bool),
    )
    _, ys = jax.lax.scan(step, init, xs)
    return ys


def _col_scan(cost2, pen_static, pen_xs, seg2, n_disp, track_mins, init_l=None):
    """One scan over columns carrying the 2 horizontal directions.

    cost2: (2, H, W, D) — [normal, col-flipped].

    ``init_l`` (2, H, D): initial L-state entering the first scanned
    column (a neighbor tile's boundary carry, parallel/sgm_exchange.py);
    non-finite rows reproduce the default path restart."""
    h = cost2.shape[1]

    def step(carry, xs):
        prev_l, prev_seg, first = carry  # (2, H, D), (2, H)
        cost_col = xs["cost"]  # (2, H, D)
        p1, p2 = (xs["p1"], xs["p2"]) if pen_xs is not None else pen_static
        seg_col = xs.get("seg")
        valid = jnp.isfinite(prev_l[..., :1]) & (~first)
        if seg_col is not None:
            valid = valid & (prev_seg == seg_col)[..., None]
        msg = _sgm_message(prev_l, p1, p2, valid)
        l_new = cost_col + msg  # (2, H, D)
        out = {"norm": l_new[0], "flip": l_new[1]}
        if track_mins:
            out["amins"] = jnp.argmin(l_new, axis=-1).astype(jnp.int32)  # (2, H)
        new_seg = seg_col if seg_col is not None else prev_seg
        return (l_new, new_seg, jnp.zeros((), bool)), out

    xs = {"cost": jnp.moveaxis(cost2, 2, 0)}  # (W, 2, H, D)
    if pen_xs is not None:
        xs["p1"], xs["p2"] = pen_xs
    if seg2 is not None:
        xs["seg"] = jnp.moveaxis(seg2, 2, 0)
    init = (
        jnp.zeros((2, h, n_disp), cost2.dtype) if init_l is None else init_l,
        jnp.zeros((2, h), jnp.int32),
        jnp.ones((), bool) if init_l is None else jnp.zeros((), bool),
    )
    _, ys = jax.lax.scan(step, init, xs)
    return ys


def sgm_aggregate(
    cost: jnp.ndarray,
    p1_planes: jnp.ndarray,
    p2_planes: jnp.ndarray,
    segments: Optional[jnp.ndarray] = None,
    overcounting: bool = False,
    min_cost_paths: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Sum of the 8 directional path costs.

    :param cost: (row, col, disp) finite float32 (NaN already replaced).
    :param p1_planes: (8, row, col) or (8, 1, 1) or (8, row, col, disp)
        per-direction P1, direction order ``ALL_DIRS``.
    :param p2_planes: same shapes for P2.
    :param segments: optional (row, col) int32 segment-id map (3SGM
        piecewise optimization: paths restart at segment boundaries).
    :return: (aggregated (row, col, disp),
              nb_of_directions (row, col) float32 or None)
    """
    h, w, n_disp = cost.shape
    cost_rflip = cost[::-1]
    cost_cflip = cost[:, ::-1]
    constant_pen = p1_planes.shape[1:3] == (1, 1) and p2_planes.shape[1:3] == (1, 1)

    def prep(planes, dirs_idx, flip_axis):
        """(8, H, W[, D]) or (8, 1, 1) planes → (k, H, W, D-or-1), spatially
        flipped for the channels that run on the flipped volume."""
        out = []
        for i, di in enumerate(dirs_idx):
            p = planes[di]
            if p.ndim == 2:
                p = p[..., None]
            p = jnp.broadcast_to(p, (h, w, p.shape[-1]))
            if i >= len(dirs_idx) // 2:
                p = jnp.flip(p, axis=flip_axis)
            out.append(p)
        return jnp.stack(out)  # (k, H, W, D?)

    # row scan: channels = dirs 0..2 normal + 3..5 on row-flipped volume
    if constant_pen:
        pen_static_r = (
            p1_planes[:6].reshape(6, 1, 1),
            p2_planes[:6].reshape(6, 1, 1),
        )
        pen_xs_r = None
        pen_static_c = (p1_planes[6:].reshape(2, 1, 1), p2_planes[6:].reshape(2, 1, 1))
        pen_xs_c = None
    else:
        pen_static_r = pen_static_c = None
        p1_r = jnp.moveaxis(prep(p1_planes, [0, 1, 2, 3, 4, 5], 0), 1, 0)  # (H,6,W,D?)
        p2_r = jnp.moveaxis(prep(p2_planes, [0, 1, 2, 3, 4, 5], 0), 1, 0)
        pen_xs_r = (p1_r, p2_r)
        p1_c = jnp.moveaxis(prep(p1_planes, [6, 7], 1), 2, 0)  # (W,2,H,D?)
        p2_c = jnp.moveaxis(prep(p2_planes, [6, 7], 1), 2, 0)
        pen_xs_c = (p1_c, p2_c)

    seg2_r = None
    if segments is not None:
        seg2_r = jnp.stack([segments, segments[::-1]]).astype(jnp.int32)
    ys_r = _row_scan(
        jnp.stack([cost, cost_rflip]), pen_static_r, pen_xs_r, seg2_r, n_disp, min_cost_paths
    )

    # col scan: dir 6 normal + dir 7 on col-flipped volume
    seg2_c = None
    if segments is not None:
        seg2_c = jnp.stack([segments, segments[:, ::-1]]).astype(jnp.int32)
    ys_c = _col_scan(
        jnp.stack([cost, cost_cflip]), pen_static_c, pen_xs_c, seg2_c, n_disp, min_cost_paths
    )

    total = (
        ys_r["norm"]
        + ys_r["flip"][::-1]
        + jnp.moveaxis(ys_c["norm"], 0, 1)
        + jnp.moveaxis(ys_c["flip"], 0, 1)[:, ::-1]
    )
    if overcounting:
        total = total - 7.0 * cost

    nb_dirs = None
    if min_cost_paths:
        final_arg = jnp.argmin(total, axis=-1).astype(jnp.int32)  # (H, W)
        am_r = ys_r["amins"]  # (H, 6, W)
        am_c = ys_c["amins"]  # (W, 2, H)
        per_dir = [am_r[:, 0], am_r[:, 1], am_r[:, 2]]
        per_dir += [am_r[::-1, 3], am_r[::-1, 4], am_r[::-1, 5]]
        per_dir += [am_c[:, 0].T, am_c[:, 1].T[:, ::-1]]
        nb_dirs = sum((a == final_arg).astype(jnp.float32) for a in per_dir)

    return total, nb_dirs


def penalty_planes(
    img: jnp.ndarray,
    method: str,
    p1: float,
    p2: float,
    alpha: float = 1.0,
    beta: float = 1.0,
    gamma: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, float]:
    """Per-direction penalty planes (8, row, col) for the sgm_penalty
    methods (plugin_libsgm.rst:20-28):

    * constant:          P2 = p2
    * negativeGradient:  P2 = −alpha·|I(p) − I(p−r)| + gamma
    * inverseGradient:   P2 = alpha / (|I(p) − I(p−r)| + beta) + gamma

    Returns (p1_planes, p2_planes, p2_max_bound).
    """
    h, w = img.shape
    if method == "constant":
        p1p = jnp.full((8, 1, 1), p1, jnp.float32)
        p2p = jnp.full((8, 1, 1), p2, jnp.float32)
        return p1p, p2p, float(p2)

    pad = jnp.pad(img, 1, mode="edge")
    grads = []
    for dr, dc in ALL_DIRS:
        # |I(p) - I(p - r)|
        prev = pad[1 - dr : 1 - dr + h, 1 - dc : 1 - dc + w]
        grads.append(jnp.abs(img - prev))
    g = jnp.stack(grads)  # (8, H, W)
    if method == "negativeGradient":
        p2p = -alpha * g + gamma
        p2max = float(gamma)
    elif method == "inverseGradient":
        p2p = alpha / (g + beta) + gamma
        p2max = float(alpha / beta + gamma)
    else:
        raise ValueError(method)
    p1p = jnp.full((8, 1, 1), p1, jnp.float32)
    return p1p, p2p.astype(jnp.float32), p2max


def mc_cnn_penalty_planes(
    img_left: jnp.ndarray,
    img_right: jnp.ndarray,
    dmin: int,
    dmax: int,
    p1: float,
    p2: float,
    q1: float,
    q2: float,
    d_thresh: float,
    v: float,  # noqa: ARG001 (V scales P1 for horizontal dirs in Žbontar)
) -> Tuple[jnp.ndarray, jnp.ndarray, float]:
    """mc_cnn_fast_penalty (Žbontar-2016, plugin_libsgm.rst:30-38):
    per-(pixel, disp, direction) P1/P2 from left/right gradients
    D1 = |I_L(p) − I_L(p−r)|, D2 = |I_R(p−d) − I_R(p−d−r)|.

    Returns (8, row, col, disp) planes and the P2 upper bound.
    """
    from .cost_volume import pad_for_offset_scan, scan_offsets

    h, w = img_left.shape
    n_int = dmax - dmin + 1
    padl = jnp.pad(img_left, 1, mode="edge")
    padr = jnp.pad(img_right, 1, mode="edge")
    p1_all, p2_all = [], []
    for dr, dc in ALL_DIRS:
        g_l = jnp.abs(img_left - padl[1 - dr : 1 - dr + h, 1 - dc : 1 - dc + w])
        g_r = jnp.abs(img_right - padr[1 - dr : 1 - dr + h, 1 - dc : 1 - dc + w])
        # gather right gradient at col + d for each integer disparity
        grp = pad_for_offset_scan(g_r, dmin, dmax, w)
        d2 = scan_offsets(lambda s: s, [grp], n_int, w)  # (D, H, W)
        d2 = jnp.moveaxis(d2, 0, -1)  # (H, W, D)
        d1 = g_l[:, :, None]
        both_low = (d1 < d_thresh) & (d2 < d_thresh)
        both_high = (d1 >= d_thresh) & (d2 >= d_thresh)
        p1_d = jnp.where(both_low, p1, jnp.where(both_high, p1 / q2, p1 / q1))
        p2_d = jnp.where(both_low, p2, jnp.where(both_high, p2 / q2, p2 / q1))
        p1_all.append(p1_d)
        p2_all.append(p2_d)
    return (
        jnp.stack(p1_all).astype(jnp.float32),
        jnp.stack(p2_all).astype(jnp.float32),
        float(p2),
    )


def default_use_pallas() -> bool:
    """Pallas fast path on real TPU backends only (the CPU interpreter is
    far slower than the lax scans)."""
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False


@partial(
    jax.jit,
    static_argnames=(
        "type_measure",
        "overcounting",
        "min_cost_paths",
        "use_pallas",
        "p1_const",
        "p2_const",
    ),
)
def sgm_optimize_volume(
    cv: jnp.ndarray,
    p1_planes: Optional[jnp.ndarray],
    p2_planes: Optional[jnp.ndarray],
    p2_max: jnp.ndarray,
    confidence: Optional[jnp.ndarray] = None,
    segments: Optional[jnp.ndarray] = None,
    type_measure: str = "min",
    overcounting: bool = False,
    min_cost_paths: bool = False,
    use_pallas: bool = False,
    p1_const: Optional[float] = None,
    p2_const: Optional[float] = None,
):
    """Full SGM pass on a reference-convention cost volume:

    * similarity (max) volumes are negated into costs;
    * optional ambiguity-confidence weighting of the data term
      (use_confidence, plugin_libsgm.rst:41-47);
    * NaN (invalid) entries are replaced by a finite super-cost so they can
      never win, and restored to NaN afterwards;
    * returns a *min* volume (the plugin leaves the optimized volume in cost
      convention).
    """
    work = -cv if type_measure == "max" else cv
    if confidence is not None:
        work = work * confidence[:, :, None]
    invalid = jnp.isnan(work)
    # fixed super-cost sentinel (same convention as the fused Pallas path,
    # fused._SUPER): an invalid entry can never win a WTA NOR leak into a
    # valid neighbour's message (sentinel + P1 absorbs exactly in f32 and
    # always loses to min_prev + P2) — the C++ libSGM semantics, where
    # invalid pixels simply never enter the cost array
    super_cost = 1.0e12
    work = jnp.where(invalid, super_cost, work)

    if p1_planes is None:
        p1_planes = jnp.full((8, 1, 1), p1_const, jnp.float32)
    if p2_planes is None:
        p2_planes = jnp.full((8, 1, 1), p2_const, jnp.float32)

    nb_dirs = None
    pallas_done = False
    if use_pallas:
        from .sgm_pallas import pallas_supported, sgm_aggregate_pallas

        # kernel penalty form: closure scalar when a constant is known,
        # otherwise the (8, H, W) / (8, H, W, D) planes; per-direction
        # CONSTANT planes without a scalar cannot ride the kernel closure
        p1_arg = None if p1_const is not None else p1_planes
        p2_arg = None if p2_const is not None else p2_planes

        def _kernel_ok(arg):
            return arg is None or arg.ndim == 4 or arg.shape[1:3] != (1, 1)

        if (
            _kernel_ok(p1_arg)
            and _kernel_ok(p2_arg)
            and pallas_supported(work.shape, p1_arg, p2_arg, segments, min_cost_paths)
        ):
            total, nb_dirs = sgm_aggregate_pallas(
                work,
                p1_const if p1_const is not None else 0.0,
                p2_const if p2_const is not None else 0.0,
                p1_planes=p1_arg,
                p2_planes=p2_arg,
                segments=segments,
                min_cost_paths=min_cost_paths,
            )
            if overcounting:
                total = total - 7.0 * work
            pallas_done = True
    if not pallas_done:
        total, nb_dirs = sgm_aggregate(
            work, p1_planes, p2_planes, segments, overcounting, min_cost_paths
        )
    total = jnp.where(invalid, jnp.nan, total)
    return total, nb_dirs
