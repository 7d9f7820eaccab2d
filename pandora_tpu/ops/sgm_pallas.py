"""Pallas TPU kernels for the SGM 8-path recurrence.

The lax.scan formulation (ops/sgm.py) is correct everywhere but leaves the
VPU idle: each scan step moves ~1 MB and computes ~6 M flops, so XLA's
while-loop overhead dominates.  These kernels exploit the TPU grid's
*sequential* execution with automatic double-buffered DMA pipelining, and
lay the volume out so the vector unit runs on FULL (8, 128) registers:

* row pass: the volume is consumed in ``(row, disp, col)`` ("DW") layout —
  col on the 128-wide lane axis (full occupancy even for D=64, which in
  the (col, disp) layout wasted half the lanes), disp on sublanes, so the
  disparity-neighbor mins are cheap sublane shifts and the path minimum is
  a sublane reduction.  The grid advances groups of ``_BLOCK`` rows for
  all 6 vertical/diagonal directions at once, with the directional
  L-values carried across grid steps in a VMEM scratch.  The 3 up-going
  directions run on the row-flipped volume WITHOUT materializing a flip —
  their BlockSpec index maps address block ``G-1-g``;
* col pass: the same structure over groups of ``_BLOCK`` columns for the
  2 horizontal directions in the natural (row, col, disp) layout (the
  recurrence walks the col axis, so per-step tiles are (row, disp));
* image borders and the block-size padding share one mechanism: padded
  cells hold a finite ``_BIG`` cost, so their L-values stay >= _BIG and
  float absorption (_BIG + P == _BIG exactly in f32 for any real penalty)
  makes the restart message 0 without an explicit validity test;
* a fused finish kernel sums row partials + the (XLA-transposed) col
  partial sum and performs WTA + the vfit cost-triplet extraction with
  sublane reductions — the aggregated volume never reaches HBM.

Full configuration coverage (plugin_libsgm.rst:95-330): constant P1/P2,
per-direction-per-pixel P1/P2 (negativeGradient / inverseGradient,
Banz-2012), per-(direction, pixel, disparity) P1/P2 (mc_cnn_fast_penalty,
Zbontar-2016), 3SGM segment restarts and min_cost_paths direction-argmin
tracking.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e30  # finite "no predecessor" sentinel (inf breaks min/NaN rules)
_BLOCK = 8  # rows (cols) advanced per grid step

# penalty modes
_P_SCALAR = 0  # python-float closure constant
_P_PIXEL = 1  # (H, ch, W) rows — one penalty row per pixel per direction
_P_DISP = 2  # (H, ch, D, W) — per (pixel, disparity) (mc_cnn_fast)

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=int(100 * 1024 * 1024))


def _msg_dw(prev, p1, p2):
    """SGM message on a (D, W) tile: min(prev, prev_{d+-1}+P1,
    min_d prev + P2) - min_d prev.

    Restart-at-border needs no explicit test: padded predecessors hold
    _BIG in every lane, so min_prev == _BIG and f32 absorption gives
    msg == _BIG - _BIG == 0 exactly."""
    big_row = jnp.full_like(prev[:1], _BIG)
    d_down = jnp.concatenate([big_row, prev[:-1]], axis=0)
    d_up = jnp.concatenate([prev[1:], big_row], axis=0)
    min_prev = jnp.min(prev, axis=0, keepdims=True)  # (1, W)
    m = jnp.minimum(prev, jnp.minimum(d_down, d_up) + p1)
    return jnp.minimum(m, min_prev + p2) - min_prev


def _shift_lane(a, dc):
    """Shift along the col (lane) axis: out[..., c] = a[..., c - dc]."""
    if dc == 0:
        return a
    big = jnp.full_like(a[..., :1], _BIG)
    if dc > 0:
        return jnp.concatenate([big, a[..., :-1]], axis=-1)
    return jnp.concatenate([a[..., 1:], big], axis=-1)


def _shift_lane_i32(a, dc, fill=-1):
    if dc == 0:
        return a
    pad = jnp.full_like(a[..., :1], fill)
    if dc > 0:
        return jnp.concatenate([pad, a[..., :-1]], axis=-1)
    return jnp.concatenate([a[..., 1:], pad], axis=-1)


def _sub_argmin(l, d_pad):
    """First-occurrence argmin over the sublane (disp) axis → (1, W) i32."""
    m = jnp.min(l, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, l.shape, 0)
    return jnp.min(jnp.where(l == m, iota, d_pad), axis=0, keepdims=True)


def _row_kernel(p1, p2, p1_mode, p2_mode, has_seg, track, *refs):
    """Grid step: advance the 6 vertical/diagonal directions _BLOCK rows.

    DW layout: cost_n/cost_f are (B, D, W); carry is (6, D, W)."""
    it = iter(refs)
    cost_n_ref = next(it)
    cost_f_ref = next(it)
    p1_ref = next(it) if p1_mode != _P_SCALAR else None
    p2_ref = next(it) if p2_mode != _P_SCALAR else None
    seg_ref = next(it) if has_seg else None
    out_n_ref = next(it)
    out_f_ref = next(it)
    amin_n_ref = next(it) if track else None
    amin_f_ref = next(it) if track else None
    carry_ref = next(it)
    segc_ref = next(it) if has_seg else None
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[...] = jnp.full_like(carry_ref, _BIG)
        if segc_ref is not None:
            segc_ref[...] = jnp.full_like(segc_ref, -1)

    shifts = (0, 1, -1)
    prev = [carry_ref[ch] for ch in range(6)]
    prev_seg = [segc_ref[grp] for grp in range(2)] if has_seg else None
    b, d_pad = cost_n_ref.shape[0], cost_n_ref.shape[1]
    for j in range(b):
        cost_n = cost_n_ref[j].astype(jnp.float32)  # row g*B + j, (D, W)
        cost_f = cost_f_ref[b - 1 - j].astype(jnp.float32)  # flipped row
        if has_seg:
            seg_n = seg_ref[j, 0]  # (W,) int32
            seg_f = seg_ref[j, 1]
        l_new, am_n, am_f = [], [], []
        for ch in range(6):
            grp = 0 if ch < 3 else 1
            dc = shifts[ch % 3]
            cost = cost_n if ch < 3 else cost_f
            pv = _shift_lane(prev[ch], dc)
            if p1_mode == _P_SCALAR:
                p1c = p1
            elif p1_mode == _P_PIXEL:
                p1c = p1_ref[j, ch][None, :]
            else:
                p1c = p1_ref[j, ch]
            if p2_mode == _P_SCALAR:
                p2c = p2
            elif p2_mode == _P_PIXEL:
                p2c = p2_ref[j, ch][None, :]
            else:
                p2c = p2_ref[j, ch]
            msg = _msg_dw(pv, p1c, p2c)
            if has_seg:
                cur = seg_n if grp == 0 else seg_f
                ps = _shift_lane_i32(prev_seg[grp], dc)
                msg = msg * (ps == cur)[None, :].astype(jnp.float32)
            l = cost + msg
            l_new.append(l)
            if track:
                (am_n if ch < 3 else am_f).append(_sub_argmin(l, d_pad))
        prev = l_new
        if has_seg:
            prev_seg = [seg_n, seg_f]
        # cast on write: callers may request bf16 partials (exact when every
        # L is an integer <= 256 — see sgm_partials_pallas)
        out_n_ref[j] = (l_new[0] + l_new[1] + l_new[2]).astype(out_n_ref.dtype)
        out_f_ref[b - 1 - j] = (l_new[3] + l_new[4] + l_new[5]).astype(out_f_ref.dtype)
        if track:
            amin_n_ref[j] = jnp.concatenate(am_n, axis=0)
            amin_f_ref[b - 1 - j] = jnp.concatenate(am_f, axis=0)
    for ch in range(6):
        carry_ref[ch] = prev[ch]
    if has_seg:
        for grp in range(2):
            segc_ref[grp] = prev_seg[grp]


def _msg_hd(prev, p1, p2):
    """SGM message on an (H, D) tile (disp on lanes)."""
    big_lane = jnp.full_like(prev[:, :1], _BIG)
    d_down = jnp.concatenate([big_lane, prev[:, :-1]], axis=1)
    d_up = jnp.concatenate([prev[:, 1:], big_lane], axis=1)
    min_prev = jnp.min(prev, axis=1, keepdims=True)
    m = jnp.minimum(prev, jnp.minimum(d_down, d_up) + p1)
    return jnp.minimum(m, min_prev + p2) - min_prev


def _col_kernel(p1, p2, p1_mode, p2_mode, has_seg, track, *refs):
    """Grid step: advance the 2 horizontal directions _BLOCK columns.

    HWD layout: cost_n/cost_f are (H, B, D); carry is (2, H, D)."""
    it = iter(refs)
    cost_n_ref = next(it)
    cost_f_ref = next(it)
    p1_ref = next(it) if p1_mode != _P_SCALAR else None
    p2_ref = next(it) if p2_mode != _P_SCALAR else None
    seg_ref = next(it) if has_seg else None
    out_n_ref = next(it)
    out_f_ref = next(it)
    amin_ref = next(it) if track else None
    carry_ref = next(it)
    segc_ref = next(it) if has_seg else None
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[...] = jnp.full_like(carry_ref, _BIG)
        if segc_ref is not None:
            segc_ref[...] = jnp.full_like(segc_ref, -1)

    prev = [carry_ref[ch] for ch in range(2)]
    prev_seg = [segc_ref[grp] for grp in range(2)] if has_seg else None
    b, d_pad = cost_n_ref.shape[1], cost_n_ref.shape[2]
    for j in range(b):
        cost2 = (cost_n_ref[:, j], cost_f_ref[:, b - 1 - j])  # (H, D) each
        l_new, ams = [], []
        for ch in range(2):
            if p1_mode == _P_SCALAR:
                p1c = p1
            elif p1_mode == _P_PIXEL:
                p1c = p1_ref[j, ch][:, None]
            else:
                p1c = p1_ref[j, ch]
            if p2_mode == _P_SCALAR:
                p2c = p2
            elif p2_mode == _P_PIXEL:
                p2c = p2_ref[j, ch][:, None]
            else:
                p2c = p2_ref[j, ch]
            msg = _msg_hd(prev[ch], p1c, p2c)
            if has_seg:
                cur = seg_ref[j, ch]  # (H,)
                msg = msg * (prev_seg[ch] == cur)[:, None].astype(jnp.float32)
            l = cost2[ch].astype(jnp.float32) + msg
            l_new.append(l)
            if track:
                m = jnp.min(l, axis=1, keepdims=True)
                iota = jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
                ams.append(jnp.min(jnp.where(l == m, iota, d_pad), axis=1)[None, :])
        prev = l_new
        if has_seg:
            prev_seg = [seg_ref[j, 0], seg_ref[j, 1]]
        out_n_ref[:, j] = l_new[0].astype(out_n_ref.dtype)
        out_f_ref[:, b - 1 - j] = l_new[1].astype(out_f_ref.dtype)
        if track:
            amin_ref[j] = jnp.concatenate(ams, axis=0)
    for ch in range(2):
        carry_ref[ch] = prev[ch]
    if has_seg:
        for grp in range(2):
            segc_ref[grp] = prev_seg[grp]


def _pad_nd(a: jnp.ndarray, target: Tuple[int, ...], value) -> jnp.ndarray:
    pads = [(0, t - s) for s, t in zip(a.shape, target)]
    if not any(p[1] for p in pads):
        return a
    return jnp.pad(a, pads, constant_values=value)


class SgmPartials(NamedTuple):
    """8-path directional sums, normal image orientation.

    row_n/row_f: (H8, D8, W8) DW layout (down-going / up-going triples);
    col_n/col_f: (H8, W8, D8) HWD layout (left->right / right->left);
    amins_row: (H8, 6, W8) i32 per-direction argmins or None;
    amins_col: (W8, 2, H8) i32 or None; hwd: the unpadded (h, w, d)."""

    row_n: jnp.ndarray
    row_f: jnp.ndarray
    col_n: jnp.ndarray
    col_f: jnp.ndarray
    amins_row: Optional[jnp.ndarray]
    amins_col: Optional[jnp.ndarray]
    hwd: Tuple[int, int, int]


def _prep_planes_rows(planes, h8, w8, flip_rows):
    """(8,H,W)->(H8, 6|2, W8) f32, channels listed by flip_rows pre-flipped
    along rows AFTER padding (the flipped cost refs walk the padded flip)."""
    chans = []
    for i, (ch, flip) in enumerate(flip_rows):
        p = _pad_nd(planes[ch].astype(jnp.float32), (h8, w8), 0.0)
        chans.append(p[::-1] if flip else p)
    return jnp.stack(chans, axis=1)  # (H8, k, W8)


def sgm_partials_pallas(
    cost: jnp.ndarray,
    p1: float,
    p2: float,
    p1_planes: Optional[jnp.ndarray] = None,
    p2_planes: Optional[jnp.ndarray] = None,
    segments: Optional[jnp.ndarray] = None,
    min_cost_paths: bool = False,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> SgmPartials:
    """The 8 directional path costs as 4 partial volumes.

    ``cost`` is (H, W, D), finite (caller replaces NaN with a super-cost).
    ``p1_planes``/``p2_planes``: None (use the scalar), (8, H, W) per-pixel,
    or (8, H, W, D) per-(pixel, disparity), direction order ops.sgm.ALL_DIRS.
    ``segments``: optional (H, W) int32 — 3SGM piecewise restarts.
    ``min_cost_paths``: also return per-direction argmins.

    ``out_dtype=bfloat16`` halves the partials' HBM traffic and is EXACT
    when every L-value is an integer <= 256: integer P1/P2 and
    3*(cmax + P2) <= 256 (each directional L <= cmax + P2; row triples sum
    three of them).  The 1e12 invalid sentinel survives bf16 rounding far
    above the combine threshold."""
    h, w, d = cost.shape
    b = _BLOCK
    h8 = -(-h // b) * b
    w8 = -(-w // 128) * 128
    d8 = -(-d // 16) * 16
    gr, gc = h8 // b, w8 // b

    def mode_of(planes):
        if planes is None:
            return _P_SCALAR
        return _P_DISP if planes.ndim == 4 else _P_PIXEL

    p1_mode, p2_mode = mode_of(p1_planes), mode_of(p2_planes)
    has_seg = segments is not None
    track = bool(min_cost_paths)

    cost_hwd = _pad_nd(cost, (h8, w8, d8), _BIG)
    cost_dw = jnp.moveaxis(cost_hwd, -1, 1)  # (H8, D8, W8)

    # ---- row pass: 6 channels, DW layout ---------------------------------
    n_spec = pl.BlockSpec((b, d8, w8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((b, d8, w8), lambda g: (gr - 1 - g, 0, 0), memory_space=pltpu.VMEM)
    row_flips = [(0, False), (1, False), (2, False), (3, True), (4, True), (5, True)]
    in_specs = [n_spec, f_spec]
    args = [cost_dw, cost_dw]
    for planes, mode in ((p1_planes, p1_mode), (p2_planes, p2_mode)):
        if mode == _P_PIXEL:
            args.append(_prep_planes_rows(planes, h8, w8, row_flips))
            in_specs.append(
                pl.BlockSpec((b, 6, w8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            )
        elif mode == _P_DISP:
            chans = []
            for ch, flip in row_flips:
                p = _pad_nd(planes[ch].astype(jnp.float32), (h8, w8, d8), 0.0)
                p = jnp.moveaxis(p, -1, 1)  # (H8, D8, W8)
                chans.append(p[::-1] if flip else p)
            args.append(jnp.stack(chans, axis=1))  # (H8, 6, D8, W8)
            in_specs.append(
                pl.BlockSpec((b, 6, d8, w8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM)
            )
    if has_seg:
        seg = _pad_nd(segments.astype(jnp.int32), (h8, w8), -2)
        args.append(jnp.stack([seg, seg[::-1]], axis=1))  # (H8, 2, W8)
        in_specs.append(
            pl.BlockSpec((b, 2, w8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        )

    vol_sds = jax.ShapeDtypeStruct((h8, d8, w8), out_dtype)
    out_specs = [n_spec, f_spec]
    out_shape = [vol_sds, vol_sds]
    if track:
        am_n_spec = pl.BlockSpec((b, 3, w8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        am_f_spec = pl.BlockSpec((b, 3, w8), lambda g: (gr - 1 - g, 0, 0), memory_space=pltpu.VMEM)
        out_specs += [am_n_spec, am_f_spec]
        out_shape += [jax.ShapeDtypeStruct((h8, 3, w8), jnp.int32)] * 2
    scratch = [pltpu.VMEM((6, d8, w8), jnp.float32)]
    if has_seg:
        scratch.append(pltpu.VMEM((2, w8), jnp.int32))

    outs = pl.pallas_call(
        partial(_row_kernel, p1, p2, p1_mode, p2_mode, has_seg, track),
        grid=(gr,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*args)
    row_n, row_f = outs[0], outs[1]
    amins_row = None
    if track:
        amins_row = jnp.concatenate([outs[2], outs[3]], axis=1)  # (H8, 6, W8)

    # ---- col pass: 2 channels, HWD layout --------------------------------
    cn_spec = pl.BlockSpec((h8, b, d8), lambda g: (0, g, 0), memory_space=pltpu.VMEM)
    cf_spec = pl.BlockSpec((h8, b, d8), lambda g: (0, gc - 1 - g, 0), memory_space=pltpu.VMEM)
    col_flips = [(6, False), (7, True)]
    cin_specs = [cn_spec, cf_spec]
    cargs = [cost_hwd, cost_hwd]
    for planes, mode in ((p1_planes, p1_mode), (p2_planes, p2_mode)):
        if mode == _P_PIXEL:
            chans = []
            for ch, flip in col_flips:
                p = _pad_nd(planes[ch].astype(jnp.float32), (h8, w8), 0.0)
                chans.append(p[:, ::-1] if flip else p)
            cargs.append(jnp.stack(chans, axis=-1).transpose(1, 2, 0))  # (W8, 2, H8)
            cin_specs.append(
                pl.BlockSpec((b, 2, h8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            )
        elif mode == _P_DISP:
            chans = []
            for ch, flip in col_flips:
                p = _pad_nd(planes[ch].astype(jnp.float32), (h8, w8, d8), 0.0)
                chans.append(p[:, ::-1] if flip else p)
            cargs.append(jnp.stack(chans, axis=1).transpose(2, 1, 0, 3))  # (W8,2,H8,D8)
            cin_specs.append(
                pl.BlockSpec((b, 2, h8, d8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM)
            )
    if has_seg:
        seg = _pad_nd(segments.astype(jnp.int32), (h8, w8), -2)
        cargs.append(jnp.stack([seg, seg[:, ::-1]], axis=-1).transpose(1, 2, 0))
        cin_specs.append(
            pl.BlockSpec((b, 2, h8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        )

    cvol_sds = jax.ShapeDtypeStruct((h8, w8, d8), out_dtype)
    cout_specs = [cn_spec, cf_spec]
    cout_shape = [cvol_sds, cvol_sds]
    if track:
        cam_spec = pl.BlockSpec((b, 2, h8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        cout_specs.append(cam_spec)
        cout_shape.append(jax.ShapeDtypeStruct((w8, 2, h8), jnp.int32))
    cscratch = [pltpu.VMEM((2, h8, d8), jnp.float32)]
    if has_seg:
        cscratch.append(pltpu.VMEM((2, h8), jnp.int32))

    couts = pl.pallas_call(
        partial(_col_kernel, p1, p2, p1_mode, p2_mode, has_seg, track),
        grid=(gc,),
        in_specs=cin_specs,
        out_specs=tuple(cout_specs),
        out_shape=tuple(cout_shape),
        scratch_shapes=cscratch,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*cargs)
    col_n, col_f = couts[0], couts[1]
    amins_col = couts[2] if track else None

    # amins of the flipped col channel were written at flipped positions
    # along W by cam_spec?  No: cam_spec indexes block g for both channels;
    # channel 1's value for flipped col g*B+j was stored at [j, 1] — i.e.
    # at FLIPPED w.  Restore normal orientation for channel 1.
    if track:
        amins_col = jnp.stack([amins_col[:, 0], amins_col[::-1, 1]], axis=1)

    return SgmPartials(row_n, row_f, col_n, col_f, amins_row, amins_col, (h, w, d))


def sgm_aggregate_pallas(
    cost: jnp.ndarray,
    p1: float,
    p2: float,
    p1_planes: Optional[jnp.ndarray] = None,
    p2_planes: Optional[jnp.ndarray] = None,
    segments: Optional[jnp.ndarray] = None,
    min_cost_paths: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Sum of the 8 directional path costs, (H, W, D) + optional
    nb_of_directions map.  Matches ops.sgm.sgm_aggregate (without
    overcounting, which callers apply on top)."""
    h, w, d = cost.shape
    parts = sgm_partials_pallas(
        cost, p1, p2, p1_planes, p2_planes, segments, min_cost_paths, interpret=interpret
    )
    rows = jnp.moveaxis(parts.row_n + parts.row_f, 1, -1)  # (H8, W8, D8)
    total = (rows + parts.col_n + parts.col_f)[:h, :w, :d]

    nb_dirs = None
    if min_cost_paths:
        final_arg = jnp.argmin(total, axis=-1).astype(jnp.int32)  # (H, W)
        am_r = parts.amins_row[:h, :, :w]  # (H, 6, W)
        am_c = parts.amins_col[:w, :, :h]  # (W, 2, H)
        per_dir = [am_r[:, i] for i in range(6)]
        per_dir += [am_c[:, 0].T, am_c[:, 1].T]
        nb_dirs = sum((a == final_arg).astype(jnp.float32) for a in per_dir)
    return total, nb_dirs


def _finish_kernel(n_disp, d_pad, threshold, *refs):
    """Grid step: total = row_n + row_f + colsum on (B, D, W) DW tiles,
    then WTA + vfit-triplet extraction in VMEM — the total volume never
    reaches HBM.

    refs: rn, rf, cs (B, D, W) -> idx (B, W) f32, c0, c1, c2 (B, W).
    Entries >= threshold are the super-cost (invalid) sentinels: excluded
    from the argmin and reported as NaN in the triplet."""
    rn, rf, cs, idx_ref, c0_ref, c1_ref, c2_ref = refs
    f32 = jnp.float32
    t = rn[...].astype(f32) + rf[...].astype(f32) + cs[...].astype(f32)  # (B, D, W)
    inv = t >= threshold
    g = jnp.where(inv, _BIG, t)
    m = jnp.min(g, axis=1, keepdims=True)  # (B, 1, W)
    iota = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    # first-occurrence argmin (numpy tie-breaking); padded disp lanes hold
    # accumulated _BIG >= threshold so they never win
    idx = jnp.min(jnp.where(g == m, iota, d_pad), axis=1)  # (B, W)
    idx_c = jnp.clip(idx, 1, n_disp - 2)
    tn = jnp.where(inv, jnp.nan, t)
    ic = idx_c[:, None, :]

    def sel(sel_idx):
        return jnp.sum(jnp.where(iota == sel_idx, tn, 0.0), axis=1)

    all_inv = m[:, 0] >= _BIG * 0.5
    idx_ref[...] = idx.astype(jnp.float32)
    c0_ref[...] = sel(ic - 1)
    c1_ref[...] = jnp.where(all_inv, jnp.nan, sel(idx[:, None, :]))
    c2_ref[...] = sel(ic + 1)


def combine_wta_pallas(parts: SgmPartials, threshold, interpret: bool = False):
    """Fused Σ-partials + WTA + triplet: one read of the partial volumes,
    no materialized total.  Returns (idx int32, c0, c1, c2) cropped to
    (h, w); idx is the argmin position, c* the costs at idx-1/idx/idx+1
    with NaN where the entry is invalid (c1 NaN ⇔ every disparity invalid,
    the wta() all-NaN convention)."""
    h, w, d = parts.hwd
    h8, d8, w8 = parts.row_n.shape
    # one cheap XLA fused add+transpose brings the col partials into DW
    colsum = jnp.moveaxis(
        parts.col_n.astype(jnp.float32) + parts.col_f.astype(jnp.float32), -1, 1
    ).astype(parts.row_n.dtype)
    b = _BLOCK
    gr = h8 // b
    vol_spec = pl.BlockSpec((b, d8, w8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((b, w8), lambda g: (g, 0), memory_space=pltpu.VMEM)
    map_sds = jax.ShapeDtypeStruct((h8, w8), jnp.float32)
    idx_f, c0, c1, c2 = pl.pallas_call(
        partial(_finish_kernel, d, d8, threshold),
        grid=(gr,),
        in_specs=[vol_spec] * 3,
        out_specs=(map_spec,) * 4,
        out_shape=(map_sds,) * 4,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(parts.row_n, parts.row_f, colsum)
    crop = (slice(None, h), slice(None, w))
    return idx_f[crop].astype(jnp.int32), c0[crop], c1[crop], c2[crop]


def pallas_supported(
    cost_shape: Tuple[int, int, int], p1_planes, p2_planes, segments, min_cost_paths
) -> bool:
    """Whether the Pallas fast path covers this configuration.

    Since the DW-layout rewrite this is every plugin_libsgm.rst:95-330
    configuration row — per-pixel and per-(pixel, disp) P1/P2, 3SGM
    segments and min_cost_paths included.  The only remaining gates are
    VMEM capacity for the recurrence carries and (for per-direction
    CONSTANT planes) value uniformity, since the kernel closure takes one
    scalar per penalty."""
    h, w, d = cost_shape
    w8 = -(-w // 128) * 128
    h8 = -(-h // _BLOCK) * _BLOCK
    d8 = -(-d // 16) * 16
    # VMEM: carries + a few double-buffered blocks must fit
    if 6 * d8 * w8 * 4 > 48 * 1024 * 1024:
        return False
    if 2 * h8 * d8 * 4 > 48 * 1024 * 1024:
        return False
    if p1_planes is not None and p1_planes.ndim == 4 and p2_planes is not None and p2_planes.ndim == 4:
        # per-disp penalty blocks: 2 penalties x (B, 6, D8, W8) double-buffered
        if 2 * 2 * _BLOCK * 6 * d8 * w8 * 4 > 80 * 1024 * 1024:
            return False
    return True
