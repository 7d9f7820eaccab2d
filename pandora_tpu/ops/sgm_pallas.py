"""Pallas TPU kernels for the SGM 8-path recurrence.

The lax.scan formulation (ops/sgm.py) is correct everywhere but leaves the
VPU idle: each scan step moves ~1 MB and computes ~6 M flops, so XLA's
while-loop overhead dominates.  These kernels exploit the TPU grid's
*sequential* execution with automatic double-buffered DMA pipelining, and
lay the volume out so the vector unit runs on FULL (8, 128) registers:

* ONE generic scan kernel advances a group of directions one line at a
  time over a ``(line, disp, cross)`` layout — the cross axis (1024-ish)
  on the 128-wide lane axis (full occupancy even for D=64, which a
  (cross, disp) tiling would waste half of), disp on sublanes, so the
  disparity-neighbor mins are cheap sublane shifts and the path minimum
  is a sublane reduction.  Each grid step advances ``_BLOCK`` lines; the
  directional L-values are carried across grid steps in a VMEM scratch.
  Up-going directions run on the flipped volume WITHOUT materializing a
  flip — their BlockSpec index maps address block ``G-1-g``;
* the row pass instantiates it with 6 channels (down/up triples, cross
  shifts 0/+1/-1) on the (row, disp, col) volume; the col pass with 2
  channels (left->right / right->left, shift 0) on the TRANSPOSED
  (col, disp, row) volume — walking the *major* block dim keeps every
  per-line slice contiguous (a middle-dim slice would read one sublane
  per tile and relayout);
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
# int16 compute path: the recurrence is EXACT in 16-bit integers when the
# volume is uint8 and P1/P2 are integers (every L <= cmax + P2 <= 32767),
# and 16-bit VPU math packs 2 lanes per 32-bit ALU slot on v5e.  The
# sentinel only needs headroom for + P1/P2 below INT16_MAX; restart
# messages are exactly 0 by integer arithmetic (no float absorption).
_BIG_I16 = 16000
_BLOCK = 8  # lines advanced per grid step


def _big_for(dtype):
    return _BIG_I16 if dtype == jnp.int16 else _BIG

# penalty modes
_P_SCALAR = 0  # python-float closure constant
_P_PIXEL = 1  # (L, ch, X) — one penalty value per pixel per direction
_P_DISP = 2  # (L, ch, D, X) — per (pixel, disparity) (mc_cnn_fast)

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=int(100 * 1024 * 1024))


def _msg_dw(prev, p1, p2):
    """SGM message on a (D, X) tile: min(prev, prev_{d+-1}+P1,
    min_d prev + P2) - min_d prev.

    Restart-at-border needs no explicit test: padded predecessors hold
    _BIG in every lane, so min_prev == _BIG and f32 absorption gives
    msg == _BIG - _BIG == 0 exactly (int16: plain integer cancellation)."""
    big_row = jnp.full_like(prev[:1], _big_for(prev.dtype))
    d_down = jnp.concatenate([big_row, prev[:-1]], axis=0)
    d_up = jnp.concatenate([prev[1:], big_row], axis=0)
    if prev.dtype == jnp.int16:
        # Mosaic has no int16 sublane reductions; hop through int32 for
        # the (amortized) min-reduce, keep the elementwise ops packed i16
        min_prev = jnp.min(prev.astype(jnp.int32), axis=0, keepdims=True).astype(jnp.int16)
    else:
        min_prev = jnp.min(prev, axis=0, keepdims=True)  # (1, X)
    m = jnp.minimum(prev, jnp.minimum(d_down, d_up) + p1)
    return jnp.minimum(m, min_prev + p2) - min_prev


def _shift_lane(a, dc):
    """Shift along the cross (lane) axis: out[..., c] = a[..., c - dc]."""
    if dc == 0:
        return a
    big = jnp.full_like(a[..., :1], _big_for(a.dtype))
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


def _to_f32(x, cdt=jnp.float32):
    """Load-cast to the compute dtype; Mosaic has no direct uint8->float
    lowering, so uint8 costs hop through int16 (exact for 0..255)."""
    if cdt == jnp.int16:
        return x.astype(jnp.int16)  # uint8 -> int16 is direct and exact
    if x.dtype == jnp.uint8:
        return x.astype(jnp.int16).astype(jnp.float32).astype(cdt)
    return x.astype(jnp.float32).astype(cdt)


def _store_cast(x, dtype, bounded=False):
    """Store-cast f32/bf16 L-values.  uint8 partials clamp to 255: valid
    directional sums are exact small integers, invalid ones (>= 255 per
    direction thanks to the absorb select) saturate — totals of clamped
    partials still separate (4*255 = 1020 vs valid <= 8*(cmax+P2)).

    ``bounded``: skip the clip and let the u8 cast WRAP — one less VPU op
    per element on the hot store.  Safe under the absorb select because
    channel groups share one validity mask per line: a partial is either
    all-valid (row triple <= 3*(cmax+P2) <= 254 under the u8p gate, no
    wrap) or all-invalid (3*255 = 765 wraps to 253; col singles stay 255),
    so invalid totals are >= 253+253+255+255 = 1016, still above
    _U8P_THRESH = 900 while valid totals stay <= 8*(cmax+P2) <= 677."""
    if x.dtype == jnp.int16:
        if dtype == jnp.uint8:
            if not bounded:
                x = jnp.clip(x, 0, 255)
            return x.astype(jnp.uint8)  # i16 -> u8 wraps mod 256
        return x if dtype == jnp.int16 else x.astype(dtype)
    if dtype == jnp.uint8:
        x = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
        if not bounded:
            x = jnp.clip(x, 0.0, 255.0)
        return x.astype(jnp.int16).astype(jnp.uint8)
    return x.astype(dtype)


def _sub_argmin(l, d_pad):
    """First-occurrence argmin over the sublane (disp) axis → (1, X) i32."""
    m = jnp.min(l, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, l.shape, 0)
    return jnp.min(jnp.where(l == m, iota, d_pad), axis=0, keepdims=True)


def _scan_kernel(p1, p2, p1_mode, p2_mode, has_seg, track, shifts, absorb, cdt,
                 exchange, *refs):
    """Grid step: advance ``len(shifts)`` directions _BLOCK lines.

    Layout (line, disp, cross): cost_n/cost_f are (B, D, X); carry is
    (n_ch, D, X).  The first half of the channels runs on the normal
    volume, the second half on the flipped one (flipped refs).

    ``absorb``: sentinel value of invalid entries for small-dtype volumes
    (255.0 for uint8).  f32 super-cost sentinels absorb the incoming
    message automatically (1e12 + msg == 1e12 in f32), giving a clean
    path restart after an invalid run; a small sentinel needs the
    explicit select so masked zones can't leak messages across.

    ``exchange``: static (has_init, want_final, edge_cols, inj_lanes) —
    the tiled boundary-state hooks (parallel/sgm_exchange.py): seed the
    carry from a neighbor tile instead of the restart sentinel, emit the
    final carry, emit per-line per-channel L at static edge columns, and
    overwrite injected lanes after each line so the lane shifts read
    cross-tile state."""
    has_init, want_final, edge_cols, inj_lanes = exchange
    n_ch = len(shifts)
    half = n_ch // 2
    it = iter(refs)
    cost_n_ref = next(it)
    cost_f_ref = next(it)
    p1_ref = next(it) if p1_mode != _P_SCALAR else None
    p2_ref = next(it) if p2_mode != _P_SCALAR else None
    seg_ref = next(it) if has_seg else None
    init_ref = next(it) if has_init else None
    inj_n_ref = next(it) if inj_lanes else None
    inj_f_ref = next(it) if inj_lanes else None
    out_n_ref = next(it)
    out_f_ref = next(it)
    amin_n_ref = next(it) if track else None
    amin_f_ref = next(it) if track else None
    edges_n_ref = next(it) if edge_cols else None
    edges_f_ref = next(it) if edge_cols else None
    final_ref = next(it) if want_final else None
    carry_ref = next(it)
    segc_ref = next(it) if has_seg else None
    g = pl.program_id(0)

    def _sanitize(v):
        """Non-finite boundary state (the mesh-edge inf fill of
        parallel/sgm_exchange.py) → the restart sentinel, matching the lax
        scans' jnp.isfinite guard (ops/sgm.py:108,156); cast-safe for the
        int16 compute path."""
        v = jnp.where(jnp.isfinite(v), v, jnp.float32(_big_for(cdt)))
        return v.astype(cdt)

    @pl.when(g == 0)
    def _():
        if init_ref is not None:
            carry_ref[...] = _sanitize(init_ref[...]).astype(carry_ref.dtype)
        else:
            carry_ref[...] = jnp.full_like(carry_ref, _big_for(carry_ref.dtype))
        if segc_ref is not None:
            segc_ref[...] = jnp.full_like(segc_ref, -1)

    prev = [carry_ref[ch] for ch in range(n_ch)]
    prev_seg = [segc_ref[grp] for grp in range(2)] if has_seg else None
    b, d_pad = cost_n_ref.shape[0], cost_n_ref.shape[1]
    # keep the sentinel compare in the compute dtype (an int16 volume
    # compared against a python float would promote the whole line to f32)
    absorb_c = int(absorb) if absorb is not None and cdt == jnp.int16 else absorb
    for j in range(b):
        cost_n = _to_f32(cost_n_ref[j], cdt)  # line g*B + j, (D, X)
        cost_f = _to_f32(cost_f_ref[b - 1 - j], cdt)  # flipped line
        if absorb is not None:
            inv_n = cost_n >= absorb_c
            inv_f = cost_f >= absorb_c
        if has_seg:
            seg_n = seg_ref[j, 0]  # (X,) int32
            seg_f = seg_ref[j, 1]
        l_new, am_n, am_f = [], [], []
        for ch in range(n_ch):
            grp = 0 if ch < half else 1
            dc = shifts[ch]
            cost = cost_n if grp == 0 else cost_f
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
                msg = msg * (ps == cur)[None, :].astype(cdt)
            l = cost + msg
            if absorb is not None:
                l = jnp.where(inv_n if grp == 0 else inv_f, cost, l)
            l_new.append(l)
            if track:
                (am_n if grp == 0 else am_f).append(_sub_argmin(l, d_pad))
        if edge_cols:
            # emit per-channel L at the static edge columns BEFORE any
            # injection (the tile's own sweep-1 history)
            for i, c in enumerate(edge_cols):
                for ch in range(half):
                    edges_n_ref[j, ch, i] = l_new[ch][:, c].astype(jnp.float32)
                    edges_f_ref[b - 1 - j, ch, i] = l_new[half + ch][:, c].astype(jnp.float32)
        carry_new = list(l_new)
        if inj_lanes:
            # injection feeds the NEXT line's shifts only — the emitted
            # partial sums stay the tile's own values (lax parity)
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, l_new[0].shape, 1)
            for i, lane in enumerate(inj_lanes):
                for ch in range(n_ch):
                    ref = inj_n_ref if ch < half else inj_f_ref
                    jj = j if ch < half else b - 1 - j
                    val = _sanitize(ref[jj, i, ch % half])
                    carry_new[ch] = jnp.where(
                        lane_iota == lane, val[:, None], carry_new[ch]
                    )
        prev = carry_new
        if has_seg:
            prev_seg = [seg_n, seg_f]
        # cast on write: callers may request bf16 partials (exact when every
        # L is an integer <= 256 — see sgm_partials_pallas)
        out_n = l_new[0]
        for ch in range(1, half):
            out_n = out_n + l_new[ch]
        out_f = l_new[half]
        for ch in range(half + 1, n_ch):
            out_f = out_f + l_new[ch]
        out_n_ref[j] = _store_cast(out_n, out_n_ref.dtype, bounded=absorb is not None)
        out_f_ref[b - 1 - j] = _store_cast(out_f, out_f_ref.dtype, bounded=absorb is not None)
        if track:
            amin_n_ref[j] = jnp.concatenate(am_n, axis=0)
            amin_f_ref[b - 1 - j] = jnp.concatenate(am_f, axis=0)
    for ch in range(n_ch):
        carry_ref[ch] = prev[ch]
    if has_seg:
        for grp in range(2):
            segc_ref[grp] = prev_seg[grp]
    if want_final:
        # the outgoing boundary state: the carry after the tile's last
        # line (sent to the mesh neighbor by parallel/sgm_exchange.py)
        @pl.when(g == pl.num_programs(0) - 1)
        def _():
            for ch in range(n_ch):
                final_ref[ch] = prev[ch].astype(final_ref.dtype)


def _pad_nd(a: jnp.ndarray, target: Tuple[int, ...], value) -> jnp.ndarray:
    pads = [(0, t - s) for s, t in zip(a.shape, target)]
    if not any(p[1] for p in pads):
        return a
    return jnp.pad(a, pads, constant_values=value)


class SgmPartials(NamedTuple):
    """8-path directional sums, normal image orientation.

    row_n/row_f: (H8, D8, W8) — down-going / up-going direction triples;
    col_n/col_f: (W8, D8, H8) — left->right / right->left (transposed);
    amins_row: (H8, 6, W8) i32 per-direction argmins or None;
    amins_col: (W8, 2, H8) i32 or None; hwd: the unpadded (h, w, d)."""

    row_n: jnp.ndarray
    row_f: jnp.ndarray
    col_n: jnp.ndarray
    col_f: jnp.ndarray
    amins_row: Optional[jnp.ndarray]
    amins_col: Optional[jnp.ndarray]
    hwd: Tuple[int, int, int]


def _run_pass(
    cost_ldx: jnp.ndarray,  # (L8, D8, X8) padded volume in scan orientation
    shifts: Tuple[int, ...],
    flip_chans,  # [(plane_idx, flipped)] per channel
    p1,
    p2,
    p1_planes,  # (8, L8, X8[, D8]) pre-padded in SCAN orientation or None
    p2_planes,
    segments,  # (L8, X8) int32 in scan orientation or None
    track: bool,
    out_dtype,
    interpret: bool,
    absorb: Optional[float] = None,
    block: int = _BLOCK,
    compute_dtype=jnp.float32,
    init_carry: Optional[jnp.ndarray] = None,  # (n_ch, D8, X8)
    want_final: bool = False,
    edge_cols: Tuple[int, ...] = (),
    inj_lanes: Tuple[int, ...] = (),
    inj: Optional[jnp.ndarray] = None,  # (L8, k, n_ch, D8) physical-line order
):
    """The boundary-state-exchange hooks (``init_carry`` / ``want_final`` /
    ``edge_cols`` / ``inj_lanes``+``inj``) mirror the lax scans'
    (ops/sgm.py::_row_scan/_col_scan) — parallel/sgm_exchange.py's tiled
    SGM on the Pallas backend; pinned pallas == lax by
    tests/test_sgm_pallas.py::test_exchange_hooks_*."""
    l8, d8, x8 = cost_ldx.shape
    b = block if l8 % block == 0 else _BLOCK
    gl = l8 // b
    n_ch = len(shifts)
    half = n_ch // 2

    def mode_of(planes):
        if planes is None:
            return _P_SCALAR
        return _P_DISP if planes.ndim == 4 else _P_PIXEL

    p1_mode, p2_mode = mode_of(p1_planes), mode_of(p2_planes)
    has_seg = segments is not None

    n_spec = pl.BlockSpec((b, d8, x8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((b, d8, x8), lambda g: (gl - 1 - g, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [n_spec, f_spec]
    args = [cost_ldx, cost_ldx]
    for planes, mode in ((p1_planes, p1_mode), (p2_planes, p2_mode)):
        if mode == _P_PIXEL:
            chans = [
                planes[pi][::-1] if fl else planes[pi] for pi, fl in flip_chans
            ]
            args.append(jnp.stack(chans, axis=1))  # (L8, n_ch, X8)
            in_specs.append(
                pl.BlockSpec((b, n_ch, x8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
            )
        elif mode == _P_DISP:
            chans = [
                planes[pi][::-1] if fl else planes[pi] for pi, fl in flip_chans
            ]
            args.append(jnp.stack(chans, axis=1))  # (L8, n_ch, D8, X8)
            in_specs.append(
                pl.BlockSpec(
                    (b, n_ch, d8, x8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
                )
            )
    if has_seg:
        args.append(jnp.stack([segments, segments[::-1]], axis=1))  # (L8, 2, X8)
        in_specs.append(
            pl.BlockSpec((b, 2, x8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        )
    full_spec = pl.BlockSpec(
        (n_ch, d8, x8), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
    )
    if init_carry is not None:
        args.append(init_carry)
        in_specs.append(full_spec)
    if inj_lanes:
        k = len(inj_lanes)
        inj_n = inj[:, :, :half]  # (L8, k, half, D8)
        # NO pre-flip: the flipped half's f-spec block map + [b-1-j]
        # indexing already resolves to the physical line being processed
        inj_f = inj[:, :, half:]
        args += [inj_n, inj_f]
        inj_n_spec = pl.BlockSpec(
            (b, k, half, d8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )
        inj_f_spec = pl.BlockSpec(
            (b, k, half, d8), lambda g: (gl - 1 - g, 0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [inj_n_spec, inj_f_spec]

    vol_sds = jax.ShapeDtypeStruct((l8, d8, x8), out_dtype)
    out_specs = [n_spec, f_spec]
    out_shape = [vol_sds, vol_sds]
    if track:
        am_n_spec = pl.BlockSpec((b, half, x8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        am_f_spec = pl.BlockSpec(
            (b, half, x8), lambda g: (gl - 1 - g, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs += [am_n_spec, am_f_spec]
        out_shape += [jax.ShapeDtypeStruct((l8, half, x8), jnp.int32)] * 2
    if edge_cols:
        ke = len(edge_cols)
        e_sds = jax.ShapeDtypeStruct((l8, half, ke, d8), jnp.float32)
        e_n_spec = pl.BlockSpec(
            (b, half, ke, d8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )
        e_f_spec = pl.BlockSpec(
            (b, half, ke, d8), lambda g: (gl - 1 - g, 0, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs += [e_n_spec, e_f_spec]
        out_shape += [e_sds, e_sds]
    if want_final:
        out_specs.append(full_spec)
        out_shape.append(jax.ShapeDtypeStruct((n_ch, d8, x8), jnp.float32))
    # the bf16/int16 compute dtypes are only wired for the scalar-penalty,
    # segment-free instantiation (the layouts fast path); penalty planes
    # are f32 and would silently promote the recurrence back to f32
    cdt = compute_dtype
    if p1_mode != _P_SCALAR or p2_mode != _P_SCALAR or has_seg:
        cdt = jnp.float32
    if cdt == jnp.int16:
        # python-int penalties keep int16 weak-type promotion (a float
        # scalar would silently lift the whole recurrence to f32)
        if not (float(p1).is_integer() and float(p2).is_integer()):
            raise ValueError("int16 SGM compute requires integer P1/P2")
        p1, p2 = int(p1), int(p2)
    scratch = [pltpu.VMEM((n_ch, d8, x8), cdt)]
    if has_seg:
        scratch.append(pltpu.VMEM((2, x8), jnp.int32))

    exchange = (init_carry is not None, want_final, tuple(edge_cols), tuple(inj_lanes))
    outs = pl.pallas_call(
        partial(
            _scan_kernel, p1, p2, p1_mode, p2_mode, has_seg, track, shifts,
            absorb, cdt, exchange,
        ),
        grid=(gl,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*args)
    it = iter(outs)
    part_n, part_f = next(it), next(it)
    amins = jnp.concatenate([next(it), next(it)], axis=1) if track else None
    extras = {}
    if edge_cols:
        e_n, e_f = next(it), next(it)
        # both halves land in physical-line order (the flipped half's
        # f-spec + [b-1-j] store already un-flips)
        extras["edges"] = jnp.concatenate([e_n, e_f], axis=1)  # (L8, n_ch, k, D8)
    if want_final:
        extras["final"] = next(it)
    return part_n, part_f, amins, extras


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
    # the col pass transposes rows onto the lane axis: round H up to 128
    ht = -(-h // 128) * 128
    wt = -(-w // b) * b

    cost_hwd = _pad_nd(cost, (max(h8, ht), max(w8, wt), d8), _BIG)
    h8 = ht = max(h8, ht)
    w8 = wt = max(w8, wt)
    cost_rdw = jnp.moveaxis(cost_hwd, -1, 1)  # (H8, D8, W8)
    cost_cdh = cost_hwd.transpose(1, 2, 0)  # (W8, D8, H8)

    def pad_planes(planes, transposed):
        """(8, H, W[, D]) → (8, L8, X8[, D8→sublane]) in scan orientation."""
        if planes is None:
            return None
        out = []
        for ch in range(8):
            p = planes[ch].astype(jnp.float32)
            if p.ndim == 2:
                p = _pad_nd(p, (h8, w8), 0.0)
                out.append(p.T if transposed else p)
            else:
                p = _pad_nd(p, (h8, w8, d8), 0.0)
                p = jnp.moveaxis(p, -1, 1)  # (H8, D8, W8)
                out.append(p.transpose(2, 1, 0) if transposed else p)
        return jnp.stack(out)

    seg_pad = None
    if segments is not None:
        seg_pad = _pad_nd(segments.astype(jnp.int32), (h8, w8), -2)

    # ---- row pass: 6 channels on (row, disp, col) -------------------------
    row_n, row_f, amins_row, _ = _run_pass(
        cost_rdw,
        (0, 1, -1, 0, 1, -1),
        [(0, False), (1, False), (2, False), (3, True), (4, True), (5, True)],
        p1,
        p2,
        pad_planes(p1_planes, False),
        pad_planes(p2_planes, False),
        seg_pad,
        min_cost_paths,
        out_dtype,
        interpret,
    )

    # ---- col pass: 2 channels on the transposed (col, disp, row) ----------
    col_n, col_f, amins_col, _ = _run_pass(
        cost_cdh,
        (0, 0),
        [(6, False), (7, True)],
        p1,
        p2,
        pad_planes(p1_planes, True),
        pad_planes(p2_planes, True),
        seg_pad.T if seg_pad is not None else None,
        min_cost_paths,
        out_dtype,
        interpret,
    )

    return SgmPartials(row_n, row_f, col_n, col_f, amins_row, amins_col, (h, w, d))


def sgm_partials_from_layouts(
    cost_rdw: jnp.ndarray,
    cost_cdh: jnp.ndarray,
    hwd: Tuple[int, int, int],
    p1: float,
    p2: float,
    out_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
    block: int = _BLOCK,
    compute_dtype=jnp.float32,
) -> SgmPartials:
    """Partials from PRE-PADDED scan-layout volumes (constant penalties).

    ``cost_rdw`` is (H8, D8, W8) and ``cost_cdh`` (W8, D8, H8), produced
    directly by the matching-cost stage (census_cost_volume_scan_layouts)
    so no intra-tile volume transpose is ever materialized.  Any dtype —
    uint8 volumes with the 255 sentinel quarter the HBM traffic of f32;
    the kernels cast to f32 on load.  Padding must already hold the
    caller's invalid sentinel."""
    flips_row = [(0, False), (1, False), (2, False), (3, True), (4, True), (5, True)]
    # uint8 sentinels (255) are too small to absorb messages by f32
    # rounding — request the explicit restart select in the kernel
    absorb = 255.0 if cost_rdw.dtype == jnp.uint8 else None
    row_n, row_f, _, _ = _run_pass(
        cost_rdw, (0, 1, -1, 0, 1, -1), flips_row, p1, p2,
        None, None, None, False, out_dtype, interpret, absorb, block,
        compute_dtype,
    )
    col_n, col_f, _, _ = _run_pass(
        cost_cdh, (0, 0), [(6, False), (7, True)], p1, p2,
        None, None, None, False, out_dtype, interpret, absorb, block,
        compute_dtype,
    )
    return SgmPartials(row_n, row_f, col_n, col_f, None, None, tuple(hwd))


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
    cols = (parts.col_n + parts.col_f).transpose(2, 0, 1)  # (H8, W8, D8)
    total = (rows + cols)[:h, :w, :d]

    nb_dirs = None
    if min_cost_paths:
        final_arg = jnp.argmin(total, axis=-1).astype(jnp.int32)  # (H, W)
        am_r = parts.amins_row[:h, :, :w]  # (H, 6, W)
        am_c = parts.amins_col[:w, :, :h]  # (W, 2, H)
        per_dir = [am_r[:, i] for i in range(6)]
        per_dir += [am_c[:, 0].T, am_c[:, 1].T]
        nb_dirs = sum((a == final_arg).astype(jnp.float32) for a in per_dir)
    return total, nb_dirs


def _finish_kernel_2d(n_disp, d_pad, threshold, *refs):
    """2-D-grid finish: total = rn + rf + (cn + cf)^T on a (B, D, WB) row
    tile paired with the matching (WB, D, B) col tile — the col partials
    are read in their NATIVE scan layout, so the XLA add+transpose
    materialization of a whole colsum volume disappears (one full-volume
    write + read of HBM traffic saved).

    refs: rn, rf (B, D, WB), cn, cf (WB, D, B) → idx, c0, c1, c2 (B, WB)."""
    rn, rf, cn, cf, idx_ref, c0_ref, c1_ref, c2_ref = refs
    cs = _to_f32(cn[...]) + _to_f32(cf[...])  # (WB, D, B)
    cs_t = jnp.transpose(cs, (2, 1, 0))  # VMEM-local transpose, no HBM
    t = _to_f32(rn[...]) + _to_f32(rf[...]) + cs_t  # (B, D, WB)
    inv = t >= threshold
    g = jnp.where(inv, _BIG, t)
    m = jnp.min(g, axis=1, keepdims=True)  # (B, 1, WB)
    iota = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    idx = jnp.min(jnp.where(g == m, iota, d_pad), axis=1)  # (B, WB)
    idx_c = jnp.clip(idx, 1, n_disp - 2)
    tn = jnp.where(inv, jnp.nan, t)
    ic = idx_c[:, None, :]

    def sel(sel_idx):
        return jnp.sum(jnp.where(iota == sel_idx, tn, 0.0), axis=1)

    all_inv = m[:, 0] >= _BIG * 0.5
    idx_ref[...] = idx
    c0_ref[...] = sel(ic - 1)
    c1_ref[...] = jnp.where(all_inv, jnp.nan, m[:, 0])
    c2_ref[...] = sel(ic + 1)


def _finish_kernel(n_disp, d_pad, threshold, *refs):
    """Grid step: total = row_n + row_f + colsum on (B, D, W) tiles, then
    WTA + vfit-triplet extraction in VMEM — the total volume never
    reaches HBM.

    refs: rn, rf, cs (B, D, W) -> idx (B, W) int32, c0, c1, c2 (B, W).
    Entries >= threshold are the super-cost (invalid) sentinels: excluded
    from the argmin and reported as NaN in the triplet."""
    rn, rf, cs, idx_ref, c0_ref, c1_ref, c2_ref = refs
    t = _to_f32(rn[...]) + _to_f32(rf[...]) + _to_f32(cs[...])  # (B, D, W)
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
    idx_ref[...] = idx
    c0_ref[...] = sel(ic - 1)
    # the cost AT the argmin is the minimum itself — no gather needed
    c1_ref[...] = jnp.where(all_inv, jnp.nan, m[:, 0])
    c2_ref[...] = sel(ic + 1)


def combine_wta_pallas(
    parts: SgmPartials, threshold, interpret: bool = False, two_d: bool = True,
    tile: int = 128,
):
    """Fused Σ-partials + WTA + triplet: one read of the partial volumes,
    no materialized total.  Returns (idx int32, c0, c1, c2) cropped to
    (h, w); idx is the argmin position, c* the costs at idx-1/idx/idx+1
    with NaN where the entry is invalid (c1 NaN ⇔ every disparity invalid,
    the wta() all-NaN convention).

    ``two_d=True`` (default) pairs each (B, D, WB) row tile with its
    matching (WB, D, B) col tile over a 2-D grid and transposes in VMEM —
    the col partials are consumed in their native scan layout, removing
    the whole-volume XLA add+transpose (≈2 volume round trips of HBM
    traffic).  ``two_d=False`` keeps the 1-D materializing variant."""
    h, w, d = parts.hwd
    h8, d8, w8 = parts.row_n.shape
    b = _BLOCK
    gr = h8 // b
    map_sds = jax.ShapeDtypeStruct((h8, w8), jnp.float32)
    idx_sds = jax.ShapeDtypeStruct((h8, w8), jnp.int32)

    if two_d:
        # both tile extents are lane-width multiples: Mosaic requires the
        # minor block dim to be 128-divisible, and both layouts put a
        # spatial axis minor — (T, D, T) row tiles pair with (T, D, T)
        # col tiles
        tb = tile if (h8 % tile == 0 and w8 % tile == 0) else 128
        grb, gw = h8 // tb, w8 // tb
        row_spec = pl.BlockSpec(
            (tb, d8, tb), lambda r, c: (r, 0, c), memory_space=pltpu.VMEM
        )
        col_spec = pl.BlockSpec(
            (tb, d8, tb), lambda r, c: (c, 0, r), memory_space=pltpu.VMEM
        )
        map_spec = pl.BlockSpec((tb, tb), lambda r, c: (r, c), memory_space=pltpu.VMEM)
        idx_i, c0, c1, c2 = pl.pallas_call(
            partial(_finish_kernel_2d, d, d8, threshold),
            grid=(grb, gw),
            in_specs=[row_spec, row_spec, col_spec, col_spec],
            out_specs=(map_spec,) * 4,
            out_shape=(idx_sds, map_sds, map_sds, map_sds),
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(parts.row_n, parts.row_f, parts.col_n, parts.col_f)
    else:
        # one cheap XLA fused add+transpose brings the col partials into
        # the row orientation: (W8, D8, H8) -> (H8, D8, W8)
        colsum = (
            (parts.col_n.astype(jnp.float32) + parts.col_f.astype(jnp.float32))
            .transpose(2, 1, 0)
            .astype(parts.row_n.dtype)
        )
        vol_spec = pl.BlockSpec((b, d8, w8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        map_spec = pl.BlockSpec((b, w8), lambda g: (g, 0), memory_space=pltpu.VMEM)
        idx_i, c0, c1, c2 = pl.pallas_call(
            partial(_finish_kernel, d, d8, threshold),
            grid=(gr,),
            in_specs=[vol_spec] * 3,
            out_specs=(map_spec,) * 4,
            out_shape=(idx_sds, map_sds, map_sds, map_sds),
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(parts.row_n, parts.row_f, colsum)
    if h8 == h and w8 == w:
        return idx_i, c0, c1, c2
    crop = (slice(None, h), slice(None, w))
    return idx_i[crop], c0[crop], c1[crop], c2[crop]


def pallas_supported(
    cost_shape: Tuple[int, int, int], p1_planes, p2_planes, segments, min_cost_paths
) -> bool:
    """Whether the Pallas fast path covers this configuration.

    Since the (line, disp, cross) rewrite this is every
    plugin_libsgm.rst:95-330 configuration row — per-pixel and
    per-(pixel, disp) P1/P2, 3SGM segments and min_cost_paths included.
    The only remaining gates are VMEM capacity for the recurrence carries
    (and per-direction CONSTANT planes, which ride the scalar closure via
    the caller's p1_const/p2_const instead)."""
    h, w, d = cost_shape
    w8 = max(-(-w // 128) * 128, -(-w // _BLOCK) * _BLOCK)
    h8 = max(-(-h // 128) * 128, -(-h // _BLOCK) * _BLOCK)
    d8 = -(-d // 16) * 16
    # VMEM: carries + a few double-buffered blocks must fit
    if 6 * d8 * w8 * 4 > 48 * 1024 * 1024:
        return False
    if 2 * d8 * h8 * 4 > 48 * 1024 * 1024:
        return False
    if p1_planes is not None and p1_planes.ndim == 4 and p2_planes is not None and p2_planes.ndim == 4:
        # per-disp penalty blocks: 2 penalties x (B, 6, D8, W8) double-buffered
        if 2 * 2 * _BLOCK * 6 * d8 * max(w8, h8) * 4 > 80 * 1024 * 1024:
            return False
    return True
