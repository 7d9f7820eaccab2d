"""Pallas TPU kernels for the SGM 8-path recurrence.

The lax.scan formulation (ops/sgm.py) is correct everywhere but leaves the
VPU idle: each scan step moves ~1 MB and computes ~6 M flops, so XLA's
while-loop overhead dominates.  These kernels exploit the TPU grid's
*sequential* execution with automatic double-buffered DMA pipelining:

* row pass: grid over groups of ``_BLOCK`` rows; each grid step advances
  the recurrence ``_BLOCK`` rows for all 6 vertical/diagonal directions at
  once (static in-kernel sub-loop), with the directional L-values carried
  across grid steps in a VMEM scratch.  The 3 up-going directions run on
  the row-flipped volume WITHOUT materializing a flip — their BlockSpec
  index maps address block ``G-1-g`` and the sub-loop walks those rows in
  reverse;
* col pass: the same structure over groups of ``_BLOCK`` columns for the
  2 horizontal directions — no transposed copy of the volume is needed;
* in-row neighbor shifts are sublane shifts on (W, D) tiles with D on the
  lane axis; disparity-neighbor mins are lane shifts;
* image borders and the block-size padding share one mechanism: padded
  cells hold a finite ``_BIG`` cost, so their L-values stay ≥ _BIG and
  the "no valid predecessor ⇒ restart" test handles both.

Constant or per-direction-per-pixel P2 penalties are supported (the
mc_cnn per-disparity penalties, 3SGM segments and min_cost_paths tracking
fall back to the lax implementation).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1.0e30  # finite "no predecessor" sentinel (inf breaks min/NaN rules)
_BLOCK = 8  # rows (cols) advanced per grid step


def _msg(prev, p1, p2):
    """SGM message with reset where there is no valid predecessor.

    prev: (W, D); p1/p2 scalars or (W, 1).  The message is ≥ 0, so padded
    (_BIG) L-values stay ≥ _BIG and the `< _BIG/2` test marks restarts."""
    big_lane = jnp.full_like(prev[:, :1], _BIG)
    d_down = jnp.concatenate([big_lane, prev[:, :-1]], axis=1)
    d_up = jnp.concatenate([prev[:, 1:], big_lane], axis=1)
    min_prev = jnp.min(prev, axis=1, keepdims=True)
    m = jnp.minimum(prev, jnp.minimum(d_down, d_up) + p1)
    m = jnp.minimum(m, min_prev + p2) - min_prev
    valid = (prev[:, :1] < _BIG * 0.5).astype(jnp.float32)
    return m * valid


def _shift_w(a, dc):
    """Shift a (W, D) tile along W: out[w] = a[w - dc], _BIG outside."""
    if dc == 0:
        return a
    big = jnp.full_like(a[:1], _BIG)
    if dc > 0:
        return jnp.concatenate([big, a[:-1]], axis=0)
    return jnp.concatenate([a[1:], big], axis=0)


def _row_kernel(p1, p2, *refs):
    """Grid step: advance the 6 vertical/diagonal directions _BLOCK rows.

    refs: cost_n (B, W, D), cost_f (B, W, D), [p2 (B, 6, W)],
    out_n (B, W, D), out_f (B, W, D), carry (6, W, D)."""
    if p2 is None:
        cost_n_ref, cost_f_ref, p2_ref, out_n_ref, out_f_ref, carry_ref = refs
    else:
        cost_n_ref, cost_f_ref, out_n_ref, out_f_ref, carry_ref = refs
        p2_ref = None
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[...] = jnp.full_like(carry_ref, _BIG)

    shifts = (0, 1, -1)
    prev = carry_ref[...]  # (6, W, D)
    b = cost_n_ref.shape[0]
    for j in range(b):
        cost_n = cost_n_ref[j]  # row g*B + j
        cost_f = cost_f_ref[b - 1 - j]  # flipped row g*B + j
        l_all = []
        for ch in range(6):
            cost = cost_n if ch < 3 else cost_f
            pv = _shift_w(prev[ch], shifts[ch % 3])
            p2c = p2 if p2_ref is None else p2_ref[j, ch][:, None]
            l_all.append(cost + _msg(pv, p1, p2c))
        prev = jnp.stack(l_all)
        # cast on write: callers may request bf16 partials (exact when every
        # L is an integer <= 256 — see sgm_aggregate_partials_pallas)
        out_n_ref[j] = (l_all[0] + l_all[1] + l_all[2]).astype(out_n_ref.dtype)
        out_f_ref[b - 1 - j] = (l_all[3] + l_all[4] + l_all[5]).astype(out_f_ref.dtype)
    carry_ref[...] = prev


def _col_kernel(p1, p2, *refs):
    """Grid step: advance the 2 horizontal directions _BLOCK columns.

    refs: cost_n (H, B, D), cost_f (H, B, D), [p2 (B, 2, H)],
    out_n (H, B, D), out_f (H, B, D), carry (2, H, D)."""
    if p2 is None:
        cost_n_ref, cost_f_ref, p2_ref, out_n_ref, out_f_ref, carry_ref = refs
    else:
        cost_n_ref, cost_f_ref, out_n_ref, out_f_ref, carry_ref = refs
        p2_ref = None
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        carry_ref[...] = jnp.full_like(carry_ref, _BIG)

    prev = carry_ref[...]  # (2, H, D)
    b = cost_n_ref.shape[1]
    for j in range(b):
        cost_n = cost_n_ref[:, j]  # col g*B + j, (H, D)
        cost_f = cost_f_ref[:, b - 1 - j]  # flipped col g*B + j
        l_all = []
        for ch in range(2):
            cost = cost_n if ch == 0 else cost_f
            p2c = p2 if p2_ref is None else p2_ref[j, ch][:, None]
            l_all.append(cost + _msg(prev[ch], p1, p2c))
        prev = jnp.stack(l_all)
        out_n_ref[:, j] = l_all[0].astype(out_n_ref.dtype)
        out_f_ref[:, b - 1 - j] = l_all[1].astype(out_f_ref.dtype)
    carry_ref[...] = prev


def _pad_to(a: jnp.ndarray, h8: int, w8: int, value: float) -> jnp.ndarray:
    h, w = a.shape[0], a.shape[1]
    if h8 == h and w8 == w:
        return a
    pads = [(0, h8 - h), (0, w8 - w)] + [(0, 0)] * (a.ndim - 2)
    return jnp.pad(a, pads, constant_values=value)


def sgm_aggregate_partials_pallas(
    cost: jnp.ndarray,
    p1: float,
    p2: float,
    p2_planes: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    out_dtype: jnp.dtype = jnp.float32,
):
    """The 8 directional path costs as 4 partial (h8, w8, d) volumes
    (row-pass down/up triples, col-pass left/right) plus the padded shape —
    callers either sum them (sgm_aggregate_pallas) or feed them to the
    fused combine+WTA kernel without materializing the total.

    ``out_dtype=bfloat16`` halves the partials' HBM traffic and is EXACT
    when every L-value is an integer ≤ 256: integer P1/P2 and
    3·(cmax + P2) ≤ 256 (each directional L ≤ cmax + P2; row triples sum
    three of them).  The 1e12 invalid sentinel survives bf16 rounding far
    above the combine threshold."""
    h, w, d = cost.shape
    b = _BLOCK
    h8 = -(-h // b) * b
    w8 = -(-w // b) * b
    gr, gc = h8 // b, w8 // b
    cpad = _pad_to(cost, h8, w8, _BIG)
    params = pltpu.CompilerParams(vmem_limit_bytes=int(100 * 1024 * 1024))
    out_sds = (
        jax.ShapeDtypeStruct((h8, w8, d), out_dtype),
        jax.ShapeDtypeStruct((h8, w8, d), out_dtype),
    )

    # ---- row pass: 6 channels ------------------------------------------
    n_spec = pl.BlockSpec((b, w8, d), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((b, w8, d), lambda g: (gr - 1 - g, 0, 0), memory_space=pltpu.VMEM)
    if p2_planes is None:
        kernel = partial(_row_kernel, p1, p2)
        in_specs = [n_spec, f_spec]
        args = (cpad, cpad)
    else:
        # (H8, 6, W8) rows of per-channel P2.  Pad FIRST, then mirror the
        # flipped channels' planes: the cost refs walk the flip of the
        # PADDED volume, so flipped sub-step t reads padded row H8-1-t.
        pl8 = _pad_to(jnp.moveaxis(p2_planes.astype(jnp.float32), 0, -1), h8, w8, 0.0)
        pl8 = jnp.moveaxis(pl8, -1, 0)  # (8, H8, W8)
        p2_rows = jnp.stack(
            [pl8[0], pl8[1], pl8[2], pl8[3][::-1], pl8[4][::-1], pl8[5][::-1]]
        )  # (6, H8, W8)
        p2_rows = jnp.moveaxis(p2_rows, 0, 1)  # (H8, 6, W8)
        kernel = partial(_row_kernel, p1, None)
        p2_spec = pl.BlockSpec((b, 6, w8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        in_specs = [n_spec, f_spec, p2_spec]
        args = (cpad, cpad, p2_rows)

    row_n, row_f = pl.pallas_call(
        kernel,
        grid=(gr,),
        in_specs=in_specs,
        out_specs=(n_spec, f_spec),
        out_shape=out_sds,
        scratch_shapes=[pltpu.VMEM((6, w8, d), jnp.float32)],
        compiler_params=params,
        interpret=interpret,
    )(*args)

    # ---- col pass: 2 channels ------------------------------------------
    cn_spec = pl.BlockSpec((h8, b, d), lambda g: (0, g, 0), memory_space=pltpu.VMEM)
    cf_spec = pl.BlockSpec((h8, b, d), lambda g: (0, gc - 1 - g, 0), memory_space=pltpu.VMEM)
    if p2_planes is None:
        ckernel = partial(_col_kernel, p1, p2)
        cin_specs = [cn_spec, cf_spec]
        cargs = (cpad, cpad)
    else:
        pl8 = _pad_to(jnp.moveaxis(p2_planes.astype(jnp.float32), 0, -1), h8, w8, 0.0)
        pl8 = jnp.moveaxis(pl8, -1, 0)  # (8, H8, W8), padded then mirrored
        p2_cols = jnp.stack([pl8[6], pl8[7][:, ::-1]])  # (2, H8, W8)
        p2_cols = jnp.moveaxis(p2_cols, (0, 1), (1, 2))  # (W8, 2, H8)
        ckernel = partial(_col_kernel, p1, None)
        cp2_spec = pl.BlockSpec((b, 2, h8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        cin_specs = [cn_spec, cf_spec, cp2_spec]
        cargs = (cpad, cpad, p2_cols)

    col_n, col_f = pl.pallas_call(
        ckernel,
        grid=(gc,),
        in_specs=cin_specs,
        out_specs=(cn_spec, cf_spec),
        out_shape=out_sds,
        scratch_shapes=[pltpu.VMEM((2, h8, d), jnp.float32)],
        compiler_params=params,
        interpret=interpret,
    )(*cargs)

    return (row_n, row_f, col_n, col_f), (h8, w8)


def sgm_aggregate_pallas(
    cost: jnp.ndarray,
    p1: float,
    p2: float,
    p2_planes: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sum of the 8 directional path costs (constant P1; P2 constant or
    per-direction-per-pixel (8, H, W) in ops/sgm.ALL_DIRS order).

    ``cost`` must be finite (caller replaces NaN).  Matches
    ops.sgm.sgm_aggregate without segments/min_cost_paths/overcounting.
    """
    h, w = cost.shape[:2]
    (row_n, row_f, col_n, col_f), _ = sgm_aggregate_partials_pallas(
        cost, p1, p2, p2_planes, interpret
    )
    total = row_n + row_f + col_n + col_f
    return total[:h, :w]


def _combine_wta_kernel(n_disp, threshold, *refs):
    """Grid step: total = Σ 4 partials, then WTA + vfit-triplet extraction
    in VMEM — the total volume never reaches HBM.

    refs: rn, rf, cn, cf (B, W, D) → idx (B, W) f32, c0, c1, c2 (B, W).
    Entries ≥ threshold are the super-cost (invalid) sentinels: excluded
    from the argmin and reported as NaN in the triplet."""
    rn, rf, cn, cf, idx_ref, c0_ref, c1_ref, c2_ref = refs
    f32 = jnp.float32
    t = (
        rn[...].astype(f32) + rf[...].astype(f32) + cn[...].astype(f32) + cf[...].astype(f32)
    )  # (B, W, D)
    inv = t >= threshold
    g = jnp.where(inv, _BIG, t)
    m = jnp.min(g, axis=2, keepdims=True)  # (B, W, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, g.shape, 2)
    # first-occurrence argmin (numpy tie-breaking)
    idx = jnp.min(jnp.where(g == m, iota, n_disp), axis=2)  # (B, W)
    idx_c = jnp.clip(idx, 1, n_disp - 2)
    tn = jnp.where(inv, jnp.nan, t)

    def sel(i):
        return jnp.sum(jnp.where(iota == i[..., None], tn, 0.0), axis=2)

    all_inv = m[..., 0] >= _BIG * 0.5
    idx_ref[...] = idx.astype(jnp.float32)
    c0_ref[...] = sel(idx_c - 1)
    c1_ref[...] = jnp.where(all_inv, jnp.nan, sel(idx))
    c2_ref[...] = sel(idx_c + 1)


def combine_wta_pallas(partials, hw, n_disp, threshold, interpret: bool = False):
    """Fused Σ-partials + WTA + triplet: one read of the 4 partial volumes,
    no materialized total.  Returns (idx int32, c0, c1, c2) cropped to
    (h, w); idx is the argmin position, c* the costs at idx-1/idx/idx+1
    with NaN where the entry is invalid (c1 NaN ⇔ every disparity invalid,
    the wta() all-NaN convention)."""
    h, w = hw
    h8, w8, d = partials[0].shape
    b = _BLOCK
    gr = h8 // b
    vol_spec = pl.BlockSpec((b, w8, d), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((b, w8), lambda g: (g, 0), memory_space=pltpu.VMEM)
    map_sds = jax.ShapeDtypeStruct((h8, w8), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=int(100 * 1024 * 1024))
    idx_f, c0, c1, c2 = pl.pallas_call(
        partial(_combine_wta_kernel, n_disp, threshold),
        grid=(gr,),
        in_specs=[vol_spec] * 4,
        out_specs=(map_spec,) * 4,
        out_shape=(map_sds,) * 4,
        compiler_params=params,
        interpret=interpret,
    )(*partials)
    crop = (slice(None, h), slice(None, w))
    return idx_f[crop].astype(jnp.int32), c0[crop], c1[crop], c2[crop]


def pallas_supported(cost_shape: Tuple[int, int, int], p1_planes, p2_planes, segments, min_cost_paths) -> bool:
    """Whether the Pallas fast path covers this configuration."""
    h, w, d = cost_shape
    if segments is not None or min_cost_paths:
        return False
    if not (p1_planes.ndim == 3 and p1_planes.shape[1] == 1 and p1_planes.shape[2] == 1):
        return False  # per-pixel P1 (mc_cnn) not supported in the kernel
    if p2_planes.ndim == 4:
        return False
    # VMEM: the (6, W, D) / (2, H, D) carries plus a few blocks must fit
    if 6 * w * d * 4 > 64 * 1024 * 1024:
        return False
    if 2 * h * d * 4 > 64 * 1024 * 1024:
        return False
    return True
