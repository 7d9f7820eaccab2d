"""Census transform and Hamming-distance cost volume.

TPU-native re-design of the reference census matching cost
(matching_cost/cpp/src/census.cpp:45-180):

* signatures are bit-packed into uint32 lanes (the reference packs into
  bytes); up to 13x13 windows = 169 bits = 6 words;
* the Hamming cost uses ``lax.population_count`` on XOR'd signatures,
  vectorized over the whole (row, col) plane per disparity and scanned over
  the integer disparity axis with a sliding dynamic slice — no per-pixel
  loops anywhere;
* sub-pixel disparities reuse the same machinery on linearly shifted right
  images (one column shorter, census.cpp:142-158).

Cost-volume layout is ``(row, col, disp)`` float32 with NaN for
never-computed entries, matching the reference exactly (census.py:117-122).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shift import shift_subpix


def census_transform(im: jnp.ndarray, win_c: int, win_r: int) -> jnp.ndarray:
    """Bit-packed census signatures, shape (row, col, nwords) uint32.

    Bit b of the signature is 1 iff the window pixel (row-major scan) is
    strictly greater than the center (census.cpp:76-81).  Border centers get
    signatures computed against edge-replicated pixels; they are never used
    (border costs are NaN-masked).
    """
    hh, hw = win_r // 2, win_c // 2
    n_bits = win_r * win_c
    n_words = -(-n_bits // 32)
    padded = jnp.pad(im, ((hh, hh), (hw, hw)), mode="edge")
    h, w = im.shape
    words = [jnp.zeros((h, w), jnp.uint32) for _ in range(n_words)]
    bit = 0
    for dr in range(win_r):
        for dc in range(win_c):
            neighbor = padded[dr : dr + h, dc : dc + w]
            b = (neighbor > im).astype(jnp.uint32)
            word, pos = bit // 32, bit % 32
            words[word] = words[word] | (b << jnp.uint32(31 - pos))
            bit += 1
    return jnp.stack(words, axis=-1)


def census_transform_pallas(im: jnp.ndarray, win: int, interpret: bool = False) -> jnp.ndarray:
    """Bit-packed census signatures as ONE Pallas pass, (row, col, nwords)
    int32 (bit layout identical to :func:`census_transform`).

    The XLA formulation is HBM-bound: the 25-step accumulate chain does
    not fuse, so every window offset re-reads the image.  Here the window
    row offsets become ``win`` cheap pre-shifted views (XLA copies, ~4 MB
    each) read block-by-block, and the packing chain lives entirely in
    registers; column offsets are static lane slices."""
    import jax  # local: keep module import light
    from functools import partial as _partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = im.shape
    hh = hw = win // 2
    n_bits = win * win
    n_words = -(-n_bits // 32)
    b = 8
    h8 = -(-h // b) * b
    padded = jnp.pad(im, ((hh, hh + (h8 - h)), (hw, hw)), mode="edge")
    views = [padded[dr : dr + h8] for dr in range(win)]  # (h8, w + 2hw) each

    def kernel(*refs):
        in_refs, out_refs = refs[:win], refs[win:]
        center = in_refs[hh][...][:, hw : hw + w]
        accs = [jnp.zeros((b, w), jnp.int32) for _ in range(n_words)]
        bit = 0
        for dr in range(win):
            row = in_refs[dr][...]
            for dc in range(win):
                nb = row[:, dc : dc + w]
                word, pos = bit // 32, bit % 32
                accs[word] = accs[word] | ((nb > center).astype(jnp.int32) << (31 - pos))
                bit += 1
        for word in range(n_words):
            out_refs[word][...] = accs[word]

    view_spec = pl.BlockSpec((b, w + 2 * hw), lambda g: (g, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b, w), lambda g: (g, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(h8 // b,),
        in_specs=[view_spec] * win,
        out_specs=(out_spec,) * n_words,
        out_shape=(jax.ShapeDtypeStruct((h8, w), jnp.int32),) * n_words,
        interpret=interpret,
    )(*views)
    return jnp.stack([o[:h] for o in outs], axis=-1)


def _use_pallas_census(window_size: int = 5) -> bool:
    """Compiled-Pallas census is gated to single-word windows (3, 5).

    Mosaic (as shipped on this TPU runtime) miscompiles kernels whose
    accumulated bit-pack expression exceeds ~26 slice-compare terms: for
    window >= 7 the compiled signatures differ from the XLA formulation
    (interpret mode is correct, association/alignment/dtype variants all
    reproduce it — see tests/test_tpu_hw.py::test_census_transform_words).
    win=5 (25 terms) sits under the threshold and is verified bit-exact."""
    if window_size * window_size > 32:
        return False
    try:
        import jax

        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False


def _hamming_plane(lsig: jnp.ndarray, rsig: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Sum of popcounts of XOR'd signature words → (row, col).

    Census costs are <= 13² = 169, so a uint8 result is exact — the scan-
    layout path requests it to quarter the materialized volume traffic."""
    x = jax.lax.population_count(lsig ^ rsig)
    return jnp.sum(x, axis=-1).astype(dtype)


def _scan_integer_disps_rows(lsig_t, rsig_padded_t, n_int, width, chunk: int = 16, dtype=jnp.float32):
    """Transposed-orientation variant of :func:`_scan_integer_disps`: the
    signatures are (X, H, nwords) and the disparity slide runs along axis
    0 (the sublane-major axis), yielding (n_int, X, H) planes — the col-
    pass layout is then a cheap major-axis moveaxis, never an intra-tile
    volume transpose."""
    n_pad = -(-n_int // chunk) * chunk
    rsig_padded_t = jnp.pad(
        rsig_padded_t, ((0, n_pad - n_int + chunk), (0, 0), (0, 0))
    )

    def step(_, k0):
        rs = jax.lax.dynamic_slice_in_dim(rsig_padded_t, k0, width + chunk - 1, axis=0)
        planes = [_hamming_plane(lsig_t, rs[j : j + width], dtype) for j in range(chunk)]
        return None, jnp.stack(planes)

    _, costs = jax.lax.scan(step, None, jnp.arange(0, n_pad, chunk))
    return costs.reshape(n_pad, *lsig_t.shape[:2])[:n_int]


def _scan_integer_disps(lsig, rsig_padded, n_int, width, chunk: int = 16, dtype=jnp.float32):
    """Hamming cost per integer disparity via sliding dynamic slices —
    materialization-friendly: the (n_int, H, W) result is written with
    dense (8,128) tiles per plane.  Used when the CV feeds a Pallas kernel
    (a fully unrolled concat's operands would each be lane-padded to 128
    by layout assignment, a 128x footprint blow-up).

    The scan advances ``chunk`` disparities per step (static sub-slices of
    one dynamic slice) to amortize the while-loop overhead."""
    n_pad = -(-n_int // chunk) * chunk
    # widen so the last chunk's static sub-slices stay in bounds
    rsig_padded = jnp.pad(rsig_padded, ((0, 0), (0, n_pad - n_int + chunk), (0, 0)))

    def step(_, k0):
        rs = jax.lax.dynamic_slice_in_dim(rsig_padded, k0, width + chunk - 1, axis=1)
        planes = [_hamming_plane(lsig, rs[:, j : j + width], dtype) for j in range(chunk)]
        return None, jnp.stack(planes)

    _, costs = jax.lax.scan(step, None, jnp.arange(0, n_pad, chunk))
    return costs.reshape(n_pad, *lsig.shape[:2])[:n_int]


def census_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    dmin: int,
    dmax: int,
    subpix: int = 1,
    window_size: int = 5,
    unroll: bool = False,
    invalid_value: float = float("nan"),
) -> jnp.ndarray:
    """Dense census cost volume (row, col, disp) float32, NaN where the
    reference never writes a cost (borders / right window out of image,
    census.cpp:132-172).

    disp axis follows the reference subpix-expanded range
    (matching_cost.py:409-427): d_k = dmin + k/subpix, D = (dmax-dmin)*subpix+1.

    ``unroll=True`` emits one static slice per disparity, letting XLA fuse
    the whole volume into its consumer (2.5x faster when the consumer is a
    fusable reduction like WTA); keep the default scan when the CV must be
    materialized (Pallas SGM, the modular step API).
    """
    h, w = left.shape
    hw = window_size // 2
    n_int = dmax - dmin + 1
    n_disp = (dmax - dmin) * subpix + 1

    transform = (
        (lambda im: census_transform_pallas(im, window_size))
        if _use_pallas_census(window_size)
        else (lambda im: census_transform(im, window_size, window_size))
    )
    lsig = transform(left)
    rights = shift_subpix(right, subpix)

    per_shift = []
    for i, r_im in enumerate(rights):
        rsig = transform(r_im)
        wi = rsig.shape[1]
        # lay out columns so disparity index k reads slice starting at col k:
        # position of right_x = col + dmin + k  →  pad left by -dmin... but
        # keep it simple: col_in_padded = col + (k + dmin) + pad_l with
        # pad_l = max(0, -dmin); slice start = k + dmin + pad_l >= 0.
        pad_l = max(0, -dmin)
        pad_r = max(0, dmax + w - wi) + max(0, -(dmin + pad_l)) + 1
        rsig_p = jnp.pad(rsig, ((0, 0), (pad_l, pad_r), (0, 0)))
        start0 = dmin + pad_l
        rsig_p = rsig_p[:, start0:] if start0 > 0 else jnp.pad(rsig_p, ((0, 0), (-start0, 0), (0, 0)))
        if unroll:
            per_shift.append([_hamming_plane(lsig, rsig_p[:, k : k + w]) for k in range(n_int)])
        else:
            per_shift.append(_scan_integer_disps(lsig, rsig_p, n_int, w))

    # interleave sub-pixel shifts: cv index k = (dd - dmin) * subpix + i
    if unroll:
        planes = [per_shift[k % subpix][k // subpix] for k in range(n_disp)]
        cv = jnp.stack(planes, axis=-1)  # (H, W, D), fused into the consumer
    else:
        stacked = jnp.stack(per_shift, axis=1)  # (n_int, subpix, H, W)
        cv = stacked.reshape(n_int * subpix, h, w)[:n_disp]
        cv = jnp.moveaxis(cv, 0, -1)  # (H, W, D)

    # ---- validity pattern (reference loop bounds, census.cpp:132-158) ----
    cols = jnp.arange(w)[:, None]  # (W, 1)
    k = jnp.arange(n_disp)[None, :]  # (1, D)
    d_int = dmin + k // subpix
    i_shift = k % subpix
    right_x = cols + d_int
    valid = (cols >= hw) & (cols < w - hw) & (right_x >= hw) & (right_x < w - hw)
    valid &= jnp.where(i_shift > 0, right_x < w - hw - 1, True)
    rows_valid = (jnp.arange(h) >= hw) & (jnp.arange(h) < h - hw)
    mask = rows_valid[:, None, None] & valid[None, :, :]
    # invalid_value defaults to the reference's NaN; the fused SGM path
    # passes its finite super-cost sentinel here instead, fusing the
    # NaN→super substitution into this masking pass (one less HBM round
    # trip over the volume)
    return jnp.where(mask, cv, jnp.float32(invalid_value))


def census_cmax(window_size: int) -> float:
    """Maximal census cost (census.py:116-122)."""
    return float(window_size**2)


# uint8 invalid-cost sentinel for the fused SGM path: valid census costs
# are <= window² <= 169, and any directional SGM L-value is <= cmax + P2,
# so 255 dominates per direction whenever cmax + P2 < 255 and 8-path
# totals of invalid entries (>= 8*255 = 2040) separate from valid ones
# (<= 8*(cmax+P2)) with a wide margin even under bf16 partial rounding.
U8_INVALID = 255


def _cv_rdw_kernel(
    n_disp, d8, subpix, n_words, dmin, hw, h, w, block, invalid_u8, has_mask, *refs
):
    """Grid step: one (B, D8, W8) row-layout cost block from signature
    lines — Hamming + validity + input-mask sentinel in registers, the
    volume is written to HBM exactly once.

    refs: lsig words (B, W8) i32, per-shift rsig words (B, WP) i32,
    [linv (B, W8) i32, per-shift rinv (B, WP) i32], out (B, D8, W8) u8."""
    import jax

    it = iter(refs[:-1])
    out_ref = refs[-1]
    lw = [next(it)[...] for _ in range(n_words)]
    rw = [[next(it)[...] for _ in range(n_words)] for _ in range(subpix)]
    if has_mask:
        linv = next(it)[...]
        rinv = [next(it)[...] for _ in range(subpix)]
    g = pl.program_id(0)
    bsz, w8 = lw[0].shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bsz, w8), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (bsz, w8), 0) + g * block
    row_ok = (row >= hw) & (row < h - hw)
    inval_sent = jnp.full((bsz, w8), invalid_u8, jnp.int32)
    for k in range(d8):
        if k >= n_disp:
            out_ref[:, k, :] = inval_sent.astype(out_ref.dtype)
            continue
        i, dd = k % subpix, k // subpix
        acc = jax.lax.population_count(lw[0] ^ rw[i][0][:, dd : dd + w8])
        for wd in range(1, n_words):
            acc = acc + jax.lax.population_count(lw[wd] ^ rw[i][wd][:, dd : dd + w8])
        right_x = col + (dmin + dd)
        ok = row_ok & (col >= hw) & (col < w - hw) & (right_x >= hw)
        if i > 0:
            ok = ok & (right_x < w - hw - 1)
        else:
            ok = ok & (right_x < w - hw)
        if has_mask:
            iv = (linv | rinv[i][:, dd : dd + w8]) != 0
            ok = ok & ~iv
        out_ref[:, k, :] = jnp.where(ok, acc, inval_sent).astype(out_ref.dtype)


def census_cv_rdw_pallas(
    lsig: jnp.ndarray,
    rsigs_p: Sequence[jnp.ndarray],
    dmin: int,
    n_disp: int,
    subpix: int,
    window_size: int,
    hwd,
    dtype=jnp.uint8,
    left_invalid=None,
    right_invalids=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row-scan-layout census cost volume (H8, D8, W8) in ONE Pallas pass.

    ``lsig``: (H, W, nwords) i32 left signatures; ``rsigs_p``: per-subpix
    right signatures already column-aligned so disparity k reads the
    static lane slice [dd : dd+W] (the pad_right_sig convention).  The
    Hamming popcount, the reference validity bounds (census.cpp:132-158),
    the cv_masked input-mask invalidation and the grid padding all happen
    in registers — the volume hits HBM exactly once (the XLA chain in
    :func:`census_cost_volume_scan_layouts` materializes it ~3x)."""
    from functools import partial as _partial

    h, w = hwd[0], hwd[1]
    n_words = lsig.shape[-1]
    hw_off = window_size // 2
    b = 8
    d_tile = 32 if dtype == jnp.uint8 else 16
    h8 = -(-h // 128) * 128
    w8 = -(-w // 128) * 128
    d8 = -(-n_disp // d_tile) * d_tile
    invalid_u8 = U8_INVALID if dtype == jnp.uint8 else None
    if invalid_u8 is None:
        raise ValueError("census_cv_rdw_pallas emits uint8 volumes only")

    # lane-pad every signature plane; rows pad to the full grid height.
    # wp covers the deepest static slice dd + w8 (dd <= d8)
    wp = -(-(w8 + d8) // 128) * 128

    def prep(plane, width):  # (Hx, Wx) -> (H8, width) i32
        p = plane.astype(jnp.int32)
        return jnp.pad(
            p, ((0, h8 - p.shape[0]), (0, max(0, width - p.shape[1])))
        )[:, :width]

    args = [prep(lsig[..., wd], w8) for wd in range(n_words)]
    for rs in rsigs_p:
        args.extend(prep(rs[..., wd], wp) for wd in range(n_words))
    has_mask = left_invalid is not None or right_invalids is not None
    if has_mask:
        li = (
            left_invalid
            if left_invalid is not None
            else jnp.zeros((h, w), jnp.int32)
        )
        if right_invalids is None:
            # left-only masking: mirror the left default with zero planes
            right_invalids = [jnp.zeros((h, w), jnp.int32)] * subpix
        args.append(prep(li, w8))
        for ri in right_invalids:
            args.append(prep(ri, wp))

    lspec = pl.BlockSpec((b, w8), lambda g: (g, 0), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((b, wp), lambda g: (g, 0), memory_space=pltpu.VMEM)
    in_specs = [lspec] * n_words + [rspec] * (n_words * subpix)
    if has_mask:
        in_specs += [lspec] + [rspec] * len(right_invalids)
    out_spec = pl.BlockSpec((b, d8, w8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _partial(
            _cv_rdw_kernel,
            n_disp,
            d8,
            subpix,
            n_words,
            dmin,
            hw_off,
            h,
            w,
            b,
            invalid_u8,
            has_mask,
        ),
        grid=(h8 // b,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((h8, d8, w8), dtype),
        interpret=interpret,
    )(*args)


def census_cost_volume_scan_layouts(
    left: jnp.ndarray,
    right: jnp.ndarray,
    dmin: int,
    dmax: int,
    subpix: int = 1,
    window_size: int = 5,
    dtype: jnp.dtype = jnp.uint8,
    left_invalid=None,
    right_invalid=None,
    col_layout: bool = True,
    interpret: bool = False,
):
    """Census cost volume directly in BOTH SGM scan layouts:

    * ``cost_rdw`` (H8, D8, W8) — rows major, disp on sublanes, cols on
      lanes (the row-pass layout);
    * ``cost_cdh`` (W8, D8, H8) — the col-pass layout, built from
      TRANSPOSED signatures so no intra-tile volume transpose is ever
      materialized (only cheap major-axis moveaxis copies).

    Shapes are pre-padded for the Pallas grid (lines to a multiple of
    128 for the opposite pass's lane axis, D to the dtype's sublane
    tile); padding and never-computed entries (reference loop bounds,
    census.cpp:132-172) hold the invalid sentinel: 255 for uint8 —
    exact, 4x less HBM traffic than f32 — or the f32 super-cost.

    ``left_invalid`` / ``right_invalid`` are optional (H, W) bools (True =
    pixel invalidated by the input mask, window-dilated for nodata) that
    bake the reference's ``cv_masked`` invalidation
    (matching_cost.py:770-872) into the sentinel pass: an entry is
    invalid when its left pixel is, or the right pixel it reads at
    ``col + floor(d)`` is (fractional shifts OR the two source columns,
    the masks_dilatation 2-column-sum convention).
    Returns (cost_rdw, cost_cdh, hwd).
    """
    from ..fused import _SUPER  # noqa: PLC0415 (cycle-free: constant only)

    h, w = left.shape
    n_int = dmax - dmin + 1
    n_disp = (dmax - dmin) * subpix + 1
    hw = window_size // 2
    d_tile = 32 if dtype == jnp.uint8 else 16
    h8 = -(-h // 128) * 128
    w8 = -(-w // 128) * 128
    d8 = -(-n_disp // d_tile) * d_tile
    invalid = U8_INVALID if dtype == jnp.uint8 else _SUPER

    # the single-pass TRANSFORM kernel is gated to 1-word windows (Mosaic
    # bug, _use_pallas_census); the VOLUME kernel below is safe for every
    # window — it consumes whichever signatures are correct on this device
    use_cv_kernel = interpret
    if not use_cv_kernel:
        try:
            use_cv_kernel = jax.devices()[0].platform not in ("cpu", "gpu")
        except Exception:
            use_cv_kernel = False
    transform = (
        (lambda im: census_transform_pallas(im, window_size, interpret=interpret))
        if (_use_pallas_census(window_size) or interpret)
        else (lambda im: census_transform(im, window_size, window_size))
    )
    lsig = transform(left)
    rights = shift_subpix(right, subpix)

    def pad_right_sig(rsig):
        wi = rsig.shape[1]
        pad_l = max(0, -dmin)
        pad_r = max(0, dmax + w - wi) + max(0, -(dmin + pad_l)) + 1
        rsig_p = jnp.pad(rsig, ((0, 0), (pad_l, pad_r), (0, 0)))
        start0 = dmin + pad_l
        if start0 > 0:
            return rsig_p[:, start0:]
        return jnp.pad(rsig_p, ((0, 0), (-start0, 0), (0, 0)))

    if dtype == jnp.uint8 and use_cv_kernel:
        # one-pass volume kernel: Hamming + validity + input-mask sentinel
        # in registers, volume written once; the col layout is ONE XLA u8
        # transpose (measured faster than a second Hamming volume from
        # transposed signatures, scripts/sweep_census.py)
        rsig_ps = [pad_right_sig(transform(r_im)) for r_im in rights]
        rinvs = None
        if left_invalid is not None or right_invalid is not None:
            from .cost_volume import pad_for_offset_scan

            base = [
                right_invalid
                if right_invalid is not None
                else jnp.zeros((h, w), jnp.int32)
            ]
            if subpix > 1:
                if right_invalid is not None:
                    base.append(right_invalid[:, :-1] | right_invalid[:, 1:])
                else:
                    base.append(jnp.zeros((h, w - 1), jnp.int32))
            padded = [
                pad_for_offset_scan(m.astype(jnp.int32), dmin, dmax, w)
                for m in base
            ]
            rinvs = [padded[min(i, len(padded) - 1)] for i in range(subpix)]
        cost_rdw = census_cv_rdw_pallas(
            lsig,
            rsig_ps,
            dmin,
            n_disp,
            subpix,
            window_size,
            (h, w),
            dtype,
            left_invalid,
            rinvs,
            interpret,
        )
        cost_cdh = jnp.transpose(cost_rdw, (2, 1, 0)) if col_layout else None
        return cost_rdw, cost_cdh, (h, w, n_disp)

    # transposing the small (H, W, words) signatures once is cheap; the
    # volume itself is then produced directly in each scan orientation
    # uint8 planes when the target dtype is uint8: the stacked (D, H, W)
    # intermediates then move 4x less HBM than f32
    plane_dtype = jnp.uint8 if dtype == jnp.uint8 else jnp.float32
    lsig_t = jnp.swapaxes(lsig, 0, 1) if col_layout else None
    per_shift_n, per_shift_t = [], []
    for r_im in rights:
        rsig = transform(r_im)
        rsig_p = pad_right_sig(rsig)
        per_shift_n.append(_scan_integer_disps(lsig, rsig_p, n_int, w, dtype=plane_dtype))
        if col_layout:
            per_shift_t.append(
                _scan_integer_disps_rows(
                    lsig_t, jnp.swapaxes(rsig_p, 0, 1), n_int, w, dtype=plane_dtype
                )
            )  # (n_int, W, H)

    def interleave(per_shift, axis_shape):
        stacked = jnp.stack(per_shift, axis=1)  # (n_int, subpix, L, X)
        cv = stacked.reshape(n_int * subpix, *axis_shape)[:n_disp]
        return cv  # (D, L, X)

    cv_dhw = interleave(per_shift_n, (h, w))  # (D, H, W)
    cv_dwh = interleave(per_shift_t, (w, h)) if col_layout else None  # (D, W, H)

    # ---- validity pattern (reference loop bounds, census.cpp:132-158) ----
    cols = jnp.arange(w)[:, None]  # (W, 1)
    k = jnp.arange(n_disp)[None, :]  # (1, D)
    d_int = dmin + k // subpix
    i_shift = k % subpix
    right_x = cols + d_int
    valid_wd = (cols >= hw) & (cols < w - hw) & (right_x >= hw) & (right_x < w - hw)
    valid_wd &= jnp.where(i_shift > 0, right_x < w - hw - 1, True)
    rows_valid = (jnp.arange(h) >= hw) & (jnp.arange(h) < h - hw)

    inval = jnp.asarray(invalid, dtype)
    mask_dhw = jnp.broadcast_to(
        valid_wd.T[:, None, :] & rows_valid[None, :, None], (n_disp, h, w)
    )  # (D, H, W)
    mask_dwh = (
        jnp.broadcast_to(
            valid_wd.T[:, :, None] & rows_valid[None, None, :], (n_disp, w, h)
        )
        if col_layout
        else None
    )  # (D, W, H)

    # ---- input-mask invalidation (cv_masked, matching_cost.py:770-872) ---
    if left_invalid is not None or right_invalid is not None:
        from .cost_volume import pad_for_offset_scan

        linv = (
            left_invalid if left_invalid is not None else jnp.zeros((h, w), bool)
        )
        if right_invalid is not None:
            r_invs = [right_invalid]
            if subpix > 1:
                # fractional shifts sample between columns c and c+1: invalid
                # if either source column is (masks_dilatation 2-col sum)
                r_invs.append(right_invalid[:, :-1] | right_invalid[:, 1:])
        else:
            r_invs = [jnp.zeros((h, w), bool)]
            if subpix > 1:
                r_invs.append(jnp.zeros((h, w - 1), bool))
        gathered = []
        for m in r_invs:
            mp = pad_for_offset_scan(m, dmin, dmax, w)
            gathered.append([mp[:, dd : dd + w] for dd in range(n_int)])
        inval_planes = []
        for kk in range(n_disp):
            i = min(kk % subpix, len(r_invs) - 1)
            dd = kk // subpix
            inval_planes.append(linv | gathered[i][dd])
        mask_dhw = mask_dhw & ~jnp.stack(inval_planes)
        if col_layout:
            mask_dwh = mask_dwh & ~jnp.stack([p.T for p in inval_planes])

    cv_dhw = jnp.where(mask_dhw, cv_dhw.astype(dtype), inval)

    # major-axis moveaxis (tile addresses permute, no intra-tile shuffle)
    cost_rdw = jnp.moveaxis(cv_dhw, 0, 1)  # (H, D, W)
    cost_rdw = jnp.pad(
        cost_rdw,
        ((0, h8 - h), (0, d8 - n_disp), (0, w8 - w)),
        constant_values=invalid,
    )
    if not col_layout:
        return cost_rdw, None, (h, w, n_disp)
    cv_dwh = jnp.where(mask_dwh, cv_dwh.astype(dtype), inval)
    cost_cdh = jnp.moveaxis(cv_dwh, 0, 1)  # (W, D, H)
    cost_cdh = jnp.pad(
        cost_cdh,
        ((0, w8 - w), (0, d8 - n_disp), (0, h8 - h)),
        constant_values=invalid,
    )
    return cost_rdw, cost_cdh, (h, w, n_disp)
