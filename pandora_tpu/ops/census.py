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


def _hamming_plane(lsig: jnp.ndarray, rsig: jnp.ndarray) -> jnp.ndarray:
    """Sum of popcounts of XOR'd signature words → (row, col) float32."""
    x = jax.lax.population_count(lsig ^ rsig)
    return jnp.sum(x, axis=-1).astype(jnp.float32)


def _scan_integer_disps(lsig, rsig_padded, n_int, width, chunk: int = 16):
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
        planes = [_hamming_plane(lsig, rs[:, j : j + width]) for j in range(chunk)]
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

    lsig = census_transform(left, window_size, window_size)
    rights = shift_subpix(right, subpix)

    per_shift = []
    for i, r_im in enumerate(rights):
        rsig = census_transform(r_im, window_size, window_size)
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
