"""Disparity-map filters: NaN-aware windowed median and bilateral.

Reference: filter/median.py:93-179 (nanmedian over filter windows, interior
only, valid-pixel writeback) and filter/bilateral.py:99-255.  The reference
chunks 100×100/50×50 sub-arrays to bound host RAM; here each filter is one
fused gather/sort pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_stack(a: jnp.ndarray, size: int, fill: float) -> jnp.ndarray:
    """(H, W) → (H, W, size*size) of window-shifted copies, ``fill`` outside."""
    r = size // 2
    p = jnp.pad(a, r, constant_values=fill)
    h, w = a.shape
    return jnp.stack(
        [p[dr : dr + h, dc : dc + w] for dr in range(size) for dc in range(size)], axis=-1
    )


def nanmedian_window(a: jnp.ndarray, size: int) -> jnp.ndarray:
    """np.nanmedian over centered size×size windows; positions closer than
    ``size//2`` to the border keep their input value (median.py:148-175).

    The k = size² window copies live on axis 0 — (k, H, W) keeps dense
    (8,128) tiles per plane, so the sort's compare-exchanges and the
    one-hot order-statistic selection are fused elementwise passes; a
    minor-axis (H, W, k) layout would be lane-padded k→128 and gathered."""
    h, w = a.shape
    r = size // 2
    p = jnp.pad(a, r, constant_values=jnp.nan)
    planes = [p[dr : dr + h, dc : dc + w] for dr in range(size) for dc in range(size)]
    k = size * size
    n = sum(jnp.isfinite(x).astype(jnp.int32) for x in planes)
    # NaN -> +inf, then an odd-even transposition network of min/max pairs:
    # XLA's generic variadic sort is ~10x slower than k²/2 fused
    # compare-exchanges for the tiny window sizes used here
    vals = [jnp.where(jnp.isnan(x), jnp.inf, x) for x in planes]
    for rnd in range(k):
        for i in range(rnd % 2, k - 1, 2):
            lo_v = jnp.minimum(vals[i], vals[i + 1])
            hi_v = jnp.maximum(vals[i], vals[i + 1])
            vals[i], vals[i + 1] = lo_v, hi_v
    s = vals  # list of (H, W), ascending; former NaNs at the end as +inf
    lo = jnp.clip((n - 1) // 2, 0, k - 1)
    hi = jnp.clip(n // 2, 0, k - 1)
    med = jnp.zeros_like(a)
    for i in range(k):
        sel = jnp.where(lo == i, 0.5, 0.0) + jnp.where(hi == i, 0.5, 0.0)
        med = med + jnp.where(sel > 0, sel * s[i], 0.0)
    med = jnp.where(n == 0, jnp.nan, med)
    r = size // 2
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= r) & (row < h - r) & (col >= r) & (col < w - r)
    return jnp.where(interior, med, a)


def median_filter_disparity(
    disp: jnp.ndarray, validity_mask: jnp.ndarray, invalid_bits: int, size: int
) -> jnp.ndarray:
    """filter/median.py filter_disparity: invalid pixels become NaN for the
    median and are never overwritten; NaN neighbors are ignored."""
    invalid = (validity_mask & invalid_bits) != 0
    masked = jnp.where(invalid, jnp.nan, disp)
    valid = jnp.isfinite(masked)
    med = nanmedian_window(masked, size)
    return jnp.where(valid, med, disp)


def bilateral_filter_disparity(
    disp: jnp.ndarray,
    validity_mask: jnp.ndarray,
    invalid_bits: int,
    sigma_color: float,
    sigma_space: float,
) -> jnp.ndarray:
    """Bilateral filter of the disparity map (filter/bilateral.py:99-255):
    weights = gaussian(window offset distance; sigma_space) ×
    gaussian(disparity difference to the window center; sigma_color),
    NaN-aware nansum normalization, window width = min(H, W,
    int(3·sigma_space+1)) with the reference's floor-division center for
    even widths; only interior valid pixels are overwritten."""
    h, w = disp.shape
    size = min(h, w, int(3.0 * sigma_space + 1.0))
    off = size // 2
    invalid = (validity_mask & invalid_bits) != 0
    masked = jnp.where(invalid, jnp.nan, disp)

    # window-shifted copies with the center at index (off, off)
    p = jnp.pad(masked, ((off, size - 1 - off), (off, size - 1 - off)), constant_values=jnp.nan)
    dstack = jnp.stack(
        [p[dr : dr + h, dc : dc + w] for dr in range(size) for dc in range(size)], axis=-1
    )
    offs = jnp.asarray([(dr - off, dc - off) for dr in range(size) for dc in range(size)], jnp.float32)
    dist = jnp.sqrt(offs[:, 0] ** 2 + offs[:, 1] ** 2)
    w_space = jnp.exp(-((dist / sigma_space) ** 2) * 0.5)  # (k,)
    diff = dstack - masked[..., None]
    w_color = jnp.exp(-((diff / sigma_color) ** 2) * 0.5)
    weights = w_space[None, None, :] * w_color
    good = ~jnp.isnan(dstack)
    num = jnp.sum(jnp.where(good, dstack * weights, 0.0), axis=-1)
    den = jnp.sum(jnp.where(good, weights, 0.0), axis=-1)
    out = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), jnp.nan)

    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= off) & (row < h - size + off + 1) & (col >= off) & (col < w - size + off + 1)
    valid = jnp.isfinite(masked)
    return jnp.where(valid & interior, out, disp)
