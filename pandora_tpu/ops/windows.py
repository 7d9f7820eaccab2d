"""Windowed-moment primitives: box sums, means and stds via integral images.

TPU-native equivalents of the reference's O(1)-per-pixel raster moments
(compute_mean_raster / compute_std_raster, img_tools.py:834-952) — 2-D
cumulative sums are single XLA ops that fuse well and vectorize on the VPU;
no strided host views needed.

Conventions follow the reference: for a ``win`` window the output of the
``*_valid`` variants is cropped by ``win - 1`` on each spatial axis (only
fully-interior windows), while the ``same``-shaped variants return the
window centered on each pixel with the border left at whatever the
integral-image edge handling gives (callers mask borders anyway).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_sum_same(a: jnp.ndarray, win_r: int, win_c: int) -> jnp.ndarray:
    """Centered win_r x win_c window sum with zero padding outside, same shape.

    Works on (..., row, col) arrays; windows are centered (odd sizes).
    Implemented as two separable 1-D ``reduce_window`` passes: direct
    summation keeps float32 accuracy on large rasters (a cumsum integral
    image catastrophically cancels at ~1e8 magnitudes), while XLA still
    vectorizes the short sliding sums on the VPU.
    """
    import jax

    hr, hc = win_r // 2, win_c // 2
    out = a
    if win_r > 1:
        out = jax.lax.reduce_window(
            out,
            jnp.zeros((), a.dtype),
            jax.lax.add,
            (1,) * (a.ndim - 2) + (win_r, 1),
            (1,) * a.ndim,
            [(0, 0)] * (a.ndim - 2) + [(hr, hr), (0, 0)],
        )
    if win_c > 1:
        out = jax.lax.reduce_window(
            out,
            jnp.zeros((), a.dtype),
            jax.lax.add,
            (1,) * (a.ndim - 2) + (1, win_c),
            (1,) * a.ndim,
            [(0, 0)] * (a.ndim - 2) + [(0, 0), (hc, hc)],
        )
    return out


def box_mean_same(a: jnp.ndarray, win_r: int, win_c: int) -> jnp.ndarray:
    return box_sum_same(a, win_r, win_c) / (win_r * win_c)


def box_std_same(a: jnp.ndarray, win_r: int, win_c: int) -> jnp.ndarray:
    """Population std over the centered window (reference compute_std_raster
    semantics: E[x^2] - E[x]^2, img_tools.py:915-952)."""
    m = box_mean_same(a, win_r, win_c)
    m2 = box_mean_same(a * a, win_r, win_c)
    var = jnp.maximum(m2 - m * m, 0.0)
    return jnp.sqrt(var)


def valid_crop(a: jnp.ndarray, win: int) -> jnp.ndarray:
    """Crop a same-shaped windowed raster to the reference's truncated output
    (rows/cols reduced by win - 1): keep only fully-interior centers."""
    h = (win - 1) // 2
    if h == 0:
        return a
    return a[..., h:-h, h:-h]
