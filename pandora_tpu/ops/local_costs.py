"""SAD / SSD / ZNCC matching costs as fused windowed reductions.

Reference behavior: sad_ssd.py:140-368 (pixel-wise |diff| / diff² then a
window-sum aggregation) and zncc.py:140-277 (integral-image means/stds,
``(E[LR] − E[L]E[R]) / (σL σR)`` guarded at σ ≤ 0).  Here the per-disparity
planes come from the shared sliding-slice scan; window sums are cumsum box
filters (no NaN poisoning: invalid positions are defined analytically by
:func:`pandora_tpu.ops.cost_volume.window_validity`, identical to the
reference NaN pattern).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .cost_volume import (
    interleave_subpix,
    pad_for_offset_scan,
    scan_offsets,
    window_validity,
)
from .shift import shift_subpix
from .windows import box_mean_same, box_std_same, box_sum_same


def _finalize(per_shift, left_shape, dmin, dmax, subpix, window_size):
    cv = interleave_subpix(per_shift, dmin, dmax, subpix)
    valid = window_validity(left_shape, dmin, dmax, subpix, window_size // 2)
    return jnp.where(valid, cv, jnp.nan)


def sad_ssd_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    dmin: int,
    dmax: int,
    subpix: int = 1,
    window_size: int = 5,
    squared: bool = False,
    spline_order: int = 1,
) -> jnp.ndarray:
    """SAD (or SSD with ``squared``) cost volume (row, col, disp) float32."""
    n_int = dmax - dmin + 1
    w = left.shape[1]
    per_shift = []
    for r_im in shift_subpix(right, subpix, spline_order):
        rp = pad_for_offset_scan(r_im, dmin, dmax, w)

        def plane(r_slice):
            d = left - r_slice
            d = d * d if squared else jnp.abs(d)
            return box_sum_same(d, window_size, window_size)

        per_shift.append(scan_offsets(plane, [rp], n_int, w))
    return _finalize(per_shift, left.shape, dmin, dmax, subpix, window_size)


def zncc_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    dmin: int,
    dmax: int,
    subpix: int = 1,
    window_size: int = 5,
) -> jnp.ndarray:
    """ZNCC cost volume (row, col, disp) float32, type_measure max, cmax 1."""
    n_int = dmax - dmin + 1
    w = left.shape[1]
    mean_l = box_mean_same(left, window_size, window_size)
    std_l = box_std_same(left, window_size, window_size)

    per_shift = []
    for r_im in shift_subpix(right, subpix):
        mean_r = box_mean_same(r_im, window_size, window_size)
        std_r = box_std_same(r_im, window_size, window_size)
        stacked = jnp.stack(
            [r_im, mean_r, std_r], axis=-1
        )  # gather all three with one padded scan input
        rp = pad_for_offset_scan(stacked, dmin, dmax, w)

        def plane(s):
            r_g, mean_g, std_g = s[..., 0], s[..., 1], s[..., 2]
            e_lr = box_mean_same(left * r_g, window_size, window_size)
            num = e_lr - mean_l * mean_g
            den = std_l * std_g
            return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)

        per_shift.append(scan_offsets(plane, [rp], n_int, w))
    return _finalize(per_shift, left.shape, dmin, dmax, subpix, window_size)


def sad_ssd_cmax(left: jnp.ndarray, right: jnp.ndarray, window_size: int, squared: bool) -> float:
    """Maximal possible cost (sad_ssd.py:125-137) — host-side helper."""
    import numpy as np

    min_l, max_l = float(np.min(left)), float(np.max(left))
    min_r, max_r = float(np.min(right)), float(np.max(right))
    span = max(abs(max_l - min_r), abs(max_r - min_l))
    if squared:
        return float(int(span**2 * window_size**2))
    return float(int(span * window_size**2))
