"""Cross-based cost aggregation (Zhang-Lu-Lafruit 2009).

TPU-native re-design of the reference's C++ CBCA
(aggregation/cpp/src/aggregation.cpp:28-356 and driver
aggregation/cbca.py:90-295).  The per-pixel arm walks and the per-
disparity 4-step integral-image loops become fully vectorized XLA:

* cross arms: the "consecutive similar neighbors" run-length is a short
  static loop (``len_arms`` ≤ ~10) of shifted compares folded with a
  running AND — no data-dependent walk;
* horizontal/vertical window sums: exclusive prefix sums (``cumsum``)
  indexed by the arm lengths.  Arms are bounded by ``len_arms - 1``, so
  the gathers become one-hot sums over ``len_arms`` statically shifted
  views — pure VPU selects, no gather;
* the disparity loop is a ``vmap``: each lane's right-cross is the
  subpix-selected cross rolled by ``floor(d)`` columns.

Semantics matched to the reference: NaN costs contribute 0 to the sums
and stay NaN in the output; columns whose right position ``c + d`` falls
outside the right image keep zero aggregated cost; the support count
``sum4`` gets +1 for the anchor pixel before normalizing.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp


def cross_support(img: jnp.ndarray, len_arms: int, intensity: float) -> jnp.ndarray:
    """Per-pixel 4-arm cross support lengths (aggregation.cpp:224-321).

    :param img: (row, col) float32 with ``+inf`` at invalid/no-data pixels
        (the reference converts NaN→inf before calling its C++).
    :param len_arms: ``cbca_distance``; arms span 1..len_arms-1 pixels.
    :param intensity: ``cbca_intensity`` similarity threshold.
    :return: (row, col, 4) int32 arm lengths in (left, right, up, down)
        order; 0 everywhere for invalid pixels; a minimum 3×3 support is
        enforced wherever the immediate neighbor is valid.
    """
    h, w = img.shape
    valid = jnp.isfinite(img)

    def shifted(dr: int, dc: int) -> jnp.ndarray:
        """Neighbor value at (r+dr, c+dc), +inf outside the image."""
        out = img
        if dr:
            pad = jnp.full((abs(dr), w), jnp.inf, img.dtype)
            out = (
                jnp.concatenate([out[dr:], pad], axis=0)
                if dr > 0
                else jnp.concatenate([pad, out[:dr]], axis=0)
            )
        if dc:
            pad = jnp.full((h, abs(dc)), jnp.inf, img.dtype)
            out = (
                jnp.concatenate([out[:, dc:], pad], axis=1)
                if dc > 0
                else jnp.concatenate([pad, out[:, :dc]], axis=1)
            )
        return out

    arms = []
    for dr, dc in ((0, -1), (0, 1), (-1, 0), (1, 0)):
        ok = jnp.ones((h, w), bool)
        run = jnp.zeros((h, w), jnp.int32)
        for k in range(1, len_arms):
            nb = shifted(dr * k, dc * k)
            # |finite − inf| = inf and |inf − inf| = NaN: both fail `< τ`,
            # reproducing the C++ break on invalid/out-of-bounds neighbors
            ok = ok & (jnp.abs(img - nb) < intensity)
            run = run + ok.astype(jnp.int32)
        # minimum 3×3 support when the immediate neighbor is valid
        # (aggregation.cpp:265-313)
        run = jnp.maximum(run, jnp.isfinite(shifted(dr, dc)).astype(jnp.int32))
        arms.append(jnp.where(valid, run, 0))
    return jnp.stack(arms, axis=-1)


def _span_sum(prefix_pad: jnp.ndarray, lo_arm, hi_arm, len_arms: int, axis: int):
    """Windowed sum from an exclusive prefix sum, arm-indexed.

    ``prefix_pad``: exclusive prefix along ``axis`` (one leading zero, so
    ``prefix_pad[i]`` = sum of elements 0..i-1, length N+1).  Returns
    sum over [i - lo_arm, i + hi_arm] for every position, via one-hot
    selection over the ``len_arms`` possible arm values.
    """
    n = prefix_pad.shape[axis] - 1
    pad_widths = [(0, 0)] * prefix_pad.ndim
    pad_widths[axis] = (len_arms, len_arms)
    p = jnp.pad(prefix_pad, pad_widths, mode="edge")  # left pad is 0 (edge of zeros)

    def view(start: int) -> jnp.ndarray:
        return jax.lax.slice_in_dim(p, start, start + n, axis=axis)

    hi = jnp.zeros_like(view(0))
    lo = jnp.zeros_like(hi)
    for a in range(len_arms):
        hi = hi + jnp.where(hi_arm == a, view(len_arms + a + 1), 0.0)
        lo = lo + jnp.where(lo_arm == a, view(len_arms - a), 0.0)
    return hi - lo


@partial(jax.jit, static_argnames=("subpix", "len_arms"))
def cbca_volume(
    cv: jnp.ndarray,
    cross_left: jnp.ndarray,
    cross_right_stack: jnp.ndarray,
    widths: jnp.ndarray,
    disp_vals: jnp.ndarray,
    subpix: int,
    len_arms: int,
) -> jnp.ndarray:
    """Aggregate a (row, col, disp) cost volume with CBCA.

    :param cross_left: (row, col, 4) left cross supports.
    :param cross_right_stack: (subpix, row, col, 4) right crosses per
        subpix shift, zero-padded to ``col`` columns.
    :param widths: (subpix,) int32 valid column count of each shifted
        right cross (W, then W-1 for the shifted ones).
    :param disp_vals: (disp,) float32 disparity of each CV lane.
    """
    h, w, _ = cv.shape
    d_floor = jnp.floor(disp_vals).astype(jnp.int32)
    i_sub = jnp.round((disp_vals % 1.0) * subpix).astype(jnp.int32) % subpix
    cols = jnp.arange(w, dtype=jnp.float32)

    def per_disp(cost, dfl, dflt, isub):
        cross_r = jax.lax.dynamic_index_in_dim(
            cross_right_stack, isub, axis=0, keepdims=False
        )  # (H, W, 4)
        width_r = jax.lax.dynamic_index_in_dim(widths, isub, keepdims=False)
        cross_r = jnp.roll(cross_r, -dfl, axis=1)
        pos = cols + dflt
        col_valid = (pos >= 0) & (pos < width_r.astype(jnp.float32))  # (W,)

        left = jnp.minimum(cross_left[..., 0], cross_r[..., 0])
        right = jnp.minimum(cross_left[..., 1], cross_r[..., 1])
        top = jnp.minimum(cross_left[..., 2], cross_r[..., 2])
        bot = jnp.minimum(cross_left[..., 3], cross_r[..., 3])

        invalid_cost = jnp.isnan(cost)
        cost0 = jnp.where(invalid_cost, 0.0, cost)

        # step 1+2: horizontal windowed sum over [c-left, c+right]
        s_h = jnp.pad(jnp.cumsum(cost0, axis=1), ((0, 0), (1, 0)))
        step2 = _span_sum(s_h, left, right, len_arms, axis=1) * col_valid
        sum2 = (left + right).astype(jnp.float32) * col_valid

        # step 3+4: vertical windowed sum of step2 over [r-top, r+bot]
        s_v = jnp.pad(jnp.cumsum(step2, axis=0), ((1, 0), (0, 0)))
        step4 = _span_sum(s_v, top, bot, len_arms, axis=0)
        s2_v = jnp.pad(jnp.cumsum(sum2, axis=0), ((1, 0), (0, 0)))
        span2 = _span_sum(s2_v, top, bot, len_arms, axis=0)
        sum4 = jnp.where(col_valid, span2 + (top + bot).astype(jnp.float32), sum2)
        step4 = step4 * col_valid

        out = step4 / (sum4 + 1.0)
        return jnp.where(invalid_cost, jnp.nan, out)

    return jax.vmap(per_disp, in_axes=(2, 0, 0, 0), out_axes=2)(
        cv, d_floor, disp_vals, i_sub
    )


def stack_right_crosses(
    crosses: List[jnp.ndarray], w: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad per-shift right crosses (widths W or W-1) to a (S, H, W, 4)
    stack plus their true widths."""
    padded, widths = [], []
    for c in crosses:
        widths.append(c.shape[1])
        if c.shape[1] < w:
            c = jnp.pad(c, ((0, 0), (0, w - c.shape[1]), (0, 0)))
        padded.append(c)
    return jnp.stack(padded), jnp.asarray(widths, jnp.int32)
