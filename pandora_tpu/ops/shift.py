"""Sub-pixel shifts of the right image.

Reference behavior (shift_right_img, img_tools.py:713-752): for
``subpix in {2, 4}`` build ``subpix - 1`` extra right images sampled at
column positions ``col + k/subpix`` with an order-1 (linear) zoom; each
shifted image is one column shorter than the original.

The reference's ``scipy.ndimage.zoom(..., order=1)`` on the endpoint-aligned
grid is exactly linear interpolation between adjacent columns, which is what
we compute here — a fused multiply-add, no resampler needed.  Higher spline
orders (the ``spline_order`` config of sad/ssd) use a cubic Catmull-Rom
approximation of the B-spline zoom.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def shift_subpix(im: jnp.ndarray, subpix: int, order: int = 1) -> List[jnp.ndarray]:
    """Return ``[im, im shifted by 1/subpix, ...]``; shifted images have
    ``W - 1`` columns.

    ``im`` is (row, col) float32.
    """
    out = [im]
    if subpix == 1:
        return out
    for k in range(1, subpix):
        f = k / subpix
        if order == 1:
            shifted = (1.0 - f) * im[:, :-1] + f * im[:, 1:]
        else:
            # cubic (Catmull-Rom) on columns j-1, j, j+1, j+2 evaluated at j+f
            p0 = jnp.pad(im, ((0, 0), (1, 0)), mode="edge")[:, :-2]
            p1 = im[:, :-1]
            p2 = im[:, 1:]
            p3 = jnp.pad(im, ((0, 0), (0, 1)), mode="edge")[:, 2:]
            shifted = (
                p1
                + 0.5 * f * (p2 - p0)
                + f * f * (p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3)
                + f * f * f * (1.5 * (p1 - p2) + 0.5 * (p3 - p0))
            )
        out.append(shifted.astype(im.dtype))
    return out
