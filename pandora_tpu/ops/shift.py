"""Sub-pixel shifts of the right image.

Reference behavior (shift_right_img, img_tools.py:713-752): for
``subpix in {2, 4}`` build ``subpix - 1`` extra right images sampled at
column positions ``col + k/subpix`` with an order-``spline_order`` zoom;
each shifted image is one column shorter than the original.

* ``order=1``: the reference's ``scipy.ndimage.zoom(..., order=1)`` on the
  endpoint-aligned grid is exactly linear interpolation between adjacent
  columns — a fused multiply-add, no resampler needed.
* ``order>=2``: the B-spline zoom (IIR prefilter + basis evaluation) is a
  LINEAR operator on each row, so it is extracted EXACTLY from scipy at
  trace time as a ``(W, W-1)`` matrix (zoom applied to the identity) and
  applied as one MXU matmul — bit-faithful to the reference's resampler
  (the sequential IIR recursion never runs on device), golden-tested
  against scipy in tests/test_spline_shift.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _spline_shift_matrix(w: int, subpix: int, ind: int, order: int):
    """(W, W-1) operator M with ``shifted = im @ M`` ==
    ``zoom(im, (1, (w*subpix-(subpix-1))/w), order)[:, ind::subpix]``
    (img_tools.py:741): rows of the zoomed identity are the exact basis
    responses of scipy's prefilter + spline evaluation."""
    from scipy import ndimage

    eye = np.eye(w, dtype=np.float64)
    factor = (w * subpix - (subpix - 1)) / float(w)
    zoomed = ndimage.zoom(eye, (1.0, factor), order=order)
    return np.ascontiguousarray(zoomed[:, ind::subpix]).astype(np.float32)


def shift_subpix(im: jnp.ndarray, subpix: int, order: int = 1) -> List[jnp.ndarray]:
    """Return ``[im, im shifted by 1/subpix, ...]``; shifted images have
    ``W - 1`` columns.

    ``im`` is (row, col) float32.
    """
    out = [im]
    if subpix == 1:
        return out
    w = im.shape[1]
    for k in range(1, subpix):
        f = k / subpix
        if order == 1:
            shifted = (1.0 - f) * im[:, :-1] + f * im[:, 1:]
        else:
            m = jnp.asarray(_spline_shift_matrix(w, subpix, k, order))
            shifted = im @ m
        out.append(shifted.astype(im.dtype))
    return out
