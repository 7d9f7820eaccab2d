"""Gaussian pyramid construction and nodata filling for multiscale runs.

Reference: img_tools.prepare_pyramid (img_tools.py:508-575) builds
skimage ``pyramid_gaussian(sigma=1.2, order=1, mode='reflect')`` pyramids of
the nodata-filled images and of the disparity grids, plus decimated masks.
This module reproduces those exact semantics without skimage:

* smoothing: scipy.ndimage.gaussian_filter(sigma, mode='reflect') — host
  side, once per run, not a hot path;
* resize: linear interpolation at skimage-warp coordinates
  ``(i + 0.5)·scale − 0.5`` with mirror boundary, output shape
  ``ceil(dim / downscale)``;
* nodata filling: the C++ interpolate_nodata_sgm (img_tools.cpp:99-155) —
  8-direction first-valid median — reusing the vectorized directional scans
  from :mod:`pandora_tpu.ops.interpolation`.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter

from .. import constants as cst


def _mirror_index(idx: np.ndarray, n: int) -> np.ndarray:
    """numpy-'reflect' (mirror, no edge repeat) index folding."""
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * (n - 1)
    idx = np.mod(idx, period)
    return np.where(idx >= n, period - idx, idx)


def resize_linear(img: np.ndarray, out_shape: Tuple[int, int]) -> np.ndarray:
    """skimage.transform.resize(order=1, mode='reflect',
    anti_aliasing=False) equivalent for 2-D arrays."""
    h, w = img.shape
    oh, ow = out_shape
    sr, sc = h / oh, w / ow
    r = (np.arange(oh) + 0.5) * sr - 0.5
    c = (np.arange(ow) + 0.5) * sc - 0.5
    r0 = np.floor(r).astype(int)
    c0 = np.floor(c).astype(int)
    fr = (r - r0)[:, None]
    fc = (c - c0)[None, :]
    ri0 = _mirror_index(r0, h)
    ri1 = _mirror_index(r0 + 1, h)
    ci0 = _mirror_index(c0, w)
    ci1 = _mirror_index(c0 + 1, w)
    a = img[np.ix_(ri0, ci0)]
    b = img[np.ix_(ri0, ci1)]
    cc = img[np.ix_(ri1, ci0)]
    d = img[np.ix_(ri1, ci1)]
    return ((1 - fr) * ((1 - fc) * a + fc * b) + fr * ((1 - fc) * cc + fc * d)).astype(
        img.dtype
    )


def gaussian_pyramid(
    data: np.ndarray, num_scales: int, scale_factor: int, sigma: float = 1.2
) -> List[np.ndarray]:
    """Large-to-small pyramid, layer 0 = the original image
    (img_tools.get_pyramids, img_tools.py:479-505)."""
    data = np.asarray(data, np.float32)
    multiband = data.ndim == 3
    layers = [data]
    for _ in range(num_scales - 1):
        prev = layers[-1]
        if multiband:
            smoothed = np.stack(
                [gaussian_filter(b, sigma, mode="reflect") for b in prev]
            )
            out_shape = tuple(-(-d // scale_factor) for d in prev.shape[1:])
            layers.append(np.stack([resize_linear(b, out_shape) for b in smoothed]))
        else:
            smoothed = gaussian_filter(prev, sigma, mode="reflect")
            out_shape = tuple(-(-d // scale_factor) for d in prev.shape)
            layers.append(resize_linear(smoothed, out_shape))
    return layers


def fill_nodata_sgm(img: np.ndarray, msk: Optional[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """interpolate_nodata_sgm (img_tools.cpp:99-155): invalid pixels (any
    invalidity bit set on the internal mask) take the NaN-ignoring median of
    the 8 directional first-valid neighbors; their mask value becomes
    FILLED_NODATA.  Returns host arrays (fill runs once per pyramid prep,
    img_tools.fill_nodata_image, img_tools.py:578-613)."""
    if msk is None:
        return img, np.zeros(img.shape[-2:], np.int32)
    import jax.numpy as jnp

    from .interpolation import _nan_median, first_valid_8

    invalid = (msk.astype(np.int32) & cst.PANDORA_MSK_PIXEL_INVALID) != 0
    validity = jnp.asarray(invalid.astype(np.uint16))  # bit 0 set where invalid

    def fill_band(band):
        neigh = first_valid_8(jnp.asarray(band), validity)
        med = _nan_median(neigh)
        return np.asarray(jnp.where(jnp.asarray(invalid), med, jnp.asarray(band)))

    if img.ndim == 3:
        out = np.stack([fill_band(b) for b in img])
    else:
        out = fill_band(img)
    out_msk = np.where(invalid, cst.PANDORA_MSK_PIXEL_FILLED_NODATA, msk).astype(np.int32)
    return out, out_msk


def masks_pyramid(msk: np.ndarray, scale_factor: int, num_scales: int) -> List[np.ndarray]:
    """Decimated mask pyramid (img_tools.masks_pyramid, :619-639)."""
    out = [msk]
    tmp = msk
    for _ in range(num_scales - 1):
        tmp = tmp[::scale_factor, ::scale_factor]
        out.append(tmp)
    return out


def zoom_nearest(a: np.ndarray, factor: int) -> np.ndarray:
    """scipy.ndimage.zoom(order=0) equivalent for integer upsampling:
    output size = round(in·factor), sample at out/factor rounded."""
    h, w = a.shape
    oh, ow = int(round(h * factor)), int(round(w * factor))
    # scipy zoom order-0 samples input at i * (in-1)/(out-1) rounded
    r = np.round(np.arange(oh) * (h - 1) / max(oh - 1, 1)).astype(int)
    c = np.round(np.arange(ow) * (w - 1) / max(ow - 1, 1)).astype(int)
    return a[np.ix_(r, c)]
