"""Plane-aware bilateral disparity denoiser.

Reference: filter/disparity_denoiser.py:100-313.  Weights combine a
gaussian of the window euclidean distance, of the color difference to the
window center, and of the *centered planar distance* (disparity deviation
from the local tangent plane re-centered by its window mean); the filter
adds the weighted mean of the non-centered planar distance to each valid
pixel.  Everything is a stack of statically-shifted views — one fused XLA
program, no sliding-window materialization on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian(value, sig: float):
    return jnp.exp(-jnp.square(value / sig) / 2.0)


def _gaussian_kernel1d(sigma: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter order-0 kernel (truncate=4.0)."""
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(a: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur with scipy's 'reflect' (symmetric) border."""
    k = jnp.asarray(_gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2
    for axis in (0, 1):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r, r)
        p = jnp.pad(a, pad, mode="symmetric")
        p = jnp.moveaxis(p, axis, 0)
        out = sum(k[i] * p[i : i + a.shape[axis]] for i in range(k.shape[0]))
        a = jnp.moveaxis(out, 0, axis)
    return a


def _gradient(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """np.gradient: central differences, one-sided at the edges."""
    a = jnp.moveaxis(a, axis, 0)
    mid = (a[2:] - a[:-2]) * 0.5
    out = jnp.concatenate([(a[1] - a[0])[None], mid, (a[-1] - a[-2])[None]], axis=0)
    return jnp.moveaxis(out, 0, axis)


def _windows(a: jnp.ndarray, size: int) -> jnp.ndarray:
    """(H, W) → (ws*ws, H, W) of 'reflect' (mirror) padded window views."""
    r = size // 2
    p = jnp.pad(a, r, mode="reflect")
    h, w = a.shape
    return jnp.stack([p[dr : dr + h, dc : dc + w] for dr in range(size) for dc in range(size)])


@partial(
    jax.jit,
    static_argnames=("size", "sigma_euclidian", "sigma_color", "sigma_planar", "sigma_grad"),
)
def denoise_disparity(
    disp: jnp.ndarray,
    color: jnp.ndarray,
    validity_mask: jnp.ndarray,
    invalid_bits: int,
    size: int,
    sigma_euclidian: float,
    sigma_color: float,
    sigma_planar: float,
    sigma_grad: float,
) -> jnp.ndarray:
    """Filtered disparity map; only valid (per mask bits, finite) pixels are
    overwritten (disparity_denoiser.py filter_disparity)."""
    c = size // 2
    coords = np.stack(
        np.meshgrid(np.arange(-c, c + 1), np.arange(-c, c + 1), indexing="ij")
    )  # (2, ws, ws)

    grad = jnp.stack([_gradient(gaussian_blur(disp, sigma_grad), 0),
                      _gradient(gaussian_blur(disp, sigma_grad), 1)])

    disp_win = _windows(disp, size)  # (K, H, W)
    clr_win = _windows(color, size)

    euclid = jnp.asarray(
        np.linalg.norm(coords, axis=0).reshape(-1).astype(np.float32)
    )[:, None, None]
    clr_dist = clr_win - color[None]

    # planar distance: window disparity minus the tangent plane through the
    # center (slope = blurred-gradient at the center)
    plane = (
        coords[0].reshape(-1, 1, 1) * grad[0][None]
        + coords[1].reshape(-1, 1, 1) * grad[1][None]
    )
    planar = disp_win - plane - disp[None]
    planar_centered = (disp_win - plane) - jnp.mean(disp_win - plane, axis=0, keepdims=True)

    weights = (
        gaussian(euclid, sigma_euclidian)
        * gaussian(clr_dist, sigma_color)
        * gaussian(planar_centered, sigma_planar)
    )
    weights = weights / jnp.sum(weights, axis=0, keepdims=True)
    correction = jnp.sum(planar * weights, axis=0)

    invalid = (validity_mask & invalid_bits) != 0
    valid = (~invalid) & jnp.isfinite(disp)
    return jnp.where(valid, disp + correction, disp)
