"""Core pytree data model.

The reference passes mutable ``xarray.Dataset`` objects between steps
(images: img_tools.py:345-437; cost volume: matching_cost/matching_cost.py:377-407;
disparity: disparity/disparity.py:450-480).  The TPU engine replaces them with
immutable JAX pytrees: array leaves live on device and flow through ``jit``;
static metadata (window size, measure type, geo-referencing, ...) is carried
in hashable ``meta_fields`` so it can parameterize compilation.

Conventions
-----------
* images are ``(band, row, col)`` float32; mono images have ``band == 1``.
* disparity ranges are per-pixel ``(row, col)`` float32 grids even when the
  user supplied an ``[min, max]`` int pair (grids are the general case; the
  scalar case is a broadcast, which XLA folds away).
* the cost volume is dense ``(row, col, disp)`` float32, NaN for invalid —
  exactly the reference layout, which is also the layout XLA tiles best
  (disp on the 128-lane axis).
* validity masks are uint16 bitmasks (bits in :mod:`pandora_tpu.constants`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls):
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)
    return cls


def static_field(default=None):
    return field(default=default, metadata={"static": True})


@_register
@dataclass
class Image:
    """One side of a rectified stereo pair (reference image dataset,
    img_tools.py:345-437)."""

    im: jnp.ndarray  # (band, row, col) float32
    disp_min: Optional[jnp.ndarray] = None  # (row, col) float32
    disp_max: Optional[jnp.ndarray] = None  # (row, col) float32
    msk: Optional[jnp.ndarray] = None  # (row, col) int16, input mask
    classif: Optional[jnp.ndarray] = None  # (band_classif, row, col)
    segm: Optional[jnp.ndarray] = None  # (row, col)
    edges: Optional[jnp.ndarray] = None  # (row, col)

    # -- static metadata ---------------------------------------------------
    no_data_img: float = static_field(-9999.0)
    valid_pixels: int = static_field(0)
    no_data_mask: int = static_field(1)
    band_names: Tuple[str, ...] = static_field(())
    classif_names: Tuple[str, ...] = static_field(())
    # geo-referencing: affine transform (a,b,c,d,e,f) and CRS wkt/epsg string
    transform: Optional[Tuple[float, ...]] = static_field(None)
    crs: Optional[str] = static_field(None)
    disparity_source: Optional[str] = static_field(None)
    # global disparity extrema for tiled runs (img_tools.py:319-342)
    global_disparity: Optional[Tuple[int, int]] = static_field(None)

    @property
    def n_bands(self) -> int:
        return self.im.shape[0]

    @property
    def shape(self) -> Tuple[int, int]:
        return self.im.shape[-2:]

    def std_msk(self) -> Optional[jnp.ndarray]:
        """Input mask translated to the STANDARD convention (0 valid /
        1 nodata / 2 invalid).

        File-loaded images are normalized at ingestion, but the reference
        honors per-image ``valid_pixels`` / ``no_data_mask`` attrs on API-
        constructed datasets (e.g. its test fixtures use 5/7) — every mask
        consumer must read through this translation, not ``msk`` raw."""
        if self.msk is None:
            return None
        if self.valid_pixels == 0 and self.no_data_mask == 1:
            return self.msk
        nodata = self.msk == self.no_data_mask
        valid = self.msk == self.valid_pixels
        return jnp.where(
            nodata, jnp.int16(1), jnp.where(valid, jnp.int16(0), jnp.int16(2))
        ).astype(jnp.int16)

    def band(self, name: Optional[str]) -> jnp.ndarray:
        """Select the (row, col) plane used for correlation."""
        if self.im.shape[0] == 1:
            return self.im[0]
        if name is None:
            raise ValueError("multiband image requires an explicit 'band' in the config")
        try:
            idx = self.band_names.index(name)
        except ValueError as exc:
            raise ValueError(f"band {name!r} not in {self.band_names}") from exc
        return self.im[idx]


@_register
@dataclass
class CostVolume:
    """Dense (row, col, disp) matching-cost tensor plus per-pixel criteria.

    Mirrors the reference cost-volume dataset attrs
    (matching_cost/matching_cost.py:377-407, census.py:116-122)."""

    cv: jnp.ndarray  # (row, col, disp) float32, NaN = not computed / invalid
    disp_range: jnp.ndarray  # (disp,) float32 — subpix-expanded disparities
    validity_mask: jnp.ndarray  # (row, col) uint16
    confidence: Optional[jnp.ndarray] = None  # (row, col, indicator)
    disp_indices: Optional[jnp.ndarray] = None  # (row, col) f32, WTA indices

    window_size: int = static_field(5)
    subpixel: int = static_field(1)
    offset_row_col: int = static_field(2)
    measure: str = static_field("census")
    type_measure: str = static_field("min")  # "min" | "max"
    cmax: float = static_field(0.0)
    band_correl: Optional[str] = static_field(None)
    indicator_names: Tuple[str, ...] = static_field(())

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self.cv.shape


@_register
@dataclass
class DisparityMap:
    """Output disparity dataset (reference disparity/disparity.py:450-480)."""

    disparity_map: jnp.ndarray  # (row, col) float32
    validity_mask: jnp.ndarray  # (row, col) uint16
    confidence: Optional[jnp.ndarray] = None  # (row, col, indicator)
    interpolated_coeff: Optional[jnp.ndarray] = None  # (row, col) f32
    disparity_interval: Optional[jnp.ndarray] = None  # (2, row, col) f32

    invalid_disparity: Optional[float] = static_field(None)  # None == NaN
    indicator_names: Tuple[str, ...] = static_field(())
    transform: Optional[Tuple[float, ...]] = static_field(None)
    crs: Optional[str] = static_field(None)


def make_image(
    im: Any,
    disp: Any = None,
    msk: Any = None,
    classif: Any = None,
    segm: Any = None,
    edges: Any = None,
    **meta,
) -> Image:
    """Build an :class:`Image` from host arrays.

    ``disp`` may be ``None``, an ``(dmin, dmax)`` pair, or a pair of
    per-pixel grids / a ``(2, row, col)`` array (reference add_disparity /
    add_disparity_grid, img_tools.py:101-162)."""
    im = jnp.asarray(im, jnp.float32)
    if im.ndim == 2:
        im = im[None]
    rows, cols = im.shape[-2:]
    disp_min = disp_max = None
    if disp is not None:
        if isinstance(disp, (tuple, list)) and np.ndim(disp[0]) == 0:
            disp_min = jnp.full((rows, cols), float(disp[0]), jnp.float32)
            disp_max = jnp.full((rows, cols), float(disp[1]), jnp.float32)
            meta.setdefault("disparity_source", str(list(map(float, disp))))
        else:
            arr = jnp.asarray(disp, jnp.float32)
            if arr.ndim != 3 or arr.shape[0] != 2:
                raise ValueError(f"disparity grid must be (2, row, col), got {arr.shape}")
            disp_min, disp_max = arr[0], arr[1]
            meta.setdefault("disparity_source", "grid")
    return Image(
        im=im,
        disp_min=disp_min,
        disp_max=disp_max,
        msk=None if msk is None else jnp.asarray(msk, jnp.int16),
        classif=None if classif is None else jnp.asarray(classif),
        segm=None if segm is None else jnp.asarray(segm),
        edges=None if edges is None else jnp.asarray(edges),
        **meta,
    )


def add_global_disparity(img: Image, global_min: float, global_max: float) -> Image:
    """Attach the scene-global disparity extrema used for tile-consistent
    ambiguity normalization (reference img_tools.add_global_disparity,
    the CARS tiling hook): the global range must ENCLOSE the image's own
    grid range, else the ambiguity normalization would clip."""
    import numpy as np

    if img.disp_min is not None:
        grid_min = float(np.min(np.asarray(img.disp_min)))
        grid_max = float(np.max(np.asarray(img.disp_max)))
        if global_min > grid_min or global_max < grid_max:
            raise ValueError(
                "For ambiguity step, the global disparity must be outside "
                "the range of the grid disparity"
            )
    img.global_disparity = (global_min, global_max)
    return img


def disparity_extrema(img: Image) -> Tuple[int, int]:
    """Static (floor(min), ceil(max)) over the disparity grids.

    The cost-volume disp axis must be static for jit; grids only *restrict*
    the per-pixel range inside it (reference allocates the full range and
    masks, matching_cost.py:852-860)."""
    if img.disp_min is None:
        raise ValueError("image has no disparity range")
    # memoized per grid identity: the device_get round trip costs ~ms on
    # a remote-tunneled TPU and serving re-runs the same image many times.
    # The cache HOLDS the keyed arrays (not bare ids) so a freed grid's
    # recycled address can never alias a stale entry.
    cache = getattr(img, "_extrema_cache", None)
    if (
        cache is not None
        and cache[0] is img.disp_min
        and cache[1] is img.disp_max
    ):
        return cache[2]
    dmin = int(np.floor(np.asarray(jax.device_get(img.disp_min)).min()))
    dmax = int(np.ceil(np.asarray(jax.device_get(img.disp_max)).max()))
    img._extrema_cache = (img.disp_min, img.disp_max, (dmin, dmax))
    return dmin, dmax
