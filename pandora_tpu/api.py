"""Top-level API: load config → build pipeline → load images → run → save.

Mirrors the reference entry points (pandora/__init__.py:51-202): ``run``
executes a validated pipeline on in-memory images; ``main`` is the
config-file driver used by the CLI.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from . import common
from .config import check_conf, read_config_file
from .datamodel import DisparityMap, Image, make_image
from .io.raster import read_image_input, read_raster
from .pipeline import Pipeline
from .profiler import Profiler
from .steps.base import PipelineState


def setup_logging(verbose: bool) -> None:
    logging.basicConfig(
        format="[%(asctime)s][%(levelname)s] %(message)s",
        level=logging.INFO if verbose else logging.ERROR,
        datefmt="%Y-%m-%dT%H:%M:%S",
    )


def get_metadata(
    img: str,
    disparity=None,
    classif: Optional[str] = None,
    segm: Optional[str] = None,
    edges: Optional[str] = None,
) -> Dict[str, Any]:
    """Header-only image metadata — no pixel decode (reference
    img_tools.get_metadata, img_tools.py:440-476): shape, band names and
    the disparity source, for config checking and tiling planners."""
    from .io.raster import read_raster_header

    for name, path in (("img", img), ("classif", classif), ("segm", segm), ("edges", edges)):
        if path is not None and not isinstance(path, str):
            # reference get_metadata raises on non-path params
            # (tests/test_pandora_image.py:1079-1110)
            raise TypeError(f"invalid path or file: {path!r}")
    header = read_raster_header(img)
    bands = header["band_names"]
    if bands is None and header["count"] > 1:
        bands = tuple(f"band_{i}" for i in range(header["count"]))
    meta: Dict[str, Any] = {
        "width": header["width"],
        "height": header["height"],
        "band_im": bands,
        "transform": header["transform"],
        "crs": header["crs"],
        "disparity_source": disparity,
    }
    if isinstance(disparity, str):
        gh = read_raster_header(disparity)
        meta["disparity_grid_shape"] = (gh["count"], gh["height"], gh["width"])
    for key, path in (("classif", classif), ("segm", segm), ("edges", edges)):
        if path is not None:
            h = read_raster_header(path)
            meta[f"band_{key}"] = h["band_names"] or tuple(
                f"band_{i}" for i in range(h["count"])
            )
    return meta


def create_image_from_inputs(img_cfg: Dict[str, Any], disp, roi: Optional[Dict[str, Any]] = None) -> Image:
    """create_dataset_from_inputs equivalent (img_tools.py:345-437); an
    optional ``roi`` ({"col": {first,last}, "row": {first,last}, "margins"})
    windows every raster read (img_tools.get_window, :61-98)."""
    window = None
    if roi is not None:
        from .io.raster import get_window, read_raster_header

        header = read_raster_header(img_cfg["img"])
        window = get_window(roi, header["width"], header["height"])
    data, msk, transform, crs, band_names = read_image_input(
        img_cfg["img"], img_cfg.get("nodata", -9999), img_cfg.get("mask"), window=window
    )
    extras = {}
    for key in ("classif", "segm", "edges"):
        if img_cfg.get(key):
            arr, _, _, _, names = read_raster(img_cfg[key], window=window)
            if arr.shape[-2:] != data.shape[-2:]:
                # the reference rejects mismatched auxiliary layers at
                # creation (create_dataset_from_inputs)
                raise ValueError(
                    f"{key} shape {arr.shape[-2:]} does not match image "
                    f"shape {data.shape[-2:]}"
                )
            extras[key] = arr[0] if key != "classif" else arr
            if key == "classif" and names:
                # class names ride the GeoTIFF band descriptions
                # (img_tools.py:427-437 band_classif coordinate); 3SGM /
                # ARNN class selection matches against them
                extras["classif_names"] = tuple(names)
    if isinstance(disp, str):
        grid, *_ = read_raster(disp, window=window)
        disp = grid  # (2, row, col)
    if band_names is None:
        band_names = (
            tuple(f"band_{i}" for i in range(data.shape[0])) if data.shape[0] > 1 else ()
        )
    return make_image(
        data,
        disp=disp,
        msk=msk,
        transform=transform,
        crs=crs,
        band_names=band_names,
        **extras,
    )


def check_datasets(left: Image, right: Image) -> None:
    """Dataset coherence (check_configuration.check_datasets, :145-167):
    the left image must carry a disparity range, and both images must
    share the same (row, col) shape; auxiliary layers must match too."""
    if left.disp_min is None:
        raise AttributeError("left dataset must have disparity DataArray")
    if left.im.shape[-2:] != right.im.shape[-2:]:
        raise AttributeError("left and right datasets must have the same shape")
    for img in (left, right):
        shape = img.im.shape[-2:]
        for layer in ("msk", "classif", "segm", "edges"):
            arr = getattr(img, layer, None)
            if arr is not None and tuple(arr.shape[-2:]) != tuple(shape):
                raise AttributeError(f"{layer} shape {arr.shape} != image shape {shape}")


def images_from_config(
    cfg_input: Dict[str, Any], roi: Optional[Dict[str, Any]] = None
) -> Tuple[Image, Image]:
    left = create_image_from_inputs(cfg_input["left"], cfg_input["left"]["disp"], roi=roi)
    right_disp = cfg_input["right"]["disp"]
    right = create_image_from_inputs(cfg_input["right"], right_disp, roi=roi)
    if right.disp_min is None and left.disp_min is not None:
        # default right range = -reversed left (pandora/__init__.py:184-185)
        right.disp_min = -left.disp_max
        right.disp_max = -left.disp_min
        right.disparity_source = left.disparity_source
    return left, right


def run(
    pipeline: Pipeline,
    left_img: Image,
    right_img: Image,
) -> Tuple[DisparityMap, Optional[DisparityMap], PipelineState]:
    """Execute a validated pipeline (reference run, __init__.py:51-124):
    one pass per pyramid scale (coarse → fine) when multiscale is
    configured, a single pass otherwise."""
    state = PipelineState(left_img=left_img, right_img=right_img)
    num_scales, scale_factor = pipeline.multiscale_params
    if num_scales > 1:
        from .steps.multiscale import prepare_pyramid_state

        prepare_pyramid_state(state, num_scales, scale_factor)
    for _ in range(num_scales):
        pipeline.run(state)
    return state.left_disparity, state.right_disparity, state


def crop_disparity_to_roi(disp: DisparityMap, roi: Dict[str, Any], img_path: str) -> DisparityMap:
    """Crop a disparity map computed on the margin-extended, clamp-adjusted
    ROI window back to the ROI proper, shifting the geo-transform so the
    output GeoTIFF addresses the ROI's true pixel origin (the consumer no
    longer needs to re-derive get_window's clamped offsets)."""
    import dataclasses

    from .io.raster import get_window, read_raster_header

    header = read_raster_header(img_path)
    row_off, col_off, n_rows, n_cols = get_window(roi, header["width"], header["height"])
    r0 = roi["row"]["first"] - row_off
    c0 = roi["col"]["first"] - col_off
    r1 = min(roi["row"]["last"] - row_off + 1, n_rows)
    c1 = min(roi["col"]["last"] - col_off + 1, n_cols)

    def crop(arr, row_axis, col_axis):
        if arr is None:
            return None
        sl = [slice(None)] * arr.ndim
        sl[row_axis], sl[col_axis] = slice(r0, r1), slice(c0, c1)
        return arr[tuple(sl)]

    transform = disp.transform
    if transform is not None:
        a, b, c, d, e, f = transform[:6]
        transform = (a, b, c + a * c0 + b * r0, d, e, f + d * c0 + e * r0)
    return dataclasses.replace(
        disp,
        disparity_map=crop(disp.disparity_map, 0, 1),
        validity_mask=crop(disp.validity_mask, 0, 1),
        confidence=crop(disp.confidence, 0, 1),
        interpolated_coeff=crop(disp.interpolated_coeff, 0, 1),
        disparity_interval=crop(disp.disparity_interval, 1, 2),
        transform=transform,
    )


def main(cfg_path: str, output: str, verbose: bool = False) -> None:
    """Config-file driver (reference main, __init__.py:151-202)."""
    from . import import_plugin

    setup_logging(verbose)
    import_plugin()  # third-party Step registrations (reference :170)
    user_cfg = read_config_file(cfg_path)
    # resolve relative image paths against the config file directory BEFORE
    # validation, so the header-level image checks can open them
    base = os.path.dirname(os.path.abspath(cfg_path))
    for side in ("left", "right"):
        side_cfg = user_cfg.get("input", {}).get(side, {})
        for key in ("img", "mask", "classif", "segm", "edges", "disp"):
            v = side_cfg.get(key)
            if isinstance(v, str) and not os.path.isabs(v):
                side_cfg[key] = os.path.join(base, v)
    cfg, pipeline = check_conf(user_cfg)
    Profiler.enable_from_config(cfg)
    roi = cfg.get("ROI")
    left_img, right_img = images_from_config(cfg["input"], roi=roi)
    check_datasets(left_img, right_img)
    left_disp, right_disp, _ = run(pipeline, left_img, right_img)
    if roi is not None:
        left_disp = crop_disparity_to_roi(left_disp, roi, cfg["input"]["left"]["img"])
        if right_disp is not None:
            right_disp = crop_disparity_to_roi(
                right_disp, roi, cfg["input"]["right"]["img"]
            )
    common.save_results(left_disp, right_disp, output)
    cfg["margins"] = pipeline.margins.to_dict()
    common.save_config(output, cfg)
    Profiler.generate_summary(output)
