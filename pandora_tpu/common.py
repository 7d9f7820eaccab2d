"""Output writing: fixed output tree of GeoTIFF products + executed config.

Reference: common.py:40-220 and output_tree_design.py:28-55.  Products:
left/right ``*_disparity.tif`` (float32), ``*_validity_mask.tif`` (uint16),
``*_confidence_measure.tif`` (multi-band float32) and ``cfg/config.json``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from .datamodel import DisparityMap
from .io.raster import write_geotiff


def mkdir_p(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def save_dataset(disp: DisparityMap, output: str, prefix: str) -> None:
    mkdir_p(output)
    write_geotiff(
        os.path.join(output, f"{prefix}_disparity.tif"),
        np.asarray(disp.disparity_map, np.float32),
        transform=disp.transform,
        crs=disp.crs,
    )
    write_geotiff(
        os.path.join(output, f"{prefix}_validity_mask.tif"),
        np.asarray(disp.validity_mask, np.uint16),
        transform=disp.transform,
        crs=disp.crs,
    )
    if disp.confidence is not None:
        conf = np.asarray(disp.confidence, np.float32)
        write_geotiff(
            os.path.join(output, f"{prefix}_confidence_measure.tif"),
            np.moveaxis(conf, -1, 0),
            transform=disp.transform,
            crs=disp.crs,
            band_names=disp.indicator_names or None,
        )


def save_results(
    left: DisparityMap, right: Optional[DisparityMap], output: str
) -> None:
    """common.save_results (common.py:112-181)."""
    save_dataset(left, output, "left")
    if right is not None:
        save_dataset(right, output, "right")


class _NanEncoder(json.JSONEncoder):
    def default(self, o):  # numpy scalars
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        return super().default(o)


def save_config(output: str, user_cfg: Dict[str, Any]) -> None:
    """Persist the executed config incl. computed margins
    (common.save_config, common.py:202-220) and the command line
    (output_tree_design.py OTD 'command_line.txt')."""
    import sys

    mkdir_p(os.path.join(output, "cfg"))
    with open(os.path.join(output, "cfg", "config.json"), "w", encoding="utf-8") as fh:
        json.dump(user_cfg, fh, indent=2, cls=_NanEncoder)
    with open(os.path.join(output, "cfg", "command_line.txt"), "w", encoding="utf-8") as fh:
        fh.write(" ".join(sys.argv) + "\n")
