"""Multiscale (coarse-to-fine) pipeline example — the counterpart of the
reference's ``usage_with_multiscale.ipynb``: a 2-scale gaussian pyramid
narrows the per-pixel disparity search range at the fine scale.

Run:  PYTHONPATH=.. python multiscale_pipeline.py [data_dir]
"""

import sys

import numpy as np

import pandora_tpu
from pandora_tpu.config import check_conf
from pandora_tpu.io.raster import read_raster

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/pandora"

cfg = {
    "input": {
        "left": {"img": f"{DATA}/left.png", "disp": [-60, 0]},
        "right": {"img": f"{DATA}/right.png"},
    },
    "pipeline": {
        "matching_cost": {"matching_cost_method": "census", "window_size": 5},
        "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
        "filter": {"filter_method": "median", "filter_size": 3},
        "multiscale": {
            "multiscale_method": "fixed_zoom_pyramid",
            "num_scales": 2,
            "scale_factor": 2,
            "marge": 1,
        },
    },
}

validated, pipeline = check_conf(cfg)
left, right = pandora_tpu.images_from_config(validated["input"])
ld, _, _ = pandora_tpu.run(pipeline, left, right)

disp = np.asarray(ld.disparity_map)
gt, *_ = read_raster(f"{DATA}/disp_left.tif")
mask = gt[0] != 0
bad1 = float((np.abs(disp[mask] + gt[0][mask]) > 1).sum() / disp.size)
print(f"multiscale bad-1: {bad1:.3f}")
assert bad1 <= 0.35, bad1  # multiscale-class gate (reference <= 0.25 w/ SGM)
