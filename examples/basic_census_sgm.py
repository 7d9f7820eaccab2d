"""Basic pipeline example (the reference's introductory notebook flow):
census matching cost + SGM optimization + WTA + vfit + median on the
Middlebury cones pair, reporting the bad-1 error rate.

Run:  PYTHONPATH=.. python basic_census_sgm.py [data_dir]
"""

import sys

import numpy as np

import pandora_tpu
from pandora_tpu.io.raster import read_raster

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/pandora"

cfg = {
    "input": {
        "left": {"img": f"{DATA}/left.png", "disp": [-60, 0]},
        "right": {"img": f"{DATA}/right.png"},
    },
    "pipeline": {
        "matching_cost": {"matching_cost_method": "census", "window_size": 5, "subpix": 1},
        "optimization": {
            "optimization_method": "sgm",
            "penalty": {"penalty_method": "sgm_penalty", "P1": 8, "P2": 32},
        },
        "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
        "refinement": {"refinement_method": "vfit"},
        "filter": {"filter_method": "median", "filter_size": 3},
        "validation": {"validation_method": "cross_checking_accurate"},
    },
}

validated, pipeline = pandora_tpu.check_conf(cfg)
left_img, right_img = pandora_tpu.images_from_config(validated["input"])
left_disp, right_disp, _ = pandora_tpu.run(pipeline, left_img, right_img)

disp = np.asarray(left_disp.disparity_map)
gt, *_ = read_raster(f"{DATA}/disp_left.tif")
gt = gt[0]
known = gt != 0
bad1 = (np.abs(disp[known] + gt[known]) > 1).sum() / disp.size
print(f"left disparity: shape={disp.shape}  range=[{np.nanmin(disp):.1f}, {np.nanmax(disp):.1f}]")
print(f"bad-1 error rate vs ground truth: {bad1:.3f}  (reference gate: <= 0.20)")
print(f"validity: {np.asarray(left_disp.validity_mask).astype(bool).mean():.1%} flagged")
