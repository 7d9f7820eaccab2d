"""Step-by-step statistical analysis — the counterpart of the reference's
``statistical_and_visual_analysis.ipynb``: run the pipeline one step at a
time, inspect the intermediate cost volume, compare WTA with and without
SGM optimization, and break the validity mask down by criteria bit.

Run:  PYTHONPATH=.. python statistical_analysis.py [data_dir]
"""

import sys

import numpy as np

import pandora_tpu.constants as cst
from pandora_tpu.datamodel import make_image
from pandora_tpu.io.raster import read_raster
from pandora_tpu.steps.base import PipelineState, make_step

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/pandora"

left_arr, *_ = read_raster(f"{DATA}/left.png")
right_arr, *_ = read_raster(f"{DATA}/right.png")
gt, *_ = read_raster(f"{DATA}/disp_left.tif")
left = make_image(left_arr[0], disp=[-60, 0])
right = make_image(right_arr[0])


def error_rate(disp):
    mask = gt[0] != 0
    with np.errstate(invalid="ignore"):
        return float((np.abs(disp[mask] + gt[0][mask]) > 1).sum() / disp.size)


# ---- step 1: matching cost — inspect the raw volume -----------------------
mc = make_step("matching_cost", {"matching_cost_method": "census", "window_size": 5})
state = PipelineState(left_img=left, right_img=right)
mc.run(state)
cv = state.left_cv
vol = np.asarray(cv.cv)
print(f"cost volume: shape={vol.shape}  cmax={cv.cmax}")
print(f"  finite fraction: {np.isfinite(vol).mean():.3f}")
print(f"  mean cost at computed entries: {np.nanmean(vol):.2f}")
assert vol.shape == (375, 450, 61)

# ---- step 2: WTA WITHOUT optimization -------------------------------------
wta = make_step("disparity", {"disparity_method": "wta", "invalid_disparity": "NaN"})
raw = wta.to_disp(cv)
raw_err = error_rate(np.asarray(raw.disparity_map))
print(f"bad-1 without SGM: {raw_err:.3f}")

# ---- step 3: SGM optimization then WTA ------------------------------------
opt = make_step("optimization", {"optimization_method": "sgm"})
opt.run(state)
reg = wta.to_disp(state.left_cv)
reg_err = error_rate(np.asarray(reg.disparity_map))
print(f"bad-1 with    SGM: {reg_err:.3f}")
assert reg_err < raw_err, "SGM regularization must improve the raw WTA"

# ---- step 4: validity-mask bit histogram ----------------------------------
vm = np.asarray(reg.validity_mask)
named = {
    "border/left-nodata (bit 0)": cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER,
    "right range missing (bit 1)": cst.PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING,
    "right range incomplete (bit 2)": cst.PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE,
}
for name, bit in named.items():
    frac = float((vm & bit != 0).mean())
    print(f"  {name}: {frac:.3%}")
assert (vm & cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER != 0).any()
print("OK")
