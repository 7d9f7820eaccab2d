"""Cost-curve profiling + config-checking API — the counterpart of the
reference's advanced notebooks (``cost_profile_analysis.ipynb``,
``api_check_conf.ipynb``): extract per-pixel cost profiles along the
disparity axis, locate their minima, and drive ``check_conf`` /
``memory_consumption_estimation`` directly.

Run:  PYTHONPATH=.. python cost_profile_and_check_conf.py [data_dir]
"""

import sys

import numpy as np

from pandora_tpu.config import check_conf, memory_consumption_estimation
from pandora_tpu.datamodel import make_image
from pandora_tpu.io.raster import read_raster
from pandora_tpu.steps.base import PipelineState, make_step
from pandora_tpu.utils.schema import SchemaError

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/pandora"

# ---- check_conf API: valid config, defaults folded in ---------------------
cfg = {
    "input": {
        "left": {"img": f"{DATA}/left.png", "disp": [-60, 0]},
        "right": {"img": f"{DATA}/right.png"},
    },
    "pipeline": {
        "matching_cost": {"matching_cost_method": "census"},
        "disparity": {"disparity_method": "wta"},
    },
}
validated, pipeline = check_conf(cfg)
print("validated window_size:", validated["pipeline"]["matching_cost"]["window_size"])
assert validated["pipeline"]["matching_cost"]["window_size"] == 5  # default folded

# bad sequencing is rejected with a MachineError-style failure
from pandora_tpu.pipeline import MachineError

try:
    check_conf({**cfg, "pipeline": {"disparity": {"disparity_method": "wta"}}})
    raise AssertionError("bad sequencing must be rejected")
except (SchemaError, MachineError) as exc:
    print("rejected bad sequencing:", type(exc).__name__)

# memory estimation (check_configuration.py:336-412 linear models)
lo, hi = memory_consumption_estimation(validated, (375, 450), -60, 0)
print(f"estimated memory: {lo:.0f}..{hi:.0f} MiB")
assert lo < hi

# ---- cost profiles --------------------------------------------------------
left_arr, *_ = read_raster(f"{DATA}/left.png")
right_arr, *_ = read_raster(f"{DATA}/right.png")
left = make_image(left_arr[0], disp=[-60, 0])
right = make_image(right_arr[0])
mc = make_step("matching_cost", {"matching_cost_method": "census", "window_size": 5})
state = PipelineState(left_img=left, right_img=right)
mc.run(state)
cv = np.asarray(state.left_cv.cv)
disps = np.asarray(state.left_cv.disp_range)

for (r, c) in [(180, 220), (200, 300), (100, 150)]:
    profile = cv[r, c]
    k = int(np.nanargmin(profile))
    print(
        f"pixel ({r},{c}): min cost {profile[k]:.0f} at d={disps[k]:.0f}, "
        f"curve span [{np.nanmin(profile):.0f}, {np.nanmax(profile):.0f}]"
    )
    assert np.nanmin(profile) == profile[k]
print("OK")
