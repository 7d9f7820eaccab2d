"""Large-scene example: stream a scene through the checkpointed tile-grid
executor (SceneRunner) — the resume/fault-tolerance pattern the reference
delegates to CARS (SURVEY §5.4).

  PYTHONPATH=.. JAX_PLATFORMS=cpu python large_scene_checkpointed.py /tmp/ckpt
"""

import sys
import tempfile

import numpy as np

from pandora_tpu.io.raster import read_raster
from pandora_tpu.parallel import SceneRunner

workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="scene_")

left, *_ = read_raster("/root/reference/tests/pandora/left.png")
right, *_ = read_raster("/root/reference/tests/pandora/right.png")
left, right = left[0], right[0]
rows, cols = left.shape


def read_block(r0, c0, nr, nc):
    # in production this is a windowed raster read (io.raster.read_raster
    # with window=...) instead of a slice of an in-memory array
    return left[r0 : r0 + nr, c0 : c0 + nc], right[r0 : r0 + nr, c0 : c0 + nc]


runner = SceneRunner(
    workdir,
    tile_shape=(128, 128),
    dmin=-60,
    dmax=0,
    window_size=5,
    matching_cost="census",
    optimization="sgm",
    p1=8.0,
    p2=32.0,
    refinement="vfit",
    median_size=3,
)
stats = runner.run(read_block, rows, cols)
print("tiles:", stats, "— rerun this script: everything is 'skipped' (resume)")
disp, vmask = runner.stitch(rows, cols)
print(f"stitched: {disp.shape}, range [{np.nanmin(disp):.1f}, {np.nanmax(disp):.1f}]")
print("checkpoints in", workdir)
