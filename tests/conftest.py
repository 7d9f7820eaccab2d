"""Test-session setup: force an 8-device virtual-CPU JAX platform.

The environment pins JAX to the single-chip 'axon' TPU platform via a
sitecustomize hook; tests must run on CPU (fast compiles, no device
contention) with 8 virtual devices to exercise the multi-chip sharding
paths.  ``jax.config.update`` wins over the env var, and XLA_FLAGS must be
set before the CPU client is instantiated — both happen here at conftest
import, before any test imports the library.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# PANDORA_TPU_HW_TESTS=1 keeps the session on the real TPU platform so the
# @pytest.mark.tpu suite exercises COMPILED Mosaic kernels (everything else
# runs in interpret mode on CPU and would miss layout/lowering regressions)
if os.environ.get("PANDORA_TPU_HW_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/tests/pandora"


@pytest.fixture(scope="session")
def cones():
    """Middlebury cones pair + ground truth (reference tests/pandora/)."""
    from pandora_tpu.io.raster import read_raster

    left, *_ = read_raster(os.path.join(REFERENCE_DATA, "left.png"))
    right, *_ = read_raster(os.path.join(REFERENCE_DATA, "right.png"))
    gt_left, *_ = read_raster(os.path.join(REFERENCE_DATA, "disp_left.tif"))
    gt_right, *_ = read_raster(os.path.join(REFERENCE_DATA, "disp_right.tif"))
    occlusion, *_ = read_raster(os.path.join(REFERENCE_DATA, "occlusion.png"))
    return {
        "left": left[0],
        "right": right[0],
        "gt_left": gt_left[0],
        "gt_right": gt_right[0],
        "occlusion": occlusion[0],
    }


def error_rate(disp: np.ndarray, gt: np.ndarray, threshold: float = 1.0) -> float:
    """Exact reference metric (functional_tests/test_basic.py:45-70):
    count of gt-known pixels with |disp + gt| > threshold, divided by the
    TOTAL pixel count (gt stores positive disparities of opposite sign;
    NaN comparisons are False so NaN disparities never count as errors)."""
    mask = gt != 0
    with np.errstate(invalid="ignore"):
        n_err = (np.abs(disp[mask] + gt[mask]) > threshold).sum()
    return float(n_err / disp.size)
