"""Smoke-run the examples (the notebook-regression analogue, SURVEY §4)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples")


@pytest.mark.functional
@pytest.mark.parametrize(
    "script",
    [
        "basic_census_sgm.py",
        "tiled_multichip.py",
        "large_scene_checkpointed.py",
        "multiscale_pipeline.py",
        "statistical_analysis.py",
        "cost_profile_and_check_conf.py",
    ],
)
def test_example_runs(script, tmp_path):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
        PYTHONPATH=os.path.join(EXAMPLES, ".."),
    )
    args = [sys.executable, os.path.join(EXAMPLES, script)]
    if script == "large_scene_checkpointed.py":
        args.append(str(tmp_path))
    out = subprocess.run(args, env=env, capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
