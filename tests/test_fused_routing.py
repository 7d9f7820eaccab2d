"""Modular-engine fast-path routing: a census→SGM→WTA→vfit→median JSON
pipeline is routed through the fused uint8 scan-layout kernels on TPU
(pipeline.Pipeline._fused_plan).  On the CPU test mesh the routing is
forced with the interpret-mode hook and must be bit-equal to the
step-by-step engine."""

import jax.numpy as jnp
import numpy as np
import pytest

import pandora_tpu
from pandora_tpu import fused
from pandora_tpu.datamodel import Image
from pandora_tpu.ops import sgm as sgm_ops
from pandora_tpu.pipeline import Pipeline

RNG = np.random.default_rng(11)

PIPE_CFG = {
    "matching_cost": {"matching_cost_method": "census", "window_size": 5},
    "optimization": {"optimization_method": "sgm"},
    "disparity": {"disparity_method": "wta", "invalid_disparity": -9999},
    "refinement": {"refinement_method": "vfit"},
    "filter": {"filter_method": "median", "filter_size": 3},
}


def _images():
    left = (RNG.random((40, 48)) * 255).astype(np.float32)
    right = np.roll(left, 2, axis=1).astype(np.float32)
    limg = Image(
        im=jnp.asarray(left)[None],
        disp_min=jnp.full(left.shape, -8.0),
        disp_max=jnp.full(left.shape, 0.0),
    )
    rimg = Image(im=jnp.asarray(right)[None])
    return limg, rimg


def test_fused_plan_detection(monkeypatch):
    monkeypatch.setattr(sgm_ops, "default_use_pallas", lambda: True)
    pipe = Pipeline(PIPE_CFG)
    from pandora_tpu.steps.base import PipelineState

    limg, rimg = _images()
    state = PipelineState(left_img=limg, right_img=rimg)
    plan = pipe._fused_plan(state)
    assert plan is not None
    assert plan["p1"] == 8.0 and plan["p2"] == 32.0
    assert plan["dmin"] == -8 and plan["dmax"] == 0
    assert plan["refinement"] == "vfit" and plan["median_size"] == 3


@pytest.mark.parametrize(
    "mutate",
    [
        lambda c: c["optimization"].update({"overcounting": True}),
        lambda c: c["optimization"].update(
            {"penalty": {"penalty_method": "sgm_penalty", "p2_method": "negativeGradient"}}
        ),
        lambda c: c.update({"filter.2": {"filter_method": "bilateral", "sigma_color": 2.0, "sigma_space": 6.0}}),
        lambda c: c["matching_cost"].update({"matching_cost_method": "zncc", "window_size": 5}),
    ],
    ids=["overcounting", "variable-penalty", "extra-filter", "zncc"],
)
def test_fused_plan_rejects_unsupported(monkeypatch, mutate):
    import copy

    monkeypatch.setattr(sgm_ops, "default_use_pallas", lambda: True)
    cfg = copy.deepcopy(PIPE_CFG)
    mutate(cfg)
    pipe = Pipeline(cfg)
    from pandora_tpu.steps.base import PipelineState

    limg, rimg = _images()
    state = PipelineState(left_img=limg, right_img=rimg)
    assert pipe._fused_plan(state) is None


def test_fused_routing_matches_stepwise(monkeypatch):
    """Routed run == step-by-step run, bit-exact (disp AND vmask)."""
    from pandora_tpu.steps.base import PipelineState

    limg, rimg = _images()
    # step-by-step reference (CPU lax.scan engine)
    pipe = Pipeline(PIPE_CFG)
    ref_state = PipelineState(left_img=limg, right_img=rimg)
    pipe.run(ref_state)
    ref = ref_state.left_disparity

    # routed run (interpret-mode Pallas)
    monkeypatch.setattr(sgm_ops, "default_use_pallas", lambda: True)
    fused._INTERPRET = True
    try:
        got_state = PipelineState(left_img=limg, right_img=rimg)
        pipe2 = Pipeline(PIPE_CFG)
        plan = pipe2._fused_plan(got_state)
        assert plan is not None
        pipe2.run(got_state)
    finally:
        fused._INTERPRET = False
    got = got_state.left_disparity
    np.testing.assert_array_equal(
        np.asarray(got.validity_mask), np.asarray(ref.validity_mask)
    )
    np.testing.assert_array_equal(
        np.asarray(got.disparity_map), np.asarray(ref.disparity_map)
    )
    assert got.invalid_disparity == ref.invalid_disparity
