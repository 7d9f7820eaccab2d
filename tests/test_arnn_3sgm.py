"""ARNN → 3SGM end-to-end: the bundled LinkNet checkpoint segments a
synthetic building scene well enough to feed 3SGM piecewise optimization,
and the resulting segments actually change the disparity vs plain SGM
(the capability of pandora_plugin_arnn + plugin_libsgm 3SGM,
plugin_arnn.rst:1-80)."""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pandora_tpu.datamodel import Image
from pandora_tpu.pipeline import Pipeline
from pandora_tpu.steps.base import PipelineState, make_step

_CKPT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "pandora_tpu", "data", "linknet.npz"
)
needs_ckpt = pytest.mark.skipif(
    not os.path.exists(_CKPT), reason="bundled linknet.npz missing"
)


def _scene_gen():
    spec = importlib.util.spec_from_file_location(
        "train_linknet",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts", "train_linknet.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_scene


@needs_ckpt
def test_bundled_checkpoint_segments_buildings():
    """Quality gate on held-out synthetic scenes: mean IoU >= 0.5, pinning
    the bundled checkpoint's achieved quality (0.584 measured on these 4
    scenes, round 5; claimed held-out IoU 0.56 at training time).  The
    untrained He-init net scores ~0.01."""
    make_scene = _scene_gen()
    from pandora_tpu.ops import linknet

    params = linknet.load_params(_CKPT)
    rng = np.random.default_rng(123)
    ious = []
    for _ in range(4):
        im, mask = make_scene(rng)
        pred = np.asarray(linknet.segment(params, jnp.asarray(im))) > 0.5
        inter = (pred & (mask > 0.5)).sum()
        union = (pred | (mask > 0.5)).sum()
        ious.append(inter / max(union, 1))
    assert float(np.mean(ious)) >= 0.5, ious


@needs_ckpt
def test_arnn_segments_change_3sgm_disparity():
    """The predicted building mask feeds 3SGM restarts and produces a
    DIFFERENT disparity than plain SGM on the same pair."""
    spec = importlib.util.spec_from_file_location(
        "train_linknet",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts", "train_linknet.py"),
    )
    tl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tl)
    rng = np.random.default_rng(7)
    # two-layer scene: bright textured building (disparity -6) over a
    # darker ground (disparity -2) — SGM smooths across the roof edge,
    # 3SGM restarts its paths there
    ground = tl.fractal_texture(rng, 128, 128) * 90
    roof = tl.fractal_texture(rng, 128, 128) * 120 + 120
    m = np.zeros((128, 128), np.float32)
    m[40:90, 50:100] = 1.0
    rgb = (ground * (1 - m) + roof * m).astype(np.float32)
    right = (
        np.roll(ground, -2, axis=2) * (1 - np.roll(m, -6, 1))
        + np.roll(roof, -6, axis=2) * np.roll(m, -6, 1)
    ).astype(np.float32)
    rgb += rng.normal(0, 2, rgb.shape).astype(np.float32)
    right += rng.normal(0, 2, right.shape).astype(np.float32)

    def img(arr):
        return Image(
            im=jnp.asarray(arr),
            disp_min=jnp.full(arr.shape[1:], -8.0),
            disp_max=jnp.full(arr.shape[1:], 0.0),
            band_names=("r", "g", "b"),
        )

    seg_cfg = {
        "segmentation_method": "ARNN",
        "RGB_bands": {"R": "r", "G": "g", "B": "b"},
        "vegetation_band": {"classes": []},
    }
    base_pipe = {
        "matching_cost": {"matching_cost_method": "census", "window_size": 5, "band": "r"},
        "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
    }

    # plain SGM
    p1 = Pipeline(
        {
            "matching_cost": base_pipe["matching_cost"],
            "optimization": {"optimization_method": "sgm"},
            "disparity": base_pipe["disparity"],
        }
    )
    s1 = PipelineState(left_img=img(rgb), right_img=img(right))
    p1.run(s1)
    plain = np.asarray(s1.left_disparity.disparity_map)

    # ARNN segmentation → 3SGM piecewise from the predicted segm
    p2 = Pipeline(
        {
            "matching_cost": base_pipe["matching_cost"],
            "semantic_segmentation": seg_cfg,
            "optimization": {
                "optimization_method": "3sgm",
                "geometric_prior": {"source": "segm"},
            },
            "disparity": base_pipe["disparity"],
        }
    )
    s2 = PipelineState(left_img=img(rgb), right_img=img(right))
    p2.run(s2)
    piecewise = np.asarray(s2.left_disparity.disparity_map)

    # the segmentation step must have produced a non-trivial mask
    segm = np.asarray(s2.left_img.segm)
    assert 0 < segm.sum() < segm.size
    # and the segments must change the optimization result somewhere
    assert not np.array_equal(
        np.nan_to_num(plain, nan=-99.0), np.nan_to_num(piecewise, nan=-99.0)
    )
