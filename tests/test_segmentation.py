"""ARNN semantic-segmentation step: LinkNet inference, vegetation
filtering, segm insertion, 3SGM consumption."""

import numpy as np
import jax.numpy as jnp
import pytest

from pandora_tpu.ops import linknet

RNG = np.random.default_rng(4)


def test_linknet_shapes_and_range():
    params = linknet.init_params(0)
    rgb = jnp.asarray(RNG.random((3, 40, 52), np.float32) * 255)
    prob = linknet.segment(params, rgb)
    assert prob.shape == (40, 52)
    p = np.asarray(prob)
    assert (p >= 0).all() and (p <= 1).all()


def test_linknet_train_step_reduces_loss():
    params = linknet.init_params(1)
    rgb = jnp.asarray(RNG.random((3, 32, 32), np.float32) * 255)
    target = jnp.asarray((RNG.random((32, 32)) > 0.5).astype(np.float32))
    l0 = linknet.bce_loss(params, rgb, target)
    p = params
    for _ in range(5):
        p, loss = linknet.train_step(p, rgb, target, 1e-2)
    assert float(loss) < float(l0)


def test_checkpoint_roundtrip(tmp_path):
    params = linknet.init_params(2)
    path = str(tmp_path / "arnn.npz")
    linknet.save_params(path, params)
    loaded = linknet.load_params(path)
    assert set(loaded) == set(params)


def test_step_inserts_segm_and_filters_vegetation():
    from pandora_tpu.datamodel import make_image
    from pandora_tpu.steps.base import PipelineState, make_step

    h, w = 36, 40
    im = RNG.random((3, h, w), np.float32) * 255
    classif = np.zeros((1, h, w), np.int16)
    classif[0, :, : w // 2] = 1  # left half = forest
    img = make_image(im, disp=(-2, 0), band_names=("r", "g", "b"))
    img.classif = jnp.asarray(classif)
    img.classif_names = ("forest",)
    right = make_image(RNG.random((3, h, w), np.float32) * 255, band_names=("r", "g", "b"))

    step = make_step(
        "semantic_segmentation",
        {
            "segmentation_method": "ARNN",
            "RGB_bands": {"R": "r", "G": "g", "B": "b"},
            "vegetation_band": {"classes": ["forest"]},
            "threshold": 0.4,
        },
    )
    state = PipelineState(left_img=img, right_img=right)
    step.run(state)
    segm = np.asarray(state.left_img.segm)
    assert segm.shape == (h, w)
    assert (segm[:, : w // 2] == 0).all()  # vegetation filtered


def test_sequencing_before_optimization():
    from pandora_tpu.pipeline import Pipeline

    p = Pipeline(
        {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "semantic_segmentation": {
                "segmentation_method": "ARNN",
                "RGB_bands": {"R": "r", "G": "g", "B": "b"},
                "vegetation_band": {"classes": []},
            },
            "optimization": {"optimization_method": "3sgm", "geometric_prior": {"source": "segm"}},
            "disparity": {"disparity_method": "wta"},
        }
    )
    assert [k for k, _ in p.steps][1] == "semantic_segmentation"


def test_bad_rgb_bands_rejected():
    from pandora_tpu.steps.base import make_step

    with pytest.raises(ValueError):
        make_step(
            "semantic_segmentation",
            {
                "segmentation_method": "ARNN",
                "RGB_bands": {"R": "r"},
                "vegetation_band": {"classes": []},
            },
        )
