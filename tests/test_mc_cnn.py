"""MC-CNN learned cost: features, cost volume, training step, step wiring
(capability of pandora_plugin_mccnn, plugin_mccnn.rst)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pandora_tpu.ops import mc_cnn as mc

RNG = np.random.default_rng(9)


def test_feature_shapes_and_norm():
    params = mc.init_params(0)
    img = jnp.asarray((RNG.random((20, 24)) * 255).astype(np.float32))
    f = mc.features(params, img)
    assert f.shape == (10, 14, mc.N_FEATURES)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=-1), 1.0, rtol=1e-5)


def test_cost_volume_validity_and_values():
    params = mc.init_params(0)
    h, w, dmin, dmax = 16, 18, -3, 1
    left = jnp.asarray((RNG.random((h, w)) * 255).astype(np.float32))
    right = jnp.asarray((RNG.random((h, w)) * 255).astype(np.float32))
    cv = np.asarray(mc.mc_cnn_cost_volume(params, left, right, dmin, dmax))
    assert cv.shape == (h, w, dmax - dmin + 1)
    m = mc.N_LAYERS
    # borders NaN
    assert np.isnan(cv[:m]).all() and np.isnan(cv[:, :m]).all()
    # interior: matches the explicit feature dot product (the CV applies
    # the paper's per-image zero-mean/unit-std normalization first)
    lnorm = (left - jnp.mean(left)) / (jnp.std(left) + 1e-8)
    rnorm = (right - jnp.mean(right)) / (jnp.std(right) + 1e-8)
    fl = np.asarray(mc.features(params, lnorm))
    fr = np.asarray(mc.features(params, rnorm))
    r, c, d = 3, 6, 2  # inner feature coords; disparity dmin+d = -1
    want = -np.dot(fl[r, c], fr[r, c + (dmin + d)])
    np.testing.assert_allclose(cv[r + m, c + m, d], want, rtol=1e-5)
    # out-of-range disparity -> NaN (c + d < 0)
    assert np.isnan(cv[m + 3, m, 0])  # col m+0 with d=-3 -> right col -3


def test_identical_images_prefer_zero_disparity():
    params = mc.init_params(0)
    img = jnp.asarray((RNG.random((20, 22)) * 255).astype(np.float32))
    cv = np.asarray(mc.mc_cnn_cost_volume(params, img, img, -2, 2))
    inner = cv[8:12, 8:12]
    assert (np.nanargmin(inner, axis=-1) == 2).all()  # d == 0 wins


def test_train_step_reduces_loss():
    params = mc.init_params(1)
    w = mc.WINDOW
    anchor = jnp.asarray(RNG.random((8, w, w), np.float32))
    pos = anchor + 0.01 * jnp.asarray(RNG.random((8, w, w), np.float32))
    neg = jnp.asarray(RNG.random((8, w, w), np.float32))
    l0 = mc.mc_cnn_hinge_loss(params, anchor, pos, neg)
    p = params
    for _ in range(10):
        p, loss = mc.mc_cnn_train_step(p, anchor, pos, neg, 0.01)
    assert float(loss) < float(l0)


def test_checkpoint_roundtrip(tmp_path):
    params = mc.init_params(2)
    path = str(tmp_path / "weights.npz")
    mc.save_params(path, params)
    loaded = mc.load_params(path)
    assert set(loaded) == set(params)
    np.testing.assert_array_equal(np.asarray(loaded["conv0/kernel"]), np.asarray(params["conv0/kernel"]))


def test_step_pipeline_runs():
    from pandora_tpu.pipeline import Pipeline

    p = Pipeline(
        {
            "matching_cost": {"matching_cost_method": "mc_cnn"},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
        }
    )
    assert p.validated_cfg["matching_cost"]["window_size"] == 11

    from pandora_tpu.datamodel import make_image
    from pandora_tpu.steps.base import PipelineState

    left = make_image(RNG.random((20, 24), np.float32) * 255, disp=(-2, 0))
    right = make_image(RNG.random((20, 24), np.float32) * 255)
    state = PipelineState(left_img=left, right_img=right)
    p.run(state)
    assert state.left_disparity.disparity_map.shape == (20, 24)


def test_step_rejects_bad_window():
    from pandora_tpu.pipeline import Pipeline
    from pandora_tpu.utils.schema import SchemaError

    with pytest.raises(SchemaError):
        Pipeline({"matching_cost": {"matching_cost_method": "mc_cnn", "window_size": 5}})


@pytest.mark.functional
def test_mc_cnn_bundled_checkpoint_cones(cones):
    """The bundled in-framework-trained checkpoint (scripts/train_mc_cnn.py)
    gives learned-cost quality on cones: raw mc_cnn+WTA must beat the
    census+WTA floor by a wide margin (counterpart of the plugin's
    pretrained weights, plugin_mccnn.rst:42-58)."""
    import os

    import jax.numpy as jnp

    from pandora_tpu.ops import mc_cnn
    from pandora_tpu.ops.wta import wta
    from conftest import error_rate

    bundled = os.path.join(
        os.path.dirname(mc_cnn.__file__), "..", "data", "mc_cnn_fast.npz"
    )
    assert os.path.exists(bundled)
    params = mc_cnn.load_params(bundled)
    cv = mc_cnn.mc_cnn_cost_volume(
        params, jnp.asarray(cones["left"]), jnp.asarray(cones["right"]), -60, 0
    )
    dv = jnp.arange(-60, 1, dtype=jnp.float32)
    disp, _, _ = wta(cv, dv, "min", jnp.nan, None)
    err = error_rate(np.asarray(disp), cones["gt_left"], 1)
    assert err <= 0.25  # census+WTA is ~0.40; trained mc_cnn ~0.18
