"""Fused stereo_pipeline == modular Pipeline, bit-exact.

The fused serving path (pandora_tpu.fused) must produce the SAME
(disparity, validity_mask) as the modular JSON pipeline on a masked,
bordered pair — full criteria bitmask included (reference semantics:
criteria.py:67-353 + matching_cost.cv_masked matching_cost.py:770-872).
Both ``sgm_fused_epilogue`` settings are covered; the fast Pallas path
runs in interpret mode on the CPU test mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pandora_tpu
from pandora_tpu import fused
from pandora_tpu.datamodel import Image
from pandora_tpu.pipeline import Pipeline

RNG = np.random.default_rng(7)
DMIN, DMAX = -12, 0


def _pair(h=48, w=56):
    left = (RNG.random((h, w)) * 255).astype(np.float32)
    right = np.roll(left, 3, axis=1) + RNG.normal(0, 2, (h, w)).astype(np.float32)
    right = right.astype(np.float32)
    lmsk = np.zeros((h, w), np.int16)
    rmsk = np.zeros((h, w), np.int16)
    lmsk[10:14, 20:26] = 1  # nodata (window-dilated)
    lmsk[30:33, 5:9] = 7  # user-invalidated
    rmsk[22:26, 30:37] = 1
    rmsk[40:42, 10:13] = 3
    return left, right, lmsk, rmsk


def _modular(left, right, lmsk, rmsk, subpix, refinement, median):
    pipeline_cfg = {
        "matching_cost": {
            "matching_cost_method": "census",
            "window_size": 5,
            "subpix": subpix,
        },
        "optimization": {"optimization_method": "sgm"},
        "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
    }
    if refinement:
        pipeline_cfg["refinement"] = {"refinement_method": refinement}
    if median:
        pipeline_cfg["filter"] = {"filter_method": "median", "filter_size": median}
    pipe = Pipeline(pipeline_cfg)
    limg = Image(
        im=jnp.asarray(left)[None],
        msk=jnp.asarray(lmsk) if lmsk is not None else None,
        disp_min=jnp.full(left.shape, float(DMIN), jnp.float32),
        disp_max=jnp.full(left.shape, float(DMAX), jnp.float32),
    )
    rimg = Image(
        im=jnp.asarray(right)[None],
        msk=jnp.asarray(rmsk) if rmsk is not None else None,
    )
    ld, _, _ = pandora_tpu.run(pipe, limg, rimg)
    return np.asarray(ld.disparity_map), np.asarray(ld.validity_mask)


def _fused(left, right, lmsk, rmsk, subpix, refinement, median, epilogue):
    fused._INTERPRET = True
    try:
        disp, vmask = fused.stereo_pipeline(
            jnp.asarray(left),
            jnp.asarray(right),
            jnp.asarray(lmsk) if lmsk is not None else None,
            jnp.asarray(rmsk) if rmsk is not None else None,
            dmin=DMIN,
            dmax=DMAX,
            subpix=subpix,
            window_size=5,
            refinement=refinement,
            median_size=median or 0,
            sgm_fused_epilogue=epilogue,
        )
    finally:
        fused._INTERPRET = False
    return np.asarray(disp), np.asarray(vmask)


@pytest.mark.parametrize("epilogue", [True, False], ids=["fastpath", "epilogue"])
@pytest.mark.parametrize("subpix", [1, 2])
def test_fused_equals_modular_masked(subpix, epilogue):
    left, right, lmsk, rmsk = _pair()
    want_d, want_v = _modular(left, right, lmsk, rmsk, subpix, "vfit", 3)
    got_d, got_v = _fused(left, right, lmsk, rmsk, subpix, "vfit", 3, epilogue)
    np.testing.assert_array_equal(got_v, want_v)
    np.testing.assert_array_equal(got_d, want_d)


def test_fused_no_masks_matches_modular():
    """Maskless pair: border/range bits must still match bit-for-bit."""
    left, right, _, _ = _pair(40, 44)
    want_d, want_v = _modular(left, right, None, None, 1, "vfit", 0)

    def run(epilogue):
        fused._INTERPRET = True
        try:
            d, v = fused.stereo_pipeline(
                jnp.asarray(left),
                jnp.asarray(right),
                dmin=DMIN,
                dmax=DMAX,
                window_size=5,
                refinement="vfit",
                sgm_fused_epilogue=epilogue,
            )
        finally:
            fused._INTERPRET = False
        return np.asarray(d), np.asarray(v)

    for epi in (True, False):
        got_d, got_v = run(epi)
        np.testing.assert_array_equal(got_v, want_v, err_msg=f"epilogue={epi}")
        np.testing.assert_array_equal(got_d, want_d, err_msg=f"epilogue={epi}")


def test_fused_mask_changes_output():
    """Sanity: the input masks actually flow into the fused CV (masked
    pixels cannot win WTA) — guards against silently dropped masks."""
    left, right, lmsk, rmsk = _pair(40, 44)
    d_masked, v_masked = _fused(left, right, lmsk, rmsk, 1, "vfit", 0, True)
    d_plain, v_plain = _fused(left, right, None, None, 1, "vfit", 0, True)
    assert not np.array_equal(v_masked, v_plain)
    import pandora_tpu.constants as cst

    # user-invalidated left pixels carry bit 6
    assert np.all(v_masked[30:33, 5:9] & cst.PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT)
    # the masked disparity differs somewhere inside the dilated nodata zone
    zone = (slice(8, 16), slice(18, 28))
    assert not np.array_equal(
        np.nan_to_num(d_masked[zone], nan=-1e9), np.nan_to_num(d_plain[zone], nan=-1e9)
    )
