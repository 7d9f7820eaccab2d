"""FULL modular pipeline under shard_map: tiled == untiled equality.

The contract (same as the reference's CARS tiling and the fused tiled
path): interior pixels further than one halo from a scene edge are
identical between the sharded and the single-program run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pandora_tpu.api import run as run_pipeline
from pandora_tpu.datamodel import make_image
from pandora_tpu.parallel.mesh import make_mesh
from pandora_tpu.parallel.modular import check_shardable, tiled_modular_pipeline
from pandora_tpu.pipeline import Pipeline

# census + SGM + ambiguity + WTA + vfit + median + cross-checking — the
# "complete JSON config" shape of the reference's standard pipeline
FULL_CFG = {
    "matching_cost": {"matching_cost_method": "census", "window_size": 5},
    "optimization": {"optimization_method": "sgm"},
    "cost_volume_confidence": {"confidence_method": "ambiguity"},
    "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
    "refinement": {"refinement_method": "vfit"},
    "filter": {"filter_method": "median", "filter_size": 3},
    "validation": {"validation_method": "cross_checking_fast"},
}


def _untiled(cfg, left, right, dmin, dmax):
    meta = {"global_disparity": (dmin, dmax)}
    left_img = make_image(left, (dmin, dmax), **meta)
    right_img = make_image(right, (-dmax, -dmin), **meta)
    pipe = Pipeline(cfg)
    left_ds, right_ds, _ = run_pipeline(pipe, left_img, right_img)
    return left_ds


def _scene(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w + 16), np.float32) * 200
    # smooth a little so SGM has structure to regularize
    k = np.ones((3, 3), np.float32) / 9
    from scipy.signal import convolve2d

    base = convolve2d(base, k, mode="same").astype(np.float32)
    left = base[:, 8 : 8 + w]
    right = base[:, 4 : 4 + w]  # ~constant disparity of -4
    return left, right


def test_full_modular_pipeline_tiled_equals_untiled():
    """Complete config on the 8-device ("data","tile") mesh, real cones
    pair, real [-60, 0] range: interior equality.

    SGM variants are compared on natural imagery — the 40 px influence
    truncation is the reference's empirical contract for natural images
    (marge.py:86-89); pure noise is the worst case for influence decay."""
    from pandora_tpu.io.raster import read_raster

    dmin, dmax = -60, 0
    left_full, *_ = read_raster("/root/reference/tests/pandora/left.png")
    right_full, *_ = read_raster("/root/reference/tests/pandora/right.png")
    w = 448  # 4-tile divisible crop of the 450-wide cones pair
    left = np.asarray(left_full[0][:, :w], np.float32)
    right = np.asarray(right_full[0][:, :w], np.float32)
    n_tile = 4
    mesh = make_mesh(n_data=2, n_tile=n_tile)

    fn = tiled_modular_pipeline(mesh, FULL_CFG, dmin=dmin, dmax=dmax)
    lb = jnp.stack([jnp.asarray(left)] * 2)
    rb = jnp.stack([jnp.asarray(right)] * 2)
    out = fn(lb, rb)

    ref = _untiled(FULL_CFG, left, right, dmin, dmax)

    # interior: one halo + disparity reach away from the scene's col edges
    pipe = Pipeline(FULL_CFG)
    gm = pipe.margins.global_margins
    halo = max(gm.left, gm.right) + max(abs(dmin), abs(dmax))
    assert halo <= w // n_tile, "test scene must fit the halo in one shard"
    sl = slice(halo + max(abs(dmin), abs(dmax)), w - halo - max(abs(dmin), abs(dmax)))

    got_d = np.asarray(out["disparity_map"][0])[:, sl]
    want_d = np.asarray(ref.disparity_map)[:, sl]
    both_nan = np.isnan(got_d) & np.isnan(want_d)
    np.testing.assert_array_equal(np.where(both_nan, 0, got_d), np.where(both_nan, 0, want_d))

    got_v = np.asarray(out["validity_mask"][0])[:, sl]
    want_v = np.asarray(ref.validity_mask)[:, sl]
    np.testing.assert_array_equal(got_v, want_v)

    # the ambiguity confidence band (extremum-normalized via the
    # global_disparity contract) and the cross-checking consistency band
    names = list(ref.indicator_names)
    got_c = np.asarray(out["confidence"][0])[:, sl]
    want_c = np.asarray(ref.confidence)[:, sl]
    assert got_c.shape[-1] == len(names) == 2
    both_nan = np.isnan(got_c) & np.isnan(want_c)
    np.testing.assert_allclose(
        np.where(both_nan, 0, got_c), np.where(both_nan, 0, want_c), atol=1e-6
    )

    # batch element 1 is the same pair — data parallelism must not mix pairs
    np.testing.assert_array_equal(
        np.asarray(out["disparity_map"][0]), np.asarray(out["disparity_map"][1])
    )


def test_collective_percentile_matches_untiled_interior():
    """Without global_disparity the ambiguity percentile is a cross-tile
    collective over gathered tile interiors; on a borderless comparison it
    must match the untiled percentile closely."""
    h, w, dmin, dmax = 32, 256, -4, 0
    left, right = _scene(h, w, seed=3)
    cfg = {
        "matching_cost": {"matching_cost_method": "census", "window_size": 3},
        "cost_volume_confidence": {"confidence_method": "ambiguity"},
        "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
    }
    mesh = make_mesh(n_data=1, n_tile=4)
    fn = tiled_modular_pipeline(mesh, cfg, dmin=dmin, dmax=dmax, use_global_disparity=False)
    out = fn(jnp.asarray(left)[None], jnp.asarray(right)[None])

    left_img = make_image(left, (dmin, dmax))
    right_img = make_image(right, (-dmax, -dmin))
    ref, _, _ = run_pipeline(Pipeline(cfg), left_img, right_img)

    halo = 1 + 4  # half window + disparity reach (no SGM in this config)
    sl = slice(halo + 4, w - halo - 4)
    got = np.asarray(out["confidence"][0])[:, sl, 0]
    want = np.asarray(ref.confidence)[:, sl, 0]
    both_nan = np.isnan(got) & np.isnan(want)
    np.testing.assert_allclose(
        np.where(both_nan, 0, got), np.where(both_nan, 0, want), atol=2e-2
    )


def test_check_shardable_rejects_host_side_steps():
    bad = {
        "matching_cost": {"matching_cost_method": "census", "window_size": 5},
        "disparity": {"disparity_method": "wta"},
        "multiscale": {
            "multiscale_method": "fixed_zoom_pyramid",
            "num_scales": 2,
            "scale_factor": 2,
        },
    }
    with pytest.raises(ValueError, match="multiscale"):
        check_shardable(Pipeline(bad))

    bad2 = {
        "matching_cost": {"matching_cost_method": "census", "window_size": 5},
        "cost_volume_confidence": {"confidence_method": "ambiguity"},
        "cost_volume_confidence.int": {
            "confidence_method": "interval_bounds",
            "regularization": True,
        },
        "disparity": {"disparity_method": "wta"},
    }
    with pytest.raises(ValueError, match="interval_bounds"):
        check_shardable(Pipeline(bad2))


def test_full_modular_tiled_with_interpolation_and_accurate():
    """cross_checking_accurate + occlusion/mismatch interpolation on the
    2-D ("data","row","col") mesh: the map-domain phase runs on gathered
    full-scene maps, so interpolation (which propagates along whole rows)
    matches untiled wherever its *inputs* match — i.e. the interior."""
    from pandora_tpu.io.raster import read_raster

    # the TRUE cones range: clipping it (e.g. -30) starves the data term
    # over whole regions and SGM influence then legitimately exceeds the
    # 40 px truncation — the contract is for adequate search ranges
    dmin, dmax = -60, 0
    left_full, *_ = read_raster("/root/reference/tests/pandora/left.png")
    right_full, *_ = read_raster("/root/reference/tests/pandora/right.png")
    # chained validation reach needs a wider-than-cones scene for a
    # non-empty interior: mirror-concatenate (still natural texture; both
    # runs see the same stitched scene)
    h, w = 368, 896
    la = np.asarray(left_full[0][:h, :448], np.float32)
    ra = np.asarray(right_full[0][:h, :448], np.float32)
    left = np.concatenate([la, la], axis=1)
    right = np.concatenate([ra, ra], axis=1)

    cfg = dict(FULL_CFG)
    cfg["validation"] = {
        "validation_method": "cross_checking_accurate",
        "interpolated_disparity": "sgm",
    }
    from pandora_tpu.parallel.mesh import make_mesh2d

    mesh = make_mesh2d(n_data=2, n_row=2, n_col=2)
    fn = tiled_modular_pipeline(mesh, cfg, dmin=dmin, dmax=dmax)
    out = fn(jnp.stack([jnp.asarray(left)] * 2), jnp.stack([jnp.asarray(right)] * 2))

    ref = _untiled(cfg, left, right, dmin, dmax)

    import pandora_tpu.constants as cst

    pipe = Pipeline(cfg)
    gm = pipe.margins.global_margins
    reach = max(abs(dmin), abs(dmax))
    col_halo = max(gm.left, gm.right) + reach
    row_halo = max(gm.up, gm.down)
    # chained reach: the left cross-check at col i reads the right map at
    # i-reach..i, and the right map's own scene-border band is col_halo +
    # reach wide — so validated-map equality holds from col_halo + 2*reach
    sl_r = slice(row_halo, h - row_halo)
    sl_c = slice(col_halo + 2 * reach, w - col_halo - 2 * reach)
    assert sl_c.stop > sl_c.start, "empty interior — shrink halo chain"
    # the repetition seam at col 448 breaks stereo geometry (no valid
    # correspondence → flat costs → SGM influence legitimately exceeds the
    # 40 px truncation there) — a stitching artifact, excluded like the
    # scene borders
    cols = np.arange(sl_c.start, sl_c.stop)
    keep = np.abs(cols - 448) > col_halo + reach
    assert keep.sum() > 50

    def pick(a):
        return a[sl_r, sl_c][:, keep]

    got_d = pick(np.asarray(out["disparity_map"][0]))
    want_d = pick(np.asarray(ref.disparity_map))
    want_v = pick(np.asarray(ref.validity_mask))
    filled = (
        want_v & (cst.PANDORA_MSK_PIXEL_FILLED_OCCLUSION | cst.PANDORA_MSK_PIXEL_FILLED_MISMATCH)
    ) != 0
    both_nan = np.isnan(got_d) & np.isnan(want_d)
    agree = np.where(both_nan, 0, got_d) == np.where(both_nan, 0, want_d)
    # interpolation-FILLED pixels source their value from row-global
    # neighbors that may sit in the (differing) scene-border band; every
    # non-filled interior pixel must agree exactly
    np.testing.assert_array_equal(agree | filled, True)
    assert agree[filled].mean() > 0.9, f"filled agreement {agree[filled].mean():.4f}"

    got_r = pick(np.asarray(out["right_disparity_map"][0]))
    assert got_r.shape == got_d.shape
