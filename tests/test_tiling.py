"""Tiled (multi-chip) vs untiled equivalence on the 8-device virtual mesh.

The contract (SURVEY §2.5, marge.py:85-106): with halo = margins + max|disp|
+ the 40 px SGM influence truncation + post-WTA filter reach, the tiled
result matches the untiled one everywhere further than one halo from a scene
edge — the same guarantee the reference gives CARS for its ROI tiling.  The
40 px SGM bound is the reference's empirical contract for natural images
(marge.py:86-89), so SGM variants are checked on the real cones pair; pure
random noise (worst case for SGM influence decay) is used only for the
local-matching variants, where equality is exact by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pandora_tpu.fused import make_jitted_pipeline
from pandora_tpu.parallel import (
    halo_width,
    make_mesh,
    make_mesh2d,
    row_halo_width,
    tiled_stereo_pipeline,
)

CFG = dict(
    dmin=-8,
    dmax=0,
    subpix=1,
    window_size=5,
    matching_cost="census",
    p1=8.0,
    p2=32.0,
    refinement="vfit",
    median_size=3,
)


def _pair(rows, cols, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((batch, rows, cols + 8), np.float32) * 255
    left = base[:, :, 8:]
    right = 0.7 * base[:, :, :-8] + 0.3 * rng.random((batch, rows, cols), np.float32) * 255
    return jnp.asarray(left), jnp.asarray(right)


def _cones_pair(rows, cols):
    from pandora_tpu.io.raster import read_raster

    left, *_ = read_raster("/root/reference/tests/pandora/left.png")
    right, *_ = read_raster("/root/reference/tests/pandora/right.png")
    return (
        jnp.asarray(left[0][None, :rows, :cols]),
        jnp.asarray(right[0][None, :rows, :cols]),
    )


def _untiled(left, right, **cfg):
    fn = make_jitted_pipeline(**cfg)
    disp = np.stack([np.asarray(fn(l, r)[0]) for l, r in zip(left, right)])
    vmask = np.stack([np.asarray(fn(l, r)[1]) for l, r in zip(left, right)])
    return disp, vmask


def _assert_interior_equal(disp_t, vmask_t, disp_u, vmask_u, interior):
    dt, du = np.asarray(disp_t)[interior], disp_u[interior]
    np.testing.assert_array_equal(np.asarray(vmask_t)[interior], vmask_u[interior])
    both = np.where(np.isnan(dt) & np.isnan(du), 0.0, dt - du)
    np.testing.assert_allclose(both, 0.0, atol=0.0)


def test_col_tiled_matches_untiled_full_scene_local():
    """No interior crop: scene-edge tiles carry the TRUE border criteria
    (global-bounds masking), so tiled == untiled over the WHOLE scene for
    local pipelines (round-5 VERDICT #10)."""
    cfg = dict(CFG, optimization=None)
    rows, cols, n_tile = 40, 4 * 64, 4
    left, right = _pair(rows, cols)
    mesh = make_mesh(n_data=2, n_tile=n_tile)
    tiled_fn = tiled_stereo_pipeline(mesh, **cfg)

    sh = NamedSharding(mesh, P("data", None, "tile"))
    disp_t, vmask_t = tiled_fn(jax.device_put(left, sh), jax.device_put(right, sh))
    disp_u, vmask_u = _untiled(left, right, **cfg)

    halo = halo_width(cfg["dmin"], cfg["dmax"], cfg["window_size"], False, 1)
    assert halo < cols // n_tile  # halo fits one shard: contract applies
    _assert_interior_equal(disp_t, vmask_t, disp_u, vmask_u, np.s_[:, :, :])


@pytest.mark.functional
def test_col_tiled_matches_untiled_full_scene_sgm_cones():
    """SGM variant over the WHOLE scene: interior tile boundaries are
    exact under the 40 px influence contract (the replication halo) and
    scene-edge tiles now carry the true border criteria, so no crop."""
    cfg = dict(CFG, dmin=-60, optimization="sgm")
    rows, cols, n_tile = 375, 448, 4
    left, right = _cones_pair(rows, cols)
    mesh = make_mesh(n_data=1, n_tile=n_tile)
    tiled_fn = tiled_stereo_pipeline(mesh, **cfg)

    sh = NamedSharding(mesh, P("data", None, "tile"))
    disp_t, vmask_t = tiled_fn(jax.device_put(left, sh), jax.device_put(right, sh))
    disp_u, vmask_u = _untiled(left, right, **cfg)

    halo = halo_width(cfg["dmin"], cfg["dmax"], cfg["window_size"], True, 1)
    assert halo < cols // n_tile
    _assert_interior_equal(disp_t, vmask_t, disp_u, vmask_u, np.s_[:, :, :])


@pytest.mark.functional
def test_2d_tiled_full_scene_sgm_cones_bitexact_at_margin_100():
    """2-D tiling over the WHOLE scene, bit-exact, with the SGM influence
    margin raised to 100 px: near the scene's heavy-NaN disparity wedge
    the influence decays slower than the reference's 40 px contract, and
    the deeper row halo absorbs it (round-5 VERDICT #10)."""
    cfg = dict(CFG, dmin=-60, optimization="sgm")
    rows, cols = 374, 448
    left, right = _cones_pair(rows, cols)
    mesh = make_mesh2d(n_data=1, n_row=2, n_col=2)
    tiled_fn = tiled_stereo_pipeline(mesh, sgm_margin=100, **cfg)

    sh = NamedSharding(mesh, P("data", "row", "col"))
    disp_t, vmask_t = tiled_fn(jax.device_put(left, sh), jax.device_put(right, sh))
    disp_u, vmask_u = _untiled(left, right, **cfg)
    _assert_interior_equal(disp_t, vmask_t, disp_u, vmask_u, np.s_[:, :, :])


@pytest.mark.functional
def test_2d_tiled_full_scene_sgm_cones_contract_at_default_margin():
    """At the reference's default 40 px margin the 2-D full-scene result
    carries only contract residuals: validity masks identical, and a
    vanishing fraction of disparities differ where the row-tile boundary
    interacts with the scene-edge NaN zones (79/167552 measured)."""
    cfg = dict(CFG, dmin=-60, optimization="sgm")
    rows, cols = 374, 448
    left, right = _cones_pair(rows, cols)
    mesh = make_mesh2d(n_data=1, n_row=2, n_col=2)
    tiled_fn = tiled_stereo_pipeline(mesh, **cfg)

    sh = NamedSharding(mesh, P("data", "row", "col"))
    disp_t, vmask_t = tiled_fn(jax.device_put(left, sh), jax.device_put(right, sh))
    disp_u, vmask_u = _untiled(left, right, **cfg)

    ch = halo_width(cfg["dmin"], cfg["dmax"], cfg["window_size"], True, 1)
    rh = row_halo_width(cfg["window_size"], True, 1)
    assert ch < cols // 2 and rh < rows // 2
    np.testing.assert_array_equal(np.asarray(vmask_t), vmask_u)
    dt = np.asarray(disp_t)
    diff = np.where(np.isnan(dt) & np.isnan(disp_u), 0.0, dt - disp_u)
    assert float((diff != 0).mean()) <= 1e-3
    # and bit-exact outside the scene-edge column bands where the wedge sits
    np.testing.assert_allclose(diff[:, :, ch : cols - ch], 0.0, atol=0.0)


def test_mesh_of_one_degenerate():
    """1-device mesh == untiled bit-exact away from the (zero-filled)
    scene-edge halos."""
    cfg = dict(CFG, optimization=None)
    rows, cols = 32, 96
    left, right = _pair(rows, cols, batch=1)
    mesh = make_mesh(n_data=1, n_tile=1, devices=jax.devices()[:1])
    tiled_fn = tiled_stereo_pipeline(mesh, **cfg)
    disp_t, _ = tiled_fn(left, right)
    disp_u, _ = _untiled(left, right, **cfg)
    halo = halo_width(cfg["dmin"], cfg["dmax"], cfg["window_size"], False, 1)
    dt = np.asarray(disp_t)[:, :, halo : cols - halo]
    du = disp_u[:, :, halo : cols - halo]
    both = np.where(np.isnan(dt) & np.isnan(du), 0.0, dt - du)
    np.testing.assert_allclose(both, 0.0, atol=0.0)
