"""Compiled-TPU hardware gates (@pytest.mark.tpu).

Run with::

    PANDORA_TPU_HW_TESTS=1 PYTHONPATH=/root/.axon_site:. \
        python -m pytest tests/test_tpu_hw.py -m tpu -q

Everything else in the suite runs the Pallas kernels in interpret mode on
virtual CPU devices, so a Mosaic lowering or uint8-layout regression would
ship with tests green; these tests gate the COMPILED path (reference
counterpart: functional_tests/test_basic.py:159).  ``bench.py`` emits the
same cones bad-1 line into every round's bench artifact.
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.tpu

_ON_TPU = False
try:
    _ON_TPU = jax.devices()[0].platform not in ("cpu", "gpu")
except Exception:  # pragma: no cover - no devices at all
    pass

requires_tpu = pytest.mark.skipif(
    not _ON_TPU or os.environ.get("PANDORA_TPU_HW_TESTS") != "1",
    reason="needs PANDORA_TPU_HW_TESTS=1 and a real TPU device",
)


@requires_tpu
def test_cones_bad1_compiled_fused(cones):
    """bad-1 <= 0.20 on cones through the compiled fused fast path."""
    import jax.numpy as jnp

    from conftest import error_rate
    from pandora_tpu.fused import make_jitted_pipeline

    fn = make_jitted_pipeline(
        dmin=-60, dmax=0, subpix=1, window_size=5,
        matching_cost="census", optimization="sgm", p1=8.0, p2=32.0,
        refinement="vfit", median_size=3,
    )
    disp, vmask = fn(jnp.asarray(cones["left"]), jnp.asarray(cones["right"]))
    bad1 = error_rate(np.asarray(disp), cones["gt_left"])
    assert bad1 <= 0.20, f"compiled fused path bad-1 {bad1:.4f} > 0.20"
    # the validity mask carries real criteria bits (border ring = bit 0)
    vm = np.asarray(vmask)
    import pandora_tpu.constants as cst

    assert np.all(vm[0, :] == cst.PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER)


@requires_tpu
def test_pallas_compiled_equals_lax_scan():
    """Compiled Pallas SGM == the lax.scan formulation, bit-exact, on a
    small random volume (integer costs/penalties keep f32 math exact)."""
    import jax.numpy as jnp

    from pandora_tpu.ops.sgm import sgm_aggregate
    from pandora_tpu.ops.sgm_pallas import sgm_aggregate_pallas

    rng = np.random.default_rng(3)
    cost = rng.integers(0, 26, (40, 52, 16)).astype(np.float32)
    p1p = jnp.full((8, 1, 1), 8.0)
    p2p = jnp.full((8, 1, 1), 32.0)
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    got, _ = sgm_aggregate_pallas(jnp.asarray(cost), 8.0, 32.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@requires_tpu
def test_census_transform_words():
    """Compiled census signatures == the XLA formulation for every window.

    Guards the Mosaic miscompilation found on TPU v5e: bit-pack chains
    beyond ~26 slice-compare terms compile wrong, so windows >= 7 (two or
    more signature words) must route to the XLA transform
    (census._use_pallas_census gate).  If this test starts passing with
    the gate removed, the toolchain fixed it."""
    import jax.numpy as jnp

    from pandora_tpu.ops.census import census_transform, census_cost_volume

    rng = np.random.default_rng(0)
    im = rng.random((40, 60)).astype(np.float32) * 255
    for win in (3, 5, 7, 9, 11, 13):
        # census_cost_volume picks the device transform internally; compare
        # the full volume against the always-correct XLA signature route
        left = jnp.asarray(im)
        right = jnp.asarray(np.roll(im, 2, axis=1))
        got = census_cost_volume(left, right, -4, 2, 1, win)
        lsig = census_transform(left, win, win)
        rsig = census_transform(right, win, win)
        r, c, k = 20, 30, 3  # interior, in-range probe
        d = -4 + k
        want = int(
            jnp.sum(jax.lax.population_count(lsig[r, c] ^ rsig[r, c + d]))
        )
        assert float(got[r, c, k]) == want, f"win={win}"


@requires_tpu
def test_census_cv_kernel_multiword_oracle():
    """Compiled one-pass CV kernel == brute-force oracle for a 2-word
    window (win=7) — the volume kernel is safe from the bit-pack chain
    bug (per-disparity writes bound every expression chain)."""
    import jax.numpy as jnp

    from emulators import census_cv
    from pandora_tpu.ops.census import census_cost_volume_scan_layouts

    rng = np.random.default_rng(1)
    h, w, dmin, dmax, subpix, win = 30, 40, -5, 5, 1, 7
    left = rng.random((h, w)).astype(np.float32) * 255
    right = rng.random((h, w)).astype(np.float32) * 255
    oracle = census_cv(left, right, dmin, dmax, subpix, win)
    rdw, cdh, _ = census_cost_volume_scan_layouts(
        jnp.asarray(left), jnp.asarray(right), dmin, dmax, subpix, win, jnp.uint8
    )
    n_disp = (dmax - dmin) * subpix + 1
    got = np.moveaxis(np.asarray(rdw)[:h, :n_disp, :w], 1, -1).astype(np.float32)
    want = np.where(np.isnan(oracle), 255.0, oracle)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(cdh), np.transpose(np.asarray(rdw), (2, 1, 0))
    )


@requires_tpu
def test_uint8_scan_layouts_compiled_equal_f32(cones):
    """Compiled uint8 scan-layout fast path == compiled f32 epilogue path
    on the cones pair (disparities and validity masks bit-equal)."""
    import jax.numpy as jnp

    from pandora_tpu.fused import make_jitted_pipeline

    kw = dict(
        dmin=-60, dmax=0, subpix=1, window_size=5, matching_cost="census",
        optimization="sgm", p1=8.0, p2=32.0, refinement="vfit", median_size=0,
    )
    fast = make_jitted_pipeline(sgm_fused_epilogue=True, **kw)
    slow = make_jitted_pipeline(sgm_fused_epilogue=False, **kw)
    l, r = jnp.asarray(cones["left"]), jnp.asarray(cones["right"])
    d1, v1 = fast(l, r)
    d2, v2 = slow(l, r)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(
        np.nan_to_num(np.asarray(d1), nan=-1e9), np.nan_to_num(np.asarray(d2), nan=-1e9)
    )


@requires_tpu
def test_exchange_hooks_compile_and_match_lax():
    """The boundary-state-exchange kernel hooks (init carry, final carry,
    edge histories, lane injection) COMPILE on real TPU and match the lax
    scans bit-exactly (interpret-mode parity is pinned by
    test_sgm_pallas.py; this gates the Mosaic lowering)."""
    import jax.numpy as jnp

    from pandora_tpu.ops import sgm as sgm_ops
    from pandora_tpu.ops.sgm_pallas import _run_pass

    rng = np.random.default_rng(3)
    h, w, d = 16, 128, 16
    cost = (rng.integers(0, 25, (h, w, d))).astype(np.float32)
    inj = (rng.integers(0, 60, (h, 2, 6, d))).astype(np.float32)
    pen = (jnp.full((6, 1, 1), 8.0), jnp.full((6, 1, 1), 32.0))
    inj_lax = np.concatenate([inj[:, :, :3], inj[::-1, :, 3:]], axis=2)
    ys = sgm_ops._row_scan(
        jnp.stack([jnp.asarray(cost), jnp.asarray(cost)[::-1]]), pen, None,
        None, d, False, edge_cols=(0, w - 1), inj_lanes=(0, w - 1),
        inj=jnp.asarray(inj_lax),
    )
    pn, pf, _, extras = _run_pass(
        jnp.asarray(np.moveaxis(cost, -1, 1)), (0, 1, -1, 0, 1, -1),
        [(0, False), (1, False), (2, False), (3, True), (4, True), (5, True)],
        8.0, 32.0, None, None, None, False, jnp.float32, False,
        edge_cols=(0, w - 1), inj_lanes=(0, w - 1), inj=jnp.asarray(inj),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(pn), 1, -1), np.asarray(ys["norm"])
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(pf), 1, -1), np.asarray(ys["flip"][::-1])
    )
    lax_edges = np.asarray(
        jnp.concatenate([ys["edges"][:, :3], ys["edges"][::-1, 3:]], axis=1)
    )
    np.testing.assert_array_equal(np.asarray(extras["edges"]), lax_edges)

    # init-carry seeding + final-carry emission (col pass) compile too
    h2, w2 = 16, 32
    cost2 = (rng.integers(0, 25, (h2, w2, d))).astype(np.float32)
    init = (rng.integers(0, 50, (2, h2, d))).astype(np.float32)
    pen2 = (jnp.full((2, 1, 1), 8.0), jnp.full((2, 1, 1), 32.0))
    ys2 = sgm_ops._col_scan(
        jnp.stack([jnp.asarray(cost2), jnp.asarray(cost2)[:, ::-1]]), pen2,
        None, None, d, False, init_l=jnp.asarray(init),
    )
    big = 1.0e30
    cdh = np.full((w2, d, 128), big, np.float32)
    cdh[:, :, :h2] = np.moveaxis(cost2, -1, 1).transpose(2, 1, 0)
    init_p = np.full((2, d, 128), big, np.float32)
    init_p[:, :, :h2] = np.moveaxis(init, -1, 1)
    pn2, pf2, _, ex2 = _run_pass(
        jnp.asarray(cdh), (0, 0), [(6, False), (7, True)], 8.0, 32.0,
        None, None, None, False, jnp.float32, False,
        init_carry=jnp.asarray(init_p), want_final=True,
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(pn2)[:, :, :h2], 1, -1), np.asarray(ys2["norm"])
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(ex2["final"])[0, :, :h2], 0, -1),
        np.asarray(ys2["norm"][-1]),
    )
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(ex2["final"])[1, :, :h2], 0, -1),
        np.asarray(ys2["flip"][-1]),
    )
