"""Pallas SGM kernel (interpret mode) vs the lax.scan implementation.

One equality test per plugin_libsgm.rst:95-330 configuration row: constant
penalties, per-pixel P2 (negativeGradient / inverseGradient), per-(pixel,
disp) P1/P2 (mc_cnn_fast_penalty), 3SGM segment restarts, min_cost_paths.
"""

import numpy as np
import jax.numpy as jnp

from pandora_tpu.ops.sgm import (
    mc_cnn_penalty_planes,
    penalty_planes,
    sgm_aggregate,
)
from pandora_tpu.ops.sgm_pallas import sgm_aggregate_pallas

RNG = np.random.default_rng(11)


def _agg_pallas(cost, *args, **kw):
    total, nb = sgm_aggregate_pallas(jnp.asarray(cost), *args, interpret=True, **kw)
    return total, nb


def test_pallas_matches_lax_constant():
    cost = (RNG.random((9, 11, 6)) * 10).astype(np.float32)
    p1p = jnp.full((8, 1, 1), 1.5)
    p2p = jnp.full((8, 1, 1), 4.0)
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    got, _ = _agg_pallas(cost, 1.5, 4.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


def test_pallas_matches_lax_perpixel_p2():
    cost = (RNG.random((7, 9, 5)) * 10).astype(np.float32)
    img = (RNG.random((7, 9)) * 50).astype(np.float32)
    p1p, p2p, _ = penalty_planes(
        jnp.asarray(img), "inverseGradient", 2.0, 8.0, 10.0, 1.0, 3.0
    )
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    got, _ = _agg_pallas(cost, 2.0, 0.0, p2_planes=p2p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


def test_pallas_matches_lax_unaligned_multiblock():
    """Shapes that straddle several 8-blocks with ragged padding."""
    cost = (RNG.random((19, 27, 7)) * 10).astype(np.float32)
    p1p = jnp.full((8, 1, 1), 2.0)
    p2p = jnp.full((8, 1, 1), 9.0)
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    got, _ = _agg_pallas(cost, 2.0, 9.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)

    img = (RNG.random((19, 27)) * 50).astype(np.float32)
    p1g, p2g, _ = penalty_planes(
        jnp.asarray(img), "negativeGradient", 2.0, 9.0, 0.1, 1.0, 6.0
    )
    want2, _ = sgm_aggregate(jnp.asarray(cost), p1g, p2g)
    got2, _ = _agg_pallas(cost, 2.0, 0.0, p2_planes=p2g)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-5, atol=1e-4)


def test_pallas_matches_lax_mc_cnn_perdisp_penalties():
    """mc_cnn_fast_penalty: per-(direction, pixel, disparity) P1 AND P2."""
    h, w, d = 9, 13, 5
    cost = (RNG.random((h, w, d)) * 10).astype(np.float32)
    left = (RNG.random((h, w)) * 50).astype(np.float32)
    right = (RNG.random((h, w)) * 50).astype(np.float32)
    p1p, p2p, _ = mc_cnn_penalty_planes(
        jnp.asarray(left), jnp.asarray(right), -(d - 1), 0, 2.3, 55.9, 4.0, 2.0, 5.0, 1.5
    )
    assert p1p.shape == (8, h, w, d)
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p)
    got, _ = _agg_pallas(cost, 0.0, 0.0, p1_planes=p1p, p2_planes=p2p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


def test_pallas_matches_lax_3sgm_segments():
    """3SGM piecewise optimization: paths restart at segment boundaries."""
    h, w, d = 11, 17, 6
    cost = (RNG.random((h, w, d)) * 10).astype(np.float32)
    seg = np.zeros((h, w), np.int32)
    seg[:, 8:] = 1
    seg[5:, :] += 2  # four quadrants
    p1p = jnp.full((8, 1, 1), 1.5)
    p2p = jnp.full((8, 1, 1), 4.0)
    want, _ = sgm_aggregate(jnp.asarray(cost), p1p, p2p, segments=jnp.asarray(seg))
    got, _ = _agg_pallas(cost, 1.5, 4.0, segments=jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


def test_pallas_matches_lax_min_cost_paths():
    """min_cost_paths: per-direction argmin tracking -> nb_of_directions."""
    h, w, d = 10, 14, 5
    cost = (RNG.random((h, w, d)) * 10).astype(np.float32)
    p1p = jnp.full((8, 1, 1), 1.0)
    p2p = jnp.full((8, 1, 1), 5.0)
    want, want_nb = sgm_aggregate(
        jnp.asarray(cost), p1p, p2p, min_cost_paths=True
    )
    got, got_nb = _agg_pallas(cost, 1.0, 5.0, min_cost_paths=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_nb), np.asarray(want_nb))


def test_pallas_matches_lax_segments_and_perdisp_combined():
    """The 3SGM x mc_cnn penalty cross product in one go."""
    h, w, d = 8, 12, 4
    cost = (RNG.random((h, w, d)) * 10).astype(np.float32)
    left = (RNG.random((h, w)) * 50).astype(np.float32)
    right = (RNG.random((h, w)) * 50).astype(np.float32)
    p1p, p2p, _ = mc_cnn_penalty_planes(
        jnp.asarray(left), jnp.asarray(right), -(d - 1), 0, 2.3, 55.9, 4.0, 2.0, 5.0, 1.5
    )
    seg = (RNG.integers(0, 3, (h, w))).astype(np.int32)
    want, want_nb = sgm_aggregate(
        jnp.asarray(cost), p1p, p2p, segments=jnp.asarray(seg), min_cost_paths=True
    )
    got, got_nb = _agg_pallas(
        cost, 0.0, 0.0, p1_planes=p1p, p2_planes=p2p,
        segments=jnp.asarray(seg), min_cost_paths=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_nb), np.asarray(want_nb))


def test_pallas_supported_covers_all_config_rows():
    """Every plugin_libsgm.rst:95-330 configuration shape is kernel-eligible."""
    from pandora_tpu.ops.sgm_pallas import pallas_supported

    h, w, d = 375, 450, 61
    pix = jnp.zeros((8, h, w))
    vol = jnp.zeros((8, h, w, d))
    seg = jnp.zeros((h, w), jnp.int32)
    assert pallas_supported((h, w, d), None, None, None, False)  # constant
    assert pallas_supported((h, w, d), None, pix, None, False)  # negative/inverseGradient
    assert pallas_supported((h, w, d), vol, vol, None, False)  # mc_cnn_fast_penalty
    assert pallas_supported((h, w, d), None, None, seg, False)  # 3sgm
    assert pallas_supported((h, w, d), None, None, None, True)  # min_cost_paths
    assert pallas_supported((h, w, d), vol, vol, seg, True)  # everything at once


def test_combine_wta_matches_separate_epilogue():
    """Fused Σ-partials + WTA + triplet kernel == materializing epilogue
    (sum → NaN restore → wta → one-hot triplet extraction)."""
    from pandora_tpu.ops.sgm_pallas import combine_wta_pallas, sgm_partials_pallas
    from pandora_tpu.ops.wta import wta
    from pandora_tpu.ops.refinement import refine, refine_from_triplet

    h, w, d = 13, 21, 6
    cost = (RNG.random((h, w, d)) * 10).astype(np.float32)
    nan_mask = RNG.random((h, w, d)) < 0.15
    nan_mask[3, 4, :] = True  # one all-invalid pixel
    cv = np.where(nan_mask, np.nan, cost).astype(np.float32)

    super_cost = 1.0e7
    work = jnp.where(jnp.isnan(jnp.asarray(cv)), super_cost, jnp.asarray(cv))
    parts = sgm_partials_pallas(work, 1.5, 4.0, interpret=True)
    idx, c0, c1, c2 = combine_wta_pallas(parts, 5.0e6, interpret=True)

    rows = jnp.moveaxis(parts.row_n + parts.row_f, 1, -1)
    cols = (parts.col_n + parts.col_f).transpose(2, 0, 1)
    total = (rows + cols)[:h, :w, :d]
    total = jnp.where(jnp.isnan(jnp.asarray(cv)), jnp.nan, total)
    dv = jnp.arange(-(d - 1), 1, dtype=jnp.float32)
    disp_ref, vmask_ref, _ = wta(total, dv, "min", jnp.nan, None)
    ref_d, ref_m, ref_c = refine(
        total, disp_ref, vmask_ref, float(-(d - 1)), 0.0, 1, "min", "vfit"
    )

    disp_f = jnp.float32(-(d - 1)) + idx.astype(jnp.float32)
    invalid_mc = jnp.isnan(c1)
    disp_f = jnp.where(invalid_mc, jnp.nan, disp_f)
    import pandora_tpu.constants as cst

    vmask_f = jnp.where(invalid_mc, jnp.uint16(cst.PANDORA_MSK_PIXEL_INVALID), jnp.uint16(0))
    np.testing.assert_array_equal(np.asarray(vmask_f), np.asarray(vmask_ref))
    got_d, got_m, got_c = refine_from_triplet(
        c0, c1, c2, disp_f, vmask_f, float(-(d - 1)), 0.0, 1, "min", "vfit"
    )

    for got, want in ((got_d, ref_d), (got_m, ref_m), (got_c, ref_c)):
        g, t = np.asarray(got), np.asarray(want)
        both_nan = np.isnan(g) & np.isnan(t)
        # tolerance: the finish kernel pre-sums the two col partials before
        # adding the row triples — a different f32 association order than
        # the materializing epilogue (last-ulp differences in the triplet)
        np.testing.assert_allclose(
            np.where(both_nan, 0.0, g), np.where(both_nan, 0.0, t), rtol=2e-5, atol=5e-5
        )


def test_production_sentinel_separates_ssd_scale_costs():
    """SSD on 8-bit imagery yields data costs up to 255²·w² ≈ 1.6e6; the
    production sentinel/threshold must still classify valid pixels as
    valid (regression: the old 1e7/5e6 pair misflagged them)."""
    from pandora_tpu.fused import _SUPER, _THRESH
    from pandora_tpu.ops.sgm_pallas import combine_wta_pallas, sgm_partials_pallas

    h, w, d = 9, 17, 5
    # valid costs at SSD-cmax scale so 8-path totals exceed the OLD 5e6
    cost = (RNG.random((h, w, d)) * 1.63e6).astype(np.float32)
    nan_mask = RNG.random((h, w, d)) < 0.1
    nan_mask[2, 3, :] = True  # one genuinely all-invalid pixel
    cv = np.where(nan_mask, np.nan, cost).astype(np.float32)

    work = jnp.where(jnp.isnan(jnp.asarray(cv)), _SUPER, jnp.asarray(cv))
    parts = sgm_partials_pallas(work, 8.0, 32.0, interpret=True)
    idx, c0, c1, c2 = combine_wta_pallas(parts, _THRESH, interpret=True)

    got_invalid = np.isnan(np.asarray(c1))
    want_invalid = nan_mask.all(axis=2)
    np.testing.assert_array_equal(got_invalid, want_invalid)


def test_bf16_partials_bit_exact_for_integer_costs():
    """bf16 partial volumes are bit-exact when costs and penalties are
    integers with 3*(cmax+P2) <= 256 (the census-5x5 + P2=32 regime)."""
    from pandora_tpu.ops.sgm_pallas import sgm_partials_pallas

    h, w, d = 11, 13, 5
    cost = RNG.integers(0, 26, (h, w, d)).astype(np.float32)  # census-like
    f32 = sgm_partials_pallas(jnp.asarray(cost), 8.0, 32.0, interpret=True)
    b16 = sgm_partials_pallas(
        jnp.asarray(cost), 8.0, 32.0, interpret=True, out_dtype=jnp.bfloat16
    )
    # compare the real area only: padding cells hold _BIG accumulations,
    # which bf16 legitimately rounds (they are masked by the threshold)
    for a, b in (
        (f32.row_n[:h, :d, :w], b16.row_n[:h, :d, :w]),
        (f32.row_f[:h, :d, :w], b16.row_f[:h, :d, :w]),
        (f32.col_n[:w, :d, :h], b16.col_n[:w, :d, :h]),
        (f32.col_f[:w, :d, :h], b16.col_f[:w, :d, :h]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b, np.float32))


def test_census_scan_layouts_match_hwd_volume():
    """census_cost_volume_scan_layouts == census_cost_volume re-laid-out,
    with the uint8 sentinel where the reference never writes a cost."""
    from pandora_tpu.ops.census import (
        U8_INVALID,
        census_cost_volume,
        census_cost_volume_scan_layouts,
    )

    rng = np.random.default_rng(3)
    h, w = 21, 33
    left = jnp.asarray(rng.random((h, w), np.float32) * 255)
    right = jnp.asarray(rng.random((h, w), np.float32) * 255)
    for subpix in (1, 2):
        d0, d1 = -7, 0
        nd = (d1 - d0) * subpix + 1
        cv = np.asarray(census_cost_volume(left, right, d0, d1, subpix, 5))
        rdw, cdh, hwd = census_cost_volume_scan_layouts(
            left, right, d0, d1, subpix, 5, jnp.uint8
        )
        assert hwd == (h, w, nd)
        got_rdw = np.asarray(rdw)[:h, :nd, :w]
        got_cdh = np.asarray(cdh)[:w, :nd, :h]
        want = np.where(np.isnan(cv), U8_INVALID, cv).astype(np.uint8)
        np.testing.assert_array_equal(got_rdw, np.moveaxis(want, 2, 1))
        np.testing.assert_array_equal(got_cdh, want.transpose(1, 2, 0))
        # padding holds the sentinel
        assert (np.asarray(rdw)[h:] == U8_INVALID).all()
        assert (np.asarray(rdw)[:, nd:] == U8_INVALID).all()
        assert (np.asarray(cdh)[w:] == U8_INVALID).all()


def test_u8_layout_path_matches_f32_path():
    """uint8 scan-layout SGM+WTA == the f32 super-cost path (interpret)."""
    from pandora_tpu.fused import _SUPER, _THRESH, _U8_THRESH
    from pandora_tpu.ops.census import census_cost_volume, census_cost_volume_scan_layouts
    from pandora_tpu.ops.sgm_pallas import (
        combine_wta_pallas,
        sgm_partials_from_layouts,
        sgm_partials_pallas,
    )

    rng = np.random.default_rng(5)
    h, w = 19, 27
    left = jnp.asarray(rng.random((h, w), np.float32) * 255)
    right = jnp.asarray(rng.random((h, w), np.float32) * 255)
    d0, d1 = -6, 0

    # f32 reference path
    cv = census_cost_volume(left, right, d0, d1, 1, 5)
    work = jnp.where(jnp.isnan(cv), _SUPER, cv)
    parts_f = sgm_partials_pallas(work, 8.0, 32.0, interpret=True)
    ref = combine_wta_pallas(parts_f, _THRESH, interpret=True)

    # u8 layouts path
    rdw, cdh, hwd = census_cost_volume_scan_layouts(left, right, d0, d1, 1, 5, jnp.uint8)
    parts_u = sgm_partials_from_layouts(rdw, cdh, hwd, 8.0, 32.0, interpret=True)
    got = combine_wta_pallas(parts_u, _U8_THRESH, interpret=True)

    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    for g, r in zip(got[1:], ref[1:]):
        g, r = np.asarray(g), np.asarray(r)
        both_nan = np.isnan(g) & np.isnan(r)
        np.testing.assert_allclose(
            np.where(both_nan, 0, g), np.where(both_nan, 0, r), atol=1e-4
        )


def test_int16_compute_matches_f32():
    """The int16 scan recurrence (compute_dtype=jnp.int16) is bit-exact vs
    the f32 recurrence on uint8 volumes with integer penalties.

    On TPU v5e this path CANNOT compile (Mosaic has no packed-i16
    min/compare — negative result recorded in BASELINE.md and probed by
    scripts/sweep_kernels.py::sweep_i16); this pins its semantics so a
    future toolchain that lowers packed 16-bit min can enable it as a
    drop-in ~2x scan speedup."""
    import numpy as np

    from pandora_tpu.ops.census import census_cost_volume_scan_layouts
    from pandora_tpu.ops.sgm_pallas import sgm_partials_from_layouts

    rng = np.random.default_rng(11)
    h, w, d = 48, 144, 24
    left = jnp.asarray(rng.random((h, w), np.float32) * 255)
    right = jnp.asarray(rng.random((h, w), np.float32) * 255)
    rdw, cdh, hwd = census_cost_volume_scan_layouts(
        left, right, -(d - 1), 0, 1, 5, jnp.uint8, interpret=True
    )
    for out_dtype in (jnp.uint8, jnp.int16):
        p32 = sgm_partials_from_layouts(
            rdw, cdh, hwd, 8.0, 32.0, out_dtype=out_dtype, interpret=True
        )
        p16 = sgm_partials_from_layouts(
            rdw, cdh, hwd, 8.0, 32.0, out_dtype=out_dtype, interpret=True,
            compute_dtype=jnp.int16,
        )
        for name in ("row_n", "row_f", "col_n", "col_f"):
            np.testing.assert_array_equal(
                np.asarray(getattr(p16, name)), np.asarray(getattr(p32, name)),
                err_msg=f"{name} ({out_dtype})",
            )


def test_int16_compute_rejects_float_penalties():
    import numpy as np
    import pytest

    from pandora_tpu.ops.census import census_cost_volume_scan_layouts
    from pandora_tpu.ops.sgm_pallas import sgm_partials_from_layouts

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.random((16, 144), np.float32) * 255)
    right = jnp.asarray(rng.random((16, 144), np.float32) * 255)
    rdw, cdh, hwd = census_cost_volume_scan_layouts(
        left, right, -7, 0, 1, 5, jnp.uint8, interpret=True
    )
    with pytest.raises(ValueError, match="integer P1/P2"):
        sgm_partials_from_layouts(
            rdw, cdh, hwd, 1.5, 32.0, out_dtype=jnp.uint8, interpret=True,
            compute_dtype=jnp.int16,
        )


def _pad_big(a, shape):
    import numpy as np

    from pandora_tpu.ops.sgm_pallas import _BIG

    out = np.full(shape, _BIG, np.float32)
    out[tuple(slice(0, s) for s in a.shape)] = a
    return jnp.asarray(out)


def test_exchange_hooks_row_pass_matches_lax():
    """Pallas _run_pass edge-history emission + lane injection == the lax
    _row_scan hooks (the tiled boundary-state exchange backend parity)."""
    import numpy as np

    from pandora_tpu.ops import sgm as sgm_ops
    from pandora_tpu.ops.sgm_pallas import _run_pass

    rng = np.random.default_rng(0)
    h, w, d = 24, 128, 16
    cost = (rng.integers(0, 25, (h, w, d))).astype(np.float32)
    p1, p2 = 8.0, 32.0
    edge_cols = (0, 40, w - 41, w - 1)
    inj_lanes = (0, w - 1)
    inj = (rng.integers(0, 60, (h, len(inj_lanes), 6, d))).astype(np.float32)

    # ---- lax reference ----------------------------------------------------
    pen = (jnp.full((6, 1, 1), p1), jnp.full((6, 1, 1), p2))
    inj_lax = np.concatenate([inj[:, :, :3], inj[::-1, :, 3:]], axis=2)
    ys = sgm_ops._row_scan(
        jnp.stack([jnp.asarray(cost), jnp.asarray(cost)[::-1]]), pen, None,
        None, d, False, edge_cols=edge_cols, inj_lanes=inj_lanes,
        inj=jnp.asarray(inj_lax),
    )
    lax_norm = np.asarray(ys["norm"])  # (H, W, D)
    lax_flip = np.asarray(ys["flip"][::-1])
    lax_edges = np.asarray(
        jnp.concatenate([ys["edges"][:, :3], ys["edges"][::-1, 3:]], axis=1)
    )  # (H, 6, k, D) physical rows

    # ---- pallas -----------------------------------------------------------
    cost_rdw = _pad_big(np.moveaxis(cost, -1, 1), (h, d, w))  # exact sizes
    pn, pf, _, extras = _run_pass(
        cost_rdw, (0, 1, -1, 0, 1, -1),
        [(0, False), (1, False), (2, False), (3, True), (4, True), (5, True)],
        p1, p2, None, None, None, False, jnp.float32, True,
        edge_cols=edge_cols, inj_lanes=inj_lanes,
        inj=jnp.asarray(np.ascontiguousarray(inj)),
    )
    np.testing.assert_array_equal(np.moveaxis(np.asarray(pn), 1, -1), lax_norm)
    # out_f is stored at physical line positions (f-spec + [b-1-j])
    np.testing.assert_array_equal(np.moveaxis(np.asarray(pf), 1, -1), lax_flip)
    np.testing.assert_array_equal(np.asarray(extras["edges"]), lax_edges)


def test_exchange_hooks_col_pass_init_final_match_lax():
    """Pallas init-carry seeding and final-carry emission == the lax
    _col_scan equivalents."""
    import numpy as np

    from pandora_tpu.ops import sgm as sgm_ops
    from pandora_tpu.ops.sgm_pallas import _run_pass

    rng = np.random.default_rng(1)
    h, w, d = 16, 32, 16  # W is the line axis of the col pass (mult of 8)
    cost = (rng.integers(0, 25, (h, w, d))).astype(np.float32)
    p1, p2 = 8.0, 32.0
    init = (rng.integers(0, 50, (2, h, d))).astype(np.float32)

    pen = (jnp.full((2, 1, 1), p1), jnp.full((2, 1, 1), p2))
    ys = sgm_ops._col_scan(
        jnp.stack([jnp.asarray(cost), jnp.asarray(cost)[:, ::-1]]), pen, None,
        None, d, False, init_l=jnp.asarray(init),
    )
    lax_norm = np.asarray(ys["norm"])  # (W, H, D) scan order
    lax_flip = np.asarray(ys["flip"])

    # pallas: (W, D, H) lines over columns, lanes = rows (pad H -> 128)
    h8 = 128
    cost_cdh = _pad_big(np.moveaxis(cost, -1, 1).transpose(2, 1, 0), (w, d, h8))
    init_p = _pad_big(np.moveaxis(init, -1, 1), (2, d, h8))
    pn, pf, _, extras = _run_pass(
        cost_cdh, (0, 0), [(6, False), (7, True)], p1, p2,
        None, None, None, False, jnp.float32, True,
        init_carry=init_p, want_final=True,
    )
    got_norm = np.moveaxis(np.asarray(pn)[:, :, :h], 1, -1)  # (W, H, D)
    got_flip = np.moveaxis(np.asarray(pf)[:, :, :h], 1, -1)[::-1]
    np.testing.assert_array_equal(got_norm, lax_norm)
    np.testing.assert_array_equal(got_flip, lax_flip)
    final = np.asarray(extras["final"])[:, :, :h]  # (2, D, H)
    np.testing.assert_array_equal(
        np.moveaxis(final[0], 0, -1), lax_norm[-1]
    )
    np.testing.assert_array_equal(
        np.moveaxis(final[1], 0, -1), lax_flip[-1]
    )


def test_exchange_hooks_scene_edge_inf_restart():
    """Non-finite boundary state (the mesh-edge inf fill of
    parallel/sgm_exchange.py) must reproduce the lax scans' clean path
    restart — no NaN leakage (round-5 review finding)."""
    import numpy as np

    from pandora_tpu.ops import sgm as sgm_ops
    from pandora_tpu.ops.sgm_pallas import _run_pass

    rng = np.random.default_rng(7)
    h, w, d = 16, 128, 16
    cost = (rng.integers(0, 25, (h, w, d))).astype(np.float32)
    inf_inj = np.full((h, 2, 6, d), np.inf, np.float32)
    pen = (jnp.full((6, 1, 1), 8.0), jnp.full((6, 1, 1), 32.0))
    ys = sgm_ops._row_scan(
        jnp.stack([jnp.asarray(cost), jnp.asarray(cost)[::-1]]), pen, None,
        None, d, False, inj_lanes=(0, w - 1), inj=jnp.asarray(inf_inj),
    )
    pn, pf, _, _ = _run_pass(
        jnp.asarray(np.moveaxis(cost, -1, 1)), (0, 1, -1, 0, 1, -1),
        [(0, False), (1, False), (2, False), (3, True), (4, True), (5, True)],
        8.0, 32.0, None, None, None, False, jnp.float32, True,
        inj_lanes=(0, w - 1), inj=jnp.asarray(inf_inj),
    )
    gn = np.moveaxis(np.asarray(pn), 1, -1)
    assert np.isfinite(gn).all(), "inf injection leaked NaN into partials"
    np.testing.assert_array_equal(gn, np.asarray(ys["norm"]))
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(pf), 1, -1), np.asarray(ys["flip"][::-1])
    )

    # inf INITIAL carry on the col pass == lax restart too
    cost2 = (rng.integers(0, 25, (16, 16, d))).astype(np.float32)
    pen2 = (jnp.full((2, 1, 1), 8.0), jnp.full((2, 1, 1), 32.0))
    ys2 = sgm_ops._col_scan(
        jnp.stack([jnp.asarray(cost2), jnp.asarray(cost2)[:, ::-1]]), pen2,
        None, None, d, False,
        init_l=jnp.full((2, 16, d), jnp.inf),
    )
    cdh = _pad_big(np.moveaxis(cost2, -1, 1).transpose(2, 1, 0), (16, d, 128))
    pn2, pf2, _, _ = _run_pass(
        cdh, (0, 0), [(6, False), (7, True)], 8.0, 32.0,
        None, None, None, False, jnp.float32, True,
        init_carry=jnp.full((2, d, 128), jnp.inf),
    )
    got = np.moveaxis(np.asarray(pn2)[:, :, :16], 1, -1)
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, np.asarray(ys2["norm"]))


def test_exchange_hooks_u8_int16_path_usable():
    """The hooks must not reject the uint8-volume compute paths the
    exchange orchestration would ride on TPU (edges stored as f32
    regardless of the compute dtype)."""
    import numpy as np

    from pandora_tpu.ops.census import census_cost_volume_scan_layouts
    from pandora_tpu.ops.sgm_pallas import _run_pass

    rng = np.random.default_rng(2)
    h, w, d = 16, 128, 16
    left = jnp.asarray(rng.random((h, w), np.float32) * 255)
    right = jnp.asarray(rng.random((h, w), np.float32) * 255)
    rdw, _, _ = census_cost_volume_scan_layouts(
        left, right, -(d - 1), 0, 1, 5, jnp.uint8, interpret=True
    )
    for cdt in (jnp.float32, jnp.int16):
        pn, _, _, extras = _run_pass(
            rdw[:h, :, :w], (0, 1, -1, 0, 1, -1),
            [(0, False), (1, False), (2, False), (3, True), (4, True), (5, True)],
            8.0, 32.0, None, None, None, False, jnp.uint8, True,
            absorb=255.0, compute_dtype=cdt, edge_cols=(0, w - 1),
        )
        assert extras["edges"].dtype == jnp.float32
        assert pn.dtype == jnp.uint8
