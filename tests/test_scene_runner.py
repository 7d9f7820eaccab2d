"""SceneRunner: checkpointed tile-grid execution, resume, stitching."""

import os

import numpy as np

from pandora_tpu.fused import make_jitted_pipeline
from pandora_tpu.parallel import SceneRunner, halo_width

CFG = dict(
    dmin=-8,
    dmax=0,
    subpix=1,
    window_size=5,
    matching_cost="census",
    optimization=None,
    p1=8.0,
    p2=32.0,
    refinement="vfit",
    median_size=3,
)


def _scene(rows=64, cols=160, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.random((rows, cols + 8), np.float32) * 255
    left = base[:, 8:]
    right = 0.7 * base[:, :-8] + 0.3 * rng.random((rows, cols), np.float32) * 255
    return left.astype(np.float32), right.astype(np.float32)


def test_scene_runner_matches_untiled_and_resumes(tmp_path):
    rows, cols = 64, 160
    left, right = _scene(rows, cols)

    def read_block(r0, c0, nr, nc):
        return left[r0 : r0 + nr, c0 : c0 + nc], right[r0 : r0 + nr, c0 : c0 + nc]

    runner = SceneRunner(str(tmp_path), tile_shape=(32, 64), **CFG)
    stats = runner.run(read_block, rows, cols)
    n_tiles = sum(1 for _ in runner.grid(rows, cols))
    assert stats == {"computed": n_tiles, "skipped": 0, "failed": 0}

    disp, vmask = runner.stitch(rows, cols)
    fn = make_jitted_pipeline(**CFG)
    du, vu = map(np.asarray, fn(left, right))

    # edge tiles slide inward, so the whole scene matches bit-exact —
    # including the untiled border-invalid zones
    both = np.where(np.isnan(disp) & np.isnan(du), 0.0, disp - du)
    np.testing.assert_allclose(both, 0.0, atol=0.0)
    np.testing.assert_array_equal(vmask, vu)

    # resume: drop one checkpoint; only that tile is recomputed
    victim = runner._tile_path(1, 1)
    os.remove(victim)
    assert len(runner.pending(rows, cols)) == 1
    stats2 = runner.run(read_block, rows, cols)
    assert stats2 == {"computed": 1, "skipped": n_tiles - 1, "failed": 0}
    disp2, _ = runner.stitch(rows, cols)
    both2 = np.where(np.isnan(disp2) & np.isnan(disp), 0.0, disp2 - disp)
    np.testing.assert_allclose(both2, 0.0, atol=0.0)


def test_scene_smaller_than_block_matches_untiled(tmp_path):
    """A scene smaller than tile + 2*halo must NOT be zero-padded: padding
    would move the true scene border into the block interior and census
    would read fabricated pixels (ADVICE r1, medium)."""
    rows, cols = 24, 40  # well under tile_shape + halos
    left, right = _scene(rows, cols, seed=9)

    def read_block(r0, c0, nr, nc):
        return left[r0 : r0 + nr, c0 : c0 + nc], right[r0 : r0 + nr, c0 : c0 + nc]

    runner = SceneRunner(str(tmp_path), tile_shape=(32, 64), **CFG)
    runner.run(read_block, rows, cols)
    disp, vmask = runner.stitch(rows, cols)
    fn = make_jitted_pipeline(**CFG)
    du, vu = map(np.asarray, fn(left, right))
    both = np.where(np.isnan(disp) & np.isnan(du), 0.0, disp - du)
    np.testing.assert_allclose(both, 0.0, atol=0.0)
    np.testing.assert_array_equal(vmask, vu)


def test_checkpoint_meta_guards_config_change(tmp_path):
    """Resuming with a different cfg/tile_shape over existing tiles must
    refuse instead of silently stitching stale results (ADVICE r1, low)."""
    import pytest

    rows, cols = 64, 128
    left, right = _scene(rows, cols)

    def read_block(r0, c0, nr, nc):
        return left[r0 : r0 + nr, c0 : c0 + nc], right[r0 : r0 + nr, c0 : c0 + nc]

    runner = SceneRunner(str(tmp_path), tile_shape=(32, 64), **CFG)
    runner.run(read_block, rows, cols)
    # same config resumes fine
    SceneRunner(str(tmp_path), tile_shape=(32, 64), **CFG)
    # changed tile shape or cfg refuses while tiles exist
    with pytest.raises(ValueError, match="different cfg"):
        SceneRunner(str(tmp_path), tile_shape=(16, 64), **CFG)
    with pytest.raises(ValueError, match="different cfg"):
        SceneRunner(str(tmp_path), tile_shape=(32, 64), **{**CFG, "window_size": 7})
    # an empty workdir with a stale meta is reusable
    for name in os.listdir(tmp_path):
        if name.startswith("tile_"):
            os.remove(os.path.join(tmp_path, name))
    SceneRunner(str(tmp_path), tile_shape=(16, 64), **CFG)


def test_scene_runner_fault_isolation(tmp_path):
    rows, cols = 64, 128
    left, right = _scene(rows, cols)
    calls = {"n": 0}

    def flaky_read(r0, c0, nr, nc):
        calls["n"] += 1
        if calls["n"] == 2:  # second tile read blows up once
            raise OSError("transient read failure")
        return left[r0 : r0 + nr, c0 : c0 + nc], right[r0 : r0 + nr, c0 : c0 + nc]

    runner = SceneRunner(str(tmp_path), tile_shape=(32, 64), **CFG)
    stats = runner.run(flaky_read, rows, cols, max_failures=1)
    assert stats["failed"] == 1
    assert len(runner.pending(rows, cols)) == 1
    # resume completes the failed tile
    stats2 = runner.run(flaky_read, rows, cols)
    assert stats2["failed"] == 0 and stats2["computed"] == 1
    runner.stitch(rows, cols)  # no missing tiles
