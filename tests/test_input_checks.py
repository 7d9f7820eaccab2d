"""Input-validation parity: header-level image/disparity coherence, band
names, header-only metadata, and the ROI windowed entry point (reference
check_configuration.py:170-297, tests/test_check_configuration.py, and
img_tools.get_window/get_metadata, img_tools.py:61-98,440-476)."""

import numpy as np
import pytest
from PIL import Image as PILImage

import pandora_tpu
from pandora_tpu.config import (
    check_band_names,
    check_conf,
    check_disparities_from_input,
    check_disparity_ranges_are_inside_image,
    check_images,
    check_roi_section,
)
from pandora_tpu.io.raster import get_window, read_raster, write_geotiff
from pandora_tpu.utils.schema import SchemaError

RNG = np.random.default_rng(3)


def _png(path, h, w):
    PILImage.fromarray((RNG.random((h, w)) * 255).astype(np.uint8)).save(path)
    return str(path)


PIPE = {
    "matching_cost": {"matching_cost_method": "census", "window_size": 5},
    "disparity": {"disparity_method": "wta"},
}


@pytest.fixture
def pair(tmp_path):
    return {
        "left": _png(tmp_path / "l.png", 20, 30),
        "right": _png(tmp_path / "r.png", 20, 30),
        "dir": tmp_path,
    }


def _cfg(pair, extra=None):
    inp = {
        "left": {"img": pair["left"], "disp": [-5, 0]},
        "right": {"img": pair["right"]},
    }
    for (side, key), val in (extra or {}).items():
        inp[side][key] = val
    return {"input": inp, "pipeline": dict(PIPE)}


# ---------------- check_images -------------------------------------------


def test_check_images_size_mismatch(pair, tmp_path):
    bad = _png(tmp_path / "bad.png", 20, 31)
    cfg = _cfg(pair)
    cfg["input"]["right"]["img"] = bad
    with pytest.raises(AttributeError, match="same size"):
        check_conf(cfg)


def test_check_images_mask_mismatch(pair, tmp_path):
    mask = _png(tmp_path / "m.png", 19, 30)
    with pytest.raises(AttributeError, match="same size"):
        check_conf(_cfg(pair, {("left", "mask"): mask}))


def test_check_images_ok(pair, tmp_path):
    mask = _png(tmp_path / "m.png", 20, 30)
    cfg, _ = check_conf(_cfg(pair, {("left", "mask"): mask}))
    assert cfg["input"]["left"]["mask"] == mask


# ---------------- disparity coherence ------------------------------------


def test_disparity_range_outside_image(pair):
    cfg = _cfg(pair)
    cfg["input"]["left"]["disp"] = [-80, -40]  # |d| > width 30 everywhere
    with pytest.raises(ValueError, match="out of image"):
        check_conf(cfg)


def test_disparity_range_inside_image():
    check_disparity_ranges_are_inside_image([-60, 0], 450)
    with pytest.raises(ValueError):
        check_disparity_ranges_are_inside_image([500, 600], 450)


def test_disparity_grid_wrong_band_count(pair, tmp_path):
    grid = str(tmp_path / "g1.tif")
    write_geotiff(grid, np.zeros((20, 30), np.float32))
    with pytest.raises(AttributeError, match="2-channel"):
        check_disparities_from_input(grid, pair["left"])


def test_disparity_grid_size_mismatch(pair, tmp_path):
    grid = str(tmp_path / "g2.tif")
    write_geotiff(grid, np.zeros((2, 21, 30), np.float32))
    with pytest.raises(AttributeError, match="same size"):
        check_disparities_from_input(grid, pair["left"])


def test_disparity_grid_min_above_max(pair, tmp_path):
    grid = str(tmp_path / "g3.tif")
    g = np.zeros((2, 20, 30), np.float32)
    g[0] = -1.0
    g[1] = -3.0  # max < min
    write_geotiff(grid, g)
    with pytest.raises(ValueError, match="bigger than disp_min"):
        check_disparities_from_input(grid, pair["left"])


def test_disparity_grid_valid(pair, tmp_path):
    grid = str(tmp_path / "g4.tif")
    g = np.zeros((2, 20, 30), np.float32)
    g[0] = -4.0
    write_geotiff(grid, g)
    check_disparities_from_input(grid, pair["left"])
    cfg = _cfg(pair)
    cfg["input"]["left"]["disp"] = grid
    validated, _ = check_conf(cfg)
    assert validated["input"]["left"]["disp"] == grid


def test_disparity_pair_unordered(pair):
    with pytest.raises(ValueError, match="bigger"):
        check_disparities_from_input([0, -5], pair["left"])


# ---------------- band names ---------------------------------------------


def test_check_band_names():
    check_band_names(None)
    check_band_names(("r", "g", "b"))
    with pytest.raises(TypeError, match="must be str"):
        check_band_names(("r", 2, "b"))


# ---------------- get_metadata (header-only) ------------------------------


def test_get_metadata_header_only(pair, tmp_path):
    meta = pandora_tpu.get_metadata(pair["left"], disparity=[-5, 0])
    assert meta["width"] == 30 and meta["height"] == 20
    assert meta["disparity_source"] == [-5, 0]
    grid = str(tmp_path / "g.tif")
    write_geotiff(grid, np.zeros((2, 20, 30), np.float32))
    meta = pandora_tpu.get_metadata(pair["left"], disparity=grid, classif=grid)
    assert meta["disparity_grid_shape"] == (2, 20, 30)
    assert len(meta["band_classif"]) == 2


def test_get_metadata_multiband(tmp_path):
    p = str(tmp_path / "rgb.tif")
    write_geotiff(p, np.zeros((3, 8, 9), np.float32), band_names=("r", "g", "b"))
    meta = pandora_tpu.get_metadata(p)
    assert meta["band_im"] == ("r", "g", "b")


# ---------------- ROI / get_window ----------------------------------------


def test_get_window_basic():
    roi = {"col": {"first": 10, "last": 19}, "row": {"first": 5, "last": 14}, "margins": [2, 3, 2, 3]}
    assert get_window(roi, 100, 50) == (2, 8, 16, 14)


def test_get_window_clamps_to_image():
    roi = {"col": {"first": 0, "last": 99}, "row": {"first": 0, "last": 49}, "margins": [5, 5, 5, 5]}
    assert get_window(roi, 100, 50) == (0, 0, 50, 100)


def test_get_window_outside_raises():
    roi = {"col": {"first": 200, "last": 210}, "row": {"first": 0, "last": 10}, "margins": [0, 0, 0, 0]}
    with pytest.raises(ValueError, match="outside"):
        get_window(roi, 100, 50)


def test_check_roi_section():
    roi = check_roi_section({"col": {"first": 1, "last": 5}, "row": {"first": 0, "last": 3}})
    assert roi["margins"] == [0, 0, 0, 0]
    with pytest.raises(SchemaError):
        check_roi_section({"col": {"first": 5, "last": 1}, "row": {"first": 0, "last": 3}})


def test_roi_windowed_image_load(pair):
    roi = {"col": {"first": 4, "last": 13}, "row": {"first": 2, "last": 11}, "margins": [1, 1, 1, 1]}
    left, right = pandora_tpu.images_from_config(
        {
            "left": {"img": pair["left"], "disp": [-3, 0]},
            "right": {"img": pair["right"], "disp": None},
        },
        roi=roi,
    )
    assert left.im.shape[-2:] == (12, 12)  # rows 1..12, cols 3..14
    full, *_ = read_raster(pair["left"])
    np.testing.assert_array_equal(np.asarray(left.im)[..., 0, 0], full[0, 1, 3])


@pytest.mark.functional
def test_roi_end_to_end_cones(tmp_path):
    """ROI config section drives a windowed end-to-end run whose disparities
    match the interior of the full-frame run (the reference's CARS tiling
    contract, img_tools.get_window + marge margins)."""
    import json

    cfg = {
        "input": {
            "left": {"img": "/root/reference/tests/pandora/left.png", "disp": [-60, 0]},
            "right": {"img": "/root/reference/tests/pandora/right.png"},
        },
        "ROI": {
            "col": {"first": 120, "last": 239},
            "row": {"first": 100, "last": 199},
            "margins": [70, 70, 70, 70],
        },
        "pipeline": {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
        },
    }
    path = tmp_path / "roi_cfg.json"
    path.write_text(json.dumps(cfg))
    out = tmp_path / "out"
    pandora_tpu.main(str(path), str(out))
    roi_disp, *_ = read_raster(str(out / "left_disparity.tif"))

    cfg.pop("ROI")
    path.write_text(json.dumps(cfg))
    out2 = tmp_path / "out_full"
    pandora_tpu.main(str(path), str(out2))
    full_disp, *_ = read_raster(str(out2 / "left_disparity.tif"))

    # the ROI output is cropped to the ROI proper (margins removed), so it
    # compares 1:1 against the same region of the full-frame run
    assert roi_disp.shape == (1, 100, 120)
    np.testing.assert_array_equal(roi_disp[0], full_disp[0, 100:200, 120:240])
