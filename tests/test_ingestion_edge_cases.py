"""Image-ingestion edge cases ported from the reference's
``tests/test_pandora_image.py`` (round-5 VERDICT #3): ROI window clamping
and failures, windowed ingestion shapes, every accepted disparity input
form, auxiliary-layer shape validation, header-only metadata success and
failure modes, and the CARS ``add_global_disparity`` contract.
"""

import numpy as np
import pytest
from PIL import Image as PILImage

from pandora_tpu.api import check_datasets, create_image_from_inputs, get_metadata
from pandora_tpu.datamodel import add_global_disparity, make_image
from pandora_tpu.io.raster import get_window

REF = "/root/reference/tests/pandora"


# ---------------------------------------------------------------------------
# get_window (reference TestGetWindow, test_pandora_image.py:257-357)
# ---------------------------------------------------------------------------

IMG_H, IMG_W = 8, 11


def test_roi_inside_image():
    roi = {"col": {"first": 3, "last": 5}, "row": {"first": 3, "last": 5}, "margins": [2, 2, 2, 2]}
    # (row_off, col_off, n_rows, n_cols) == reference Window(1, 1, 7, 7)
    assert get_window(roi, IMG_W, IMG_H) == (1, 1, 7, 7)


@pytest.mark.parametrize(
    "roi,expected",
    [
        (
            {"col": {"first": 0, "last": 2}, "row": {"first": 3, "last": 5}, "margins": [2, 2, 2, 2]},
            (1, 0, 7, 5),
        ),
        (
            {"col": {"first": 10, "last": 12}, "row": {"first": 3, "last": 5}, "margins": [2, 2, 2, 2]},
            (1, 8, 7, 3),
        ),
        (
            {"col": {"first": 3, "last": 5}, "row": {"first": -1, "last": 5}, "margins": [2, 2, 2, 2]},
            (0, 1, 8, 7),
        ),
        (
            {"col": {"first": 3, "last": 5}, "row": {"first": 9, "last": 11}, "margins": [2, 2, 2, 2]},
            (7, 1, 1, 7),
        ),
    ],
    ids=["overlap-left", "overlap-right", "overlap-up", "overlap-down"],
)
def test_overlap_roi(roi, expected):
    """reference test_pandora_image.py:294-326: clamped to the image."""
    assert get_window(roi, IMG_W, IMG_H) == expected


@pytest.mark.parametrize(
    "roi",
    [
        {"col": {"first": -10, "last": -12}, "row": {"first": 3, "last": 5}, "margins": [2, 2, 2, 2]},
        {"col": {"first": 100, "last": 120}, "row": {"first": 3, "last": 5}, "margins": [2, 2, 2, 2]},
        {"col": {"first": 3, "last": 5}, "row": {"first": -6, "last": -5}, "margins": [2, 2, 2, 2]},
        {"col": {"first": 3, "last": 5}, "row": {"first": 11, "last": 111}, "margins": [2, 2, 2, 2]},
    ],
    ids=["outside-left", "outside-right", "outside-up", "outside-down"],
)
def test_fails_when_roi_is_outside_image(roi):
    with pytest.raises(ValueError, match="Roi specified is outside the image"):
        get_window(roi, IMG_W, IMG_H)


# ---------------------------------------------------------------------------
# windowed ingestion shapes (reference test_coords_roi, :907-960)
# ---------------------------------------------------------------------------


@pytest.fixture
def strip_image(tmp_path):
    rng = np.random.default_rng(0)
    arr = (rng.random((IMG_H, IMG_W)) * 100).astype(np.float32)
    path = tmp_path / "strip.tif"
    PILImage.fromarray(arr).save(path)
    return str(path)


@pytest.mark.parametrize(
    "roi,expected_shape",
    [
        ({"col": {"first": 3, "last": 5}, "row": {"first": 3, "last": 5}, "margins": [2, 2, 2, 2]}, (7, 7)),
        ({"col": {"first": 0, "last": 2}, "row": {"first": 3, "last": 5}, "margins": [2, 2, 2, 2]}, (7, 5)),
        ({"col": {"first": 10, "last": 12}, "row": {"first": 3, "last": 5}, "margins": [2, 2, 2, 2]}, (7, 3)),
        ({"col": {"first": 3, "last": 5}, "row": {"first": -1, "last": 5}, "margins": [2, 2, 2, 2]}, (8, 7)),
        ({"col": {"first": 3, "last": 5}, "row": {"first": 9, "last": 11}, "margins": [2, 2, 2, 2]}, (1, 7)),
    ],
    ids=["inside", "overlap-left", "overlap-right", "overlap-up", "overlap-down"],
)
def test_windowed_ingestion_shapes(strip_image, roi, expected_shape):
    img = create_image_from_inputs({"img": strip_image, "nodata": -9999}, [-60, 0], roi=roi)
    assert img.im.shape[-2:] == expected_shape
    assert img.disp_min.shape == expected_shape


# ---------------------------------------------------------------------------
# disparity input forms (reference test_with_disparity :759-836, TestReadDisp)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("form", ["list", "tuple"], ids=["list", "tuple"])
def test_ingest_with_pair_disparity(form):
    disp = [-60, 0] if form == "list" else (-60, 0)
    img = create_image_from_inputs({"img": f"{REF}/left.png", "nodata": -9999}, disp)
    assert img.im.shape[-2:] == (375, 450)
    assert img.disp_min.shape == (375, 450)
    np.testing.assert_array_equal(np.asarray(img.disp_min), np.full((375, 450), -60.0))
    np.testing.assert_array_equal(np.asarray(img.disp_max), np.full((375, 450), 0.0))


def test_ingest_with_grid_file_disparity():
    """Path to a 2-band grid raster (reference 'Path to grid file')."""
    img = create_image_from_inputs(
        {"img": f"{REF}/left.png", "nodata": -9999}, f"{REF}/left_disparity_grid.tif"
    )
    assert img.disp_min.shape == (375, 450)
    assert img.disparity_source == "grid"
    assert float(np.min(np.asarray(img.disp_min))) < float(np.max(np.asarray(img.disp_max)))


def test_tiny_disparity_grid_values():
    """reference TestReadDisp: tiny_left_disparity_grid.tif == constant
    (-27, -7) 4x4 grids."""
    from pandora_tpu.io.raster import read_raster

    grid, *_ = read_raster(f"{REF}/tiny_left_disparity_grid.tif")
    np.testing.assert_array_equal(grid[0], np.full((4, 4), -27.0, np.float32))
    np.testing.assert_array_equal(grid[1], np.full((4, 4), -7.0, np.float32))


def test_none_disparity_rejected_by_datasets_check():
    """reference read_disp(None) -> error; here the coherence check rejects
    a left image without disparity (check_datasets)."""
    left = make_image(np.zeros((4, 4), np.float32))
    right = make_image(np.zeros((4, 4), np.float32))
    with pytest.raises(AttributeError, match="disparity"):
        check_datasets(left, right)


# ---------------------------------------------------------------------------
# auxiliary-layer shape validation (reference :838-869)
# ---------------------------------------------------------------------------


def test_fails_with_classif_shape_mismatch():
    with pytest.raises(ValueError, match="classif"):
        create_image_from_inputs(
            {
                "img": "/root/reference/tests/image/left_img.tif",
                "nodata": -9999,
                "classif": f"{REF}/left_classif.tif",
            },
            [-60, 0],
        )


def test_fails_with_segm_shape_mismatch():
    with pytest.raises(ValueError, match="segm"):
        create_image_from_inputs(
            {
                "img": f"{REF}/left.png",
                "nodata": -9999,
                "segm": "/root/reference/tests/image/mask_left.tif",
            },
            [-60, 0],
        )


# ---------------------------------------------------------------------------
# get_metadata (reference TestGetMetadata, :1051-1110)
# ---------------------------------------------------------------------------


def test_get_metadata_succeed():
    meta = get_metadata(f"{REF}/left.png", [-60, 0])
    assert (meta["height"], meta["width"]) == (375, 450)
    assert meta["band_im"] is None  # monoband
    assert meta["disparity_source"] == [-60, 0]


def test_get_metadata_with_classif_bands():
    meta = get_metadata(f"{REF}/left.png", [-60, 0], classif=f"{REF}/left_classif.tif")
    assert len(meta["band_classif"]) >= 1


@pytest.mark.parametrize("img", ["/nonexistent/left_fake.png", 1, True], ids=["wrong-path", "int", "bool"])
def test_get_metadata_fail_with_wrong_img_path(img):
    with pytest.raises((TypeError, OSError)):
        get_metadata(img, [-60, 0])


@pytest.mark.parametrize("classif", [True, 1], ids=["bool", "int"])
def test_get_metadata_fail_with_wrong_classification_param(classif):
    with pytest.raises(TypeError, match=f"invalid path or file: {classif}"):
        get_metadata(f"{REF}/left.png", [-60, 0], classif=classif)


# ---------------------------------------------------------------------------
# add_global_disparity (reference :1113-1161, the CARS tiling hook)
# ---------------------------------------------------------------------------


def test_add_global_disparity():
    img = make_image(np.zeros((5, 6), np.float32), disp=(-2, 2))
    out = add_global_disparity(img, -2, 2)
    assert out.global_disparity == (-2, 2)


@pytest.mark.parametrize(
    "disparities",
    [[0, 2], [-2, 1], [0, 1]],
    ids=["global_min", "global_max", "global_extremum"],
)
def test_add_global_disparity_failed(disparities):
    img = make_image(np.zeros((5, 6), np.float32), disp=(-2, 2))
    with pytest.raises(
        ValueError,
        match="the global disparity must be outside the range of the grid disparity",
    ):
        add_global_disparity(img, *disparities)
