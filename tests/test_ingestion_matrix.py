"""Dataset-ingestion matrices ported from the reference suite
(tests/test_pandora_image.py TestCreateDatasetFromInputs): band / class
names ride GeoTIFF band descriptions, RGB + mask + ROI produces the exact
reference int16 mask, and dataset coherence failures raise."""

import numpy as np
import pytest

from pandora_tpu.api import check_datasets, create_image_from_inputs

REF = "/root/reference/tests"


def test_classif_names_from_band_descriptions():
    """test_pandora_image.py:463-484: classes ride the classif GeoTIFF's
    band descriptions into the dataset."""
    img = create_image_from_inputs(
        {"img": f"{REF}/pandora/left.png", "classif": f"{REF}/pandora/left_classif.tif"},
        disp=(-60, 0),
    )
    assert img.classif_names == ("cornfields", "olive tree", "forest")
    assert img.classif.shape[0] == 3


def test_rgb_band_names():
    """test_pandora_image.py:487-513: multiband image band names."""
    img = create_image_from_inputs(
        {"img": f"{REF}/pandora/left_rgb.tif"}, disp=(-60, 0)
    )
    assert img.band_names == ("red", "green", "blue")
    assert img.n_bands == 3


def test_rgb_with_classif():
    """test_pandora_image.py:487-513: bands AND classes together."""
    img = create_image_from_inputs(
        {
            "img": f"{REF}/pandora/left_rgb.tif",
            "classif": f"{REF}/pandora/left_classif.tif",
        },
        disp=(-60, 0),
    )
    assert img.band_names == ("red", "green", "blue")
    assert img.classif_names == ("cornfields", "olive tree", "forest")


def test_rgb_with_mask_and_roi():
    """test_pandora_image.py:515-557: nodata=37 + user mask on a 3x3 ROI
    produces the reference's exact int16 mask (0 valid / 1 nodata /
    2 user-invalidated, nodata wins)."""
    roi = {
        "col": {"first": 0, "last": 2},
        "row": {"first": 0, "last": 2},
        "margins": [0, 0, 0, 0],
    }
    img = create_image_from_inputs(
        {
            "img": f"{REF}/pandora/left_rgb.tif",
            "nodata": 37.0,
            "mask": f"{REF}/image/mask_left.tif",
        },
        disp=(-60, 0),
        roi=roi,
    )
    mask_gt = np.array([[0, 0, 2], [1, 1, 0], [2, 2, 0]], np.int16)
    np.testing.assert_array_equal(np.asarray(img.msk), mask_gt)
    assert img.msk.shape == (3, 3)
    assert img.im.shape == (3, 3, 3)


def test_check_datasets_shape_mismatch():
    """test_pandora_image.py:855-? / check_configuration.check_datasets:
    mismatched left/right shapes must raise."""
    left = create_image_from_inputs({"img": f"{REF}/pandora/left.png"}, disp=(-60, 0))
    right = create_image_from_inputs(
        {"img": f"{REF}/pandora/right.png"},
        disp=None,
        roi={
            "col": {"first": 0, "last": 99},
            "row": {"first": 0, "last": 99},
            "margins": [0, 0, 0, 0],
        },
    )
    with pytest.raises(Exception):
        check_datasets(left, right)


def test_check_datasets_requires_left_disparity():
    """check_datasets: a left image without a disparity range raises."""
    left = create_image_from_inputs({"img": f"{REF}/pandora/left.png"}, disp=None)
    right = create_image_from_inputs({"img": f"{REF}/pandora/right.png"}, disp=None)
    with pytest.raises(Exception):
        check_datasets(left, right)
