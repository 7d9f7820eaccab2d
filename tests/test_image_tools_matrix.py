"""Image-layer matrices ported from the reference suite
(tests/test_pandora_image.py:40-670): census-transform bit codes, windowed
mean/std moments, NaN-nodata ingestion against the reference's own raster
files, and inf-nodata rewriting."""

import jax.numpy as jnp
import numpy as np
import pytest

from pandora_tpu.io.raster import read_image_input, write_geotiff
from pandora_tpu.ops.census import census_transform
from pandora_tpu.ops.windows import box_mean_same, box_std_same

MONO = np.array(
    [[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 2, 1], [1, 1, 1, 4, 3, 1], [1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1]],
    np.float32,
)


def test_census_codes_window3():
    """reference test_pandora_image.py:62-90: exact bit codes.  Our
    signatures pack position p at bit 31-p; the reference packs p at bit
    (w*w-1-p), so ``word >> (32 - w*w)`` recovers its codes."""
    sig = np.asarray(census_transform(jnp.asarray(MONO), 3, 3))[:, :, 0].astype(np.uint32)
    got = sig >> np.uint32(32 - 9)
    gt = np.array(
        [
            [0b000000000, 0b000000001, 0b000001011, 0b000000110],
            [0b000000000, 0b000001000, 0b000000000, 0b000100000],
            [0b000000000, 0b001000000, 0b011000000, 0b110000000],
        ],
        np.uint32,
    )
    np.testing.assert_array_equal(got[1:-1, 1:-1], gt)


def test_census_codes_window5():
    """reference: window 5 code at the two interior pixels."""
    sig = np.asarray(census_transform(jnp.asarray(MONO), 5, 5))[:, :, 0].astype(np.uint32)
    got = sig >> np.uint32(32 - 25)
    gt = np.array([[0b0000000001000110000000000, 0b0]], np.uint32)
    np.testing.assert_array_equal(got[2:-2, 2:-2], gt)


def test_mean_raster_window3():
    """reference :102-141 (truncated raster == our same-size interior)."""
    mean = np.asarray(box_mean_same(jnp.asarray(MONO), 3, 3))
    gt = np.array(
        [
            [1.0, 12 / 9.0, 15 / 9.0, 15 / 9.0],
            [1.0, 12 / 9.0, 15 / 9.0, 15 / 9.0],
            [1.0, 12 / 9.0, 14.0 / 9, 14.0 / 9],
        ]
    )
    np.testing.assert_allclose(mean[1:-1, 1:-1], gt, rtol=1e-6)


def test_mean_raster_window5():
    mean = np.asarray(box_mean_same(jnp.asarray(MONO), 5, 5))
    np.testing.assert_allclose(mean[2:-2, 2:-2], [[31 / 25.0, 31 / 25.0]], rtol=1e-6)


def test_std_raster_window3():
    """reference :173-204: population std per window."""
    std = np.asarray(box_std_same(jnp.asarray(MONO), 3, 3))
    gt = np.array(
        [
            [0.0, np.std(MONO[:3, 1:4]), np.std(MONO[:3, 2:5]), np.std(MONO[:3, 3:])],
            [0.0, np.std(MONO[1:4, 1:4]), np.std(MONO[1:4, 2:5]), np.std(MONO[1:4, 3:])],
            [0.0, np.std(MONO[2:5, 1:4]), np.std(MONO[2:5, 2:5]), np.std(MONO[2:5, 3:])],
        ]
    )
    np.testing.assert_allclose(std[1:-1, 1:-1], gt, rtol=1e-5, atol=1e-6)


def test_std_raster_window5():
    std = np.asarray(box_std_same(jnp.asarray(MONO), 5, 5))
    gt = np.array([[np.std(MONO[:, :5]), np.std(MONO[:, 1:])]])
    np.testing.assert_allclose(std[2:-2, 2:-2], gt, rtol=1e-5)


def test_ingestion_with_nan_nodata_reference_files():
    """reference :416-462: NaN nodata + input mask → internal mask
    convention and -9999 rewrite, against the reference's own rasters."""
    data, msk, *_ = read_image_input(
        "/root/reference/tests/image/left_img_nan.tif",
        float("nan"),
        "/root/reference/tests/image/mask_left.tif",
    )
    mask_gt = np.array(
        [[1, 0, 2, 2, 1], [0, 0, 0, 0, 2], [1, 1, 0, 0, 2], [0, 0, 2, 0, 1]], np.int16
    )
    np.testing.assert_array_equal(msk, mask_gt)
    img_gt = np.array(
        [
            [-9999.0, 1.0, 2.0, 3.0, -9999.0],
            [5.0, 6.0, 7.0, 8.0, 9.0],
            [-9999.0, -9999.0, 23.0, 5.0, 6.0],
            [12.0, 5.0, 6.0, 3.0, -9999.0],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(data[0], img_gt)


def test_ingestion_inf_nodata(tmp_path):
    """reference :631-668: inf nodata values rewritten to -9999."""
    arr = np.array(
        [
            [np.inf, 1, 2, 5],
            [5, 1, 2, 7],
            [-np.inf, 2, 0, 3],
            [4, np.inf, 4, -np.inf],
        ],
        np.float32,
    )
    path = str(tmp_path / "inf.tif")
    write_geotiff(path, arr[None])
    data, msk, *_ = read_image_input(path, float("inf"))
    gt = np.array(
        [[-9999, 1, 2, 5], [5, 1, 2, 7], [-9999, 2, 0, 3], [4, -9999, 4, -9999]],
        np.float32,
    )
    np.testing.assert_array_equal(data[0], gt)
    # nodata pixels flagged 1 in the internal mask
    assert msk is not None
    np.testing.assert_array_equal(msk == 1, ~np.isfinite(arr))
