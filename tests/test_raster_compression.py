"""TIFF compression coverage: LZW (+ predictors 2/3), PackBits, deflate
write.

The reference ingests anything GDAL reads via rasterio
(img_tools.py:345-437); LZW with the horizontal predictor is the most
common GeoTIFF compression in EO products.  The checked-in fixtures in
tests/data/ were generated OUT-OF-BAND by PIL/libtiff's encoder
(scripts commentary in the files' git history), so the decoders here are
cross-checked against an independent implementation.

Both the native C++ decoder (native/raster_codec.cpp) and the
pure-Python fallbacks are exercised.
"""

import os

import numpy as np
import pytest
from PIL import Image as PILImage

import pandora_tpu.io._native as native
import pandora_tpu.io.raster as raster

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
TRUTH = np.load(os.path.join(DATA, "compression_fixture_truth.npz"))

FIXTURES = [
    ("lzw_pred2_u16.tif", "a16"),
    ("lzw_pred3_f32.tif", "f32"),
    ("packbits_u8.tif", "u8"),
]


@pytest.fixture(params=[False, True], ids=["native", "python-fallback"])
def maybe_fallback(request, monkeypatch):
    if request.param:
        monkeypatch.setattr(native, "decode_chunks", lambda *a, **k: None)
    return request.param


@pytest.mark.parametrize("fname,key", FIXTURES, ids=[f[0] for f in FIXTURES])
def test_checked_in_fixture_decodes(fname, key, maybe_fallback):
    out = raster._read_tiff_native(os.path.join(DATA, fname))
    assert out is not None, f"native reader rejected {fname}"
    arr, tags = out
    np.testing.assert_array_equal(arr[0], TRUTH[key])


@pytest.mark.parametrize(
    "compression,predictor,dtype",
    [
        ("tiff_lzw", 1, np.uint8),
        ("tiff_lzw", 2, np.uint8),
        ("tiff_lzw", 2, np.uint16),
        ("tiff_lzw", 3, np.float32),
        ("packbits", 1, np.uint8),
        ("tiff_deflate", 2, np.uint16),
        ("tiff_deflate", 3, np.float32),
    ],
)
def test_pil_generated_roundtrip(tmp_path, compression, predictor, dtype, maybe_fallback):
    """Decode files written by PIL/libtiff (independent encoder) across
    the compression x predictor x dtype grid."""
    rng = np.random.default_rng(3)
    if np.issubdtype(dtype, np.floating):
        a = (rng.random((29, 41)) * 200 - 100).astype(dtype)
    else:
        a = rng.integers(0, np.iinfo(dtype).max, (29, 41)).astype(dtype)
    p = tmp_path / "t.tif"
    info = {317: predictor} if predictor != 1 else {}
    PILImage.fromarray(a).save(p, compression=compression, tiffinfo=info)
    out = raster._read_tiff_native(str(p))
    assert out is not None
    np.testing.assert_array_equal(out[0][0], a)


def test_lzw_long_stream_table_growth(maybe_fallback, tmp_path):
    """A large low-entropy image forces the LZW code width through 10, 11
    and 12 bits plus mid-stream Clear codes."""
    rng = np.random.default_rng(0)
    a = (rng.integers(0, 4, (256, 512)) * 17).astype(np.uint8)
    p = tmp_path / "big.tif"
    PILImage.fromarray(a).save(p, compression="tiff_lzw")
    out = raster._read_tiff_native(str(p))
    assert out is not None
    np.testing.assert_array_equal(out[0][0], a)


def test_deflate_write_roundtrip(tmp_path):
    """write_geotiff(compression='deflate') → readable by this module AND
    by PIL, with geo tags intact."""
    rng = np.random.default_rng(1)
    a = (rng.random((33, 47)).astype(np.float32) * 100) - 50
    p = tmp_path / "d.tif"
    raster.write_geotiff(
        str(p), a, transform=(0.5, 0.0, 10.0, 0.0, -0.5, 20.0),
        crs="WGS 84", nodata=-9999.0, compression="deflate",
    )
    data, transform, crs, nodata, _ = raster.read_raster(str(p))
    np.testing.assert_array_equal(data[0], a)
    assert transform == (0.5, 0.0, 10.0, 0.0, -0.5, 20.0)
    assert nodata == -9999.0
    pil = np.asarray(PILImage.open(p))
    np.testing.assert_array_equal(pil, a)
    assert p.stat().st_size < a.nbytes  # actually compressed


def test_deflate_write_multiband(tmp_path):
    rng = np.random.default_rng(2)
    a = rng.integers(0, 255, (3, 21, 30)).astype(np.uint8)
    p = tmp_path / "mb.tif"
    raster.write_geotiff(str(p), a, band_names=("r", "g", "b"), compression="deflate")
    data, *_, names = raster.read_raster(str(p))
    np.testing.assert_array_equal(data.astype(np.uint8), a)
    assert names == ("r", "g", "b")


def test_unknown_compression_write_rejected(tmp_path):
    with pytest.raises(ValueError, match="compression"):
        raster.write_geotiff(str(tmp_path / "x.tif"), np.zeros((4, 4), np.float32),
                             compression="jpeg")


def test_cones_pipeline_on_lzw_recompressed_inputs(tmp_path):
    """The cones e2e config passes when its inputs are recompressed as
    LZW+predictor TIFFs (the VERDICT round-5 acceptance check)."""
    import json

    from pandora_tpu.api import main as api_main

    base = "/root/reference/tests/pandora"
    for name in ("left", "right"):
        im = np.asarray(PILImage.open(f"{base}/{name}.png"))
        PILImage.fromarray(im).save(
            tmp_path / f"{name}.tif", compression="tiff_lzw", tiffinfo={317: 2}
        )
    cfg = {
        "input": {
            "left": {"img": str(tmp_path / "left.tif"), "disp": [-60, 0]},
            "right": {"img": str(tmp_path / "right.tif")},
        },
        "pipeline": {
            "matching_cost": {"matching_cost_method": "census", "window_size": 5},
            "disparity": {"disparity_method": "wta", "invalid_disparity": "NaN"},
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "out"
    api_main(str(cfg_path), str(out))
    d, *_ = raster.read_raster(str(out / "left_disparity.tif"))
    gt, *_ = raster.read_raster(f"{base}/disp_left.tif")
    d, gt = d[0], gt[0]
    mask = gt != 0
    bad1 = float((np.abs(d[mask] + gt[mask]) > 1).sum() / d.size)
    assert bad1 <= 0.45  # raw census+WTA quality on cones (~0.40)
