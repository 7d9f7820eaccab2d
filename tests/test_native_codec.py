"""Native raster codec (C++/ctypes) vs the pure-Python zlib fallback."""

import glob

import numpy as np
import pytest

import pandora_tpu.io._native as native
import pandora_tpu.io.raster as raster


@pytest.fixture()
def force_python_fallback(monkeypatch):
    monkeypatch.setattr(native, "decode_chunks", lambda *a, **k: None)


def test_native_codec_builds():
    assert native.lib() is not None


@pytest.mark.parametrize(
    "path",
    sorted(glob.glob("/root/reference/tests/pandora/*.tif")),
    ids=lambda p: p.rsplit("/", 1)[-1],
)
def test_native_matches_python(path):
    a = raster._read_tiff_native(path)
    orig = native.decode_chunks
    try:
        native.decode_chunks = lambda *ar, **kw: None
        b = raster._read_tiff_native(path)
    finally:
        native.decode_chunks = orig
    assert (a is None) == (b is None)
    if a is not None:
        np.testing.assert_array_equal(a[0], b[0])


def test_decode_chunks_roundtrip():
    import zlib

    rng = np.random.default_rng(7)
    blocks = [rng.integers(0, 255, 4096, np.uint8).tobytes() for _ in range(5)]
    comp = [zlib.compress(b, 6) for b in blocks]
    raw = b"".join(comp)
    offsets, pos = [], 0
    for c in comp:
        offsets.append(pos)
        pos += len(c)
    out = native.decode_chunks(
        raw, offsets, [len(c) for c in comp], [len(b) for b in blocks], 8
    )
    if out is None:
        pytest.skip("native codec unavailable")
    for got, want in zip(out, blocks):
        assert bytes(got) == want
