"""Raster ingestion and GeoTIFF output.

The reference reads/writes rasters with rasterio (img_tools.py:345-437,
common.py:40-110).  This environment has no rasterio/GDAL, so this module
implements the needed subset natively:

* reading: PIL handles PNG and single/multi-band TIFF (including float32);
  geo tags (ModelPixelScale / ModelTiepoint / ModelTransformation) are
  decoded directly from the TIFF IFD.
* writing: a minimal from-scratch GeoTIFF encoder (striped, uncompressed,
  little-endian) for float32 / uint16 / int16 single-band rasters with
  optional affine transform + CRS tags — enough for the reference output
  tree (left/right disparity, confidence, validity mask GeoTIFFs,
  common.py:112-199).
"""

from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image as PILImage

PILImage.MAX_IMAGE_PIXELS = None  # large satellite scenes

# TIFF tag ids
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITSPERSAMPLE = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIPOFFSETS = 273
_T_SAMPLESPERPIXEL = 277
_T_ROWSPERSTRIP = 278
_T_STRIPBYTECOUNTS = 279
_T_PLANARCONFIG = 284
_T_SAMPLEFORMAT = 339
_T_MODELPIXELSCALE = 33550
_T_MODELTIEPOINT = 33922
_T_MODELTRANSFORMATION = 34264
_T_GEOKEYDIRECTORY = 34735
_T_GEOASCIIPARAMS = 34737
_T_GDAL_METADATA = 42112
_T_GDAL_NODATA = 42113

_T_PREDICTOR = 317

_SAMPLEFORMAT = {"u": 1, "i": 2, "f": 3}


def _packbits_decode(src: bytes, dst_size: int) -> bytes:
    """TIFF PackBits (compression 32773) — pure-Python fallback of the
    native decoder (native/raster_codec.cpp::decode_packbits)."""
    out = bytearray()
    i, n_src = 0, len(src)
    while i < n_src and len(out) < dst_size:
        n = src[i]
        i += 1
        if n < 128:  # literal run
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += src[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:dst_size])


def _lzw_decode(src: bytes, dst_size: int) -> bytes:
    """TIFF LZW (compression 5): MSB-first variable-width codes, ClearCode
    256 / EOI 257, with the TIFF early-change convention.  Pure-Python
    fallback of native/raster_codec.cpp::decode_lzw."""
    CLEAR, EOI, FIRST = 256, 257, 258
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    width, bitbuf, bits = 9, 0, 0
    prev: Optional[bytes] = None
    i, n_src = 0, len(src)
    while len(out) < dst_size:
        while bits < width:
            if i >= n_src:
                return bytes(out[:dst_size])
            bitbuf = (bitbuf << 8) | src[i]
            i += 1
            bits += 8
        code = (bitbuf >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        if code == EOI:
            break
        if code == CLEAR:
            del table[FIRST:]
            width, prev = 9, None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:dst_size])


def _undo_predictor(buf: bytes, predictor: int, n_rows: int, row_values: int,
                    spp: int, dt: np.dtype) -> bytes:
    """Undo TIFF predictor 2 (horizontal differencing, integer samples) or
    3 (floating-point byte-plane differencing, GDAL/libtiff convention) on
    one decoded chunk; returns bytes in the file's byte order."""
    if predictor == 2:
        if dt.kind not in "ui":
            raise ValueError("predictor 2 requires integer samples")
        u = np.dtype(f"{dt.byteorder}u{dt.itemsize}")
        a = np.frombuffer(buf, u).astype(np.int64).reshape(n_rows, row_values, spp)
        a = a.cumsum(axis=1) & ((1 << (8 * dt.itemsize)) - 1)
        return a.astype(u).tobytes()
    if predictor == 3:
        it = dt.itemsize
        nb = np.frombuffer(buf, np.uint8).astype(np.int64).reshape(n_rows, -1)
        nb = (nb.cumsum(axis=1) & 0xFF).astype(np.uint8)
        nvals = nb.shape[1] // it
        # byte planes are MSB-first across the whole row; interleave back
        # into big-endian values
        inter = np.moveaxis(nb.reshape(n_rows, it, nvals), 1, 2)
        vals = np.frombuffer(np.ascontiguousarray(inter).tobytes(),
                             np.dtype(f">{dt.kind}{it}"))
        return vals.astype(dt).tobytes()
    raise ValueError(f"unsupported TIFF predictor {predictor}")


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d", 16: "Q", 17: "q"}


def _read_tiff_native(path: str):
    """Minimal TIFF reader: striped or tiled, uncompressed or deflate,
    chunky (PlanarConfig=1) or planar (=2), any sample format.  Returns
    (data (bands, rows, cols), tags dict) or None if unsupported.

    Needed because PIL rejects planar multi-band float TIFFs, which the
    reference uses for disparity grids (tests/pandora/left_disparity_grid.tif).
    """
    import zlib

    with open(path, "rb") as fh:
        raw = fh.read()
    if raw[:2] not in (b"II", b"MM") or len(raw) < 8:
        return None
    bo = "<" if raw[:2] == b"II" else ">"
    if struct.unpack(bo + "H", raw[2:4])[0] != 42:
        return None  # (bigtiff unsupported)
    off = struct.unpack(bo + "I", raw[4:8])[0]
    n = struct.unpack(bo + "H", raw[off : off + 2])[0]
    tags = {}
    for i in range(n):
        ent = raw[off + 2 + i * 12 : off + 14 + i * 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", ent[:8])
        size = _TYPE_SIZES.get(typ, 1) * cnt
        voff = struct.unpack(bo + "I", ent[8:12])[0] if size > 4 else off + 2 + i * 12 + 8
        if typ == 2:
            tags[tag] = raw[voff : voff + cnt].rstrip(b"\x00").decode("latin1")
        elif typ in _TYPE_FMT:
            tags[tag] = struct.unpack(bo + str(cnt) + _TYPE_FMT[typ], raw[voff : voff + size])
        elif typ == 5:  # rational
            v = struct.unpack(bo + str(2 * cnt) + "I", raw[voff : voff + size])
            tags[tag] = tuple(v[2 * k] / max(v[2 * k + 1], 1) for k in range(cnt))
    width = tags[_T_WIDTH][0]
    height = tags[_T_HEIGHT][0]
    spp = tags.get(_T_SAMPLESPERPIXEL, (1,))[0]
    bits = tags.get(_T_BITSPERSAMPLE, (8,) * spp)[0]
    comp = tags.get(_T_COMPRESSION, (1,))[0]
    planar = tags.get(_T_PLANARCONFIG, (1,))[0]
    sfmt = tags.get(_T_SAMPLEFORMAT, (1,) * spp)[0]
    pred = tags.get(_T_PREDICTOR, (1,))[0]
    if comp not in (1, 5, 8, 32946, 32773) or pred not in (1, 2, 3):
        return None
    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt)
    if kind is None:
        return None
    dt = np.dtype(f"{bo}{kind}{bits // 8}")

    def chunks(offsets, counts, sizes):
        # parallel native decode (native/raster_codec.cpp) with pure
        # Python zlib/LZW/PackBits fallbacks
        from . import _native

        decoded = _native.decode_chunks(raw, list(offsets), list(counts), sizes, comp)
        if decoded is not None:
            yield from decoded
            return
        for o, c, sz in zip(offsets, counts, sizes):
            blob = raw[o : o + c]
            if comp in (8, 32946):
                yield zlib.decompress(blob)
            elif comp == 5:
                yield _lzw_decode(blob, sz)
            elif comp == 32773:
                yield _packbits_decode(blob, sz)
            else:
                yield blob

    if 324 in tags:  # tiled
        tw, th = tags[322][0], tags[323][0]
        tiles_x = -(-width // tw)
        tiles_y = -(-height // th)
        n_planes = spp if planar == 2 else 1
        samples_per_tile = spp if planar == 1 else 1
        out = np.zeros((spp, height, width), dt.newbyteorder("="))
        tile_bytes = th * tw * samples_per_tile * dt.itemsize
        it = chunks(tags[324], tags[325], [tile_bytes] * len(tags[324]))
        for p in range(n_planes):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    blob = next(it)
                    if pred != 1:
                        blob = _undo_predictor(blob, pred, th, tw, samples_per_tile, dt)
                    buf = np.frombuffer(blob, dt)
                    tile = buf.reshape(th, tw, samples_per_tile)
                    h = min(th, height - ty * th)
                    w = min(tw, width - tx * tw)
                    if planar == 1:
                        out[:, ty * th : ty * th + h, tx * tw : tx * tw + w] = np.moveaxis(
                            tile[:h, :w], -1, 0
                        )
                    else:
                        out[p, ty * th : ty * th + h, tx * tw : tx * tw + w] = tile[:h, :w, 0]
    else:  # striped
        rps = tags.get(_T_ROWSPERSTRIP, (height,))[0]
        strips_per_plane = -(-height // rps)
        n_planes = spp if planar == 2 else 1
        samples_per_row = width * (spp if planar == 1 else 1)
        out = np.zeros((spp, height, width), dt.newbyteorder("="))
        strip_sizes = [
            min(rps, height - s * rps) * samples_per_row * dt.itemsize
            for _ in range(n_planes)
            for s in range(strips_per_plane)
        ]
        it = chunks(tags[_T_STRIPOFFSETS], tags[_T_STRIPBYTECOUNTS], strip_sizes)
        strip_spp = spp if planar == 1 else 1
        for p in range(n_planes):
            for s in range(strips_per_plane):
                blob = next(it)
                h = min(rps, height - s * rps)
                if pred != 1:
                    blob = _undo_predictor(blob, pred, h, width, strip_spp, dt)
                buf = np.frombuffer(blob, dt)
                rowsdata = buf[: h * samples_per_row].reshape(h, -1)
                if planar == 1:
                    out[:, s * rps : s * rps + h] = np.moveaxis(rowsdata.reshape(h, width, spp), -1, 0)
                else:
                    out[p, s * rps : s * rps + h] = rowsdata
    return out, tags


def _tags_geo_transform(tags: dict) -> Optional[Tuple[float, ...]]:
    if _T_MODELTRANSFORMATION in tags:
        m = [float(v) for v in tags[_T_MODELTRANSFORMATION]]
        return (m[0], m[1], m[3], m[4], m[5], m[7])
    if _T_MODELPIXELSCALE in tags and _T_MODELTIEPOINT in tags:
        sx, sy = [float(v) for v in tags[_T_MODELPIXELSCALE][:2]]
        tp = [float(v) for v in tags[_T_MODELTIEPOINT][:6]]
        i, j, x, y = tp[0], tp[1], tp[3], tp[4]
        return (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
    return None


def _pil_geo_transform(img: PILImage.Image) -> Optional[Tuple[float, ...]]:
    """Extract the affine transform (a, b, c, d, e, f) with
    x = a*col + b*row + c ; y = d*col + e*row + f from TIFF geo tags."""
    tags = getattr(img, "tag_v2", None)
    if tags is None:
        return None
    if _T_MODELTRANSFORMATION in tags:
        m = [float(v) for v in tags[_T_MODELTRANSFORMATION]]
        return (m[0], m[1], m[3], m[4], m[5], m[7])
    if _T_MODELPIXELSCALE in tags and _T_MODELTIEPOINT in tags:
        sx, sy = [float(v) for v in tags[_T_MODELPIXELSCALE][:2]]
        tp = [float(v) for v in tags[_T_MODELTIEPOINT][:6]]
        i, j, x, y = tp[0], tp[1], tp[3], tp[4]
        return (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
    return None


def _gdal_band_names(xml: Optional[str], n_bands: int) -> Optional[Tuple[str, ...]]:
    """Band descriptions from the GDAL_METADATA XML tag (the reference reads
    them via rasterio ``descriptions``, img_tools.py:392-400)."""
    if not xml:
        return None
    import re

    names: Dict[int, str] = {}
    for m in re.finditer(
        r'<Item name="DESCRIPTION" sample="(\d+)"[^>]*>([^<]*)</Item>', xml
    ):
        names[int(m.group(1))] = m.group(2)
    if not names:
        return None
    return tuple(names.get(i, f"band_{i}") for i in range(n_bands))


def _tiff_header_tags(path: str) -> Optional[dict]:
    """Seek-based TIFF tag parse — reads only the IFD + external tag
    payloads, never the pixel strips (header-only ingestion for rasters
    PIL rejects, e.g. planar multi-band float grids)."""
    with open(path, "rb") as fh:
        head = fh.read(8)
        if len(head) < 8 or head[:2] not in (b"II", b"MM"):
            return None
        bo = "<" if head[:2] == b"II" else ">"
        if struct.unpack(bo + "H", head[2:4])[0] != 42:
            return None
        fh.seek(struct.unpack(bo + "I", head[4:8])[0])
        n = struct.unpack(bo + "H", fh.read(2))[0]
        raw_entries = fh.read(12 * n)
        tags = {}
        for i in range(n):
            ent = raw_entries[12 * i : 12 * i + 12]
            tag, typ, cnt = struct.unpack(bo + "HHI", ent[:8])
            size = _TYPE_SIZES.get(typ, 1) * cnt
            if size > 4:
                fh.seek(struct.unpack(bo + "I", ent[8:12])[0])
                payload = fh.read(size)
            else:
                payload = ent[8 : 8 + size]
            if typ == 2:
                tags[tag] = payload.rstrip(b"\x00").decode("latin1")
            elif typ in _TYPE_FMT:
                tags[tag] = struct.unpack(bo + str(cnt) + _TYPE_FMT[typ], payload)
            elif typ == 5:  # rational
                v = struct.unpack(bo + str(2 * cnt) + "I", payload)
                tags[tag] = tuple(v[2 * k] / max(v[2 * k + 1], 1) for k in range(cnt))
    return tags


def read_raster_header(path: str) -> Dict[str, object]:
    """Header-only raster metadata — no pixel decode (the reference's
    rasterio_open header usage, check_configuration.py:170-205 and
    img_tools.get_metadata, img_tools.py:440-476).

    :return: dict(width, height, count, band_names, transform, crs, nodata)
    """
    if path.lower().endswith((".tif", ".tiff")):
        tags = _tiff_header_tags(path)
        if tags is not None and _T_WIDTH in tags and _T_HEIGHT in tags:
            count = tags.get(_T_SAMPLESPERPIXEL, (1,))[0]
            nodata = None
            if _T_GDAL_NODATA in tags:
                try:
                    nodata = float(str(tags[_T_GDAL_NODATA]).strip("\x00 "))
                except ValueError:
                    nodata = None
            return {
                "width": int(tags[_T_WIDTH][0]),
                "height": int(tags[_T_HEIGHT][0]),
                "count": int(count),
                "band_names": _gdal_band_names(tags.get(_T_GDAL_METADATA), count),
                "transform": _tags_geo_transform(tags),
                "crs": str(tags[_T_GEOASCIIPARAMS]) if _T_GEOASCIIPARAMS in tags else None,
                "nodata": nodata,
            }
    img = PILImage.open(path)  # lazy: PIL decodes pixels only on access
    width, height = img.size
    count = getattr(img, "n_frames", 1)
    if count == 1 and img.mode in ("RGB", "RGBA", "YCbCr"):
        count = len(img.mode)
    tags = getattr(img, "tag_v2", None)
    transform = crs = nodata = band_names = None
    if tags is not None:
        tag_dict = dict(tags)
        transform = _tags_geo_transform(tag_dict)
        if _T_GEOASCIIPARAMS in tag_dict:
            crs = str(tag_dict[_T_GEOASCIIPARAMS])
        if _T_GDAL_NODATA in tag_dict:
            try:
                nodata = float(str(tag_dict[_T_GDAL_NODATA]).strip("\x00 "))
            except ValueError:
                nodata = None
        if _T_SAMPLESPERPIXEL in tag_dict:
            count = max(count, int(tag_dict[_T_SAMPLESPERPIXEL]))
        band_names = _gdal_band_names(tag_dict.get(_T_GDAL_METADATA), count)
    img.close()
    return {
        "width": int(width),
        "height": int(height),
        "count": int(count),
        "band_names": band_names,
        "transform": transform,
        "crs": crs,
        "nodata": nodata,
    }


def get_window(roi: Dict, width: int, height: int) -> Tuple[int, int, int, int]:
    """ROI + margins → clamped read window ``(row_off, col_off, n_rows,
    n_cols)`` (reference img_tools.get_window, img_tools.py:61-98).

    ``roi`` = {"col": {"first", "last"}, "row": {"first", "last"},
    "margins": [left, up, right, down]} — first/last are inclusive pixel
    indices of the region of interest; margins extend the window so
    stencil steps see real context, clamped to the image."""
    margins = roi.get("margins", (0, 0, 0, 0))
    col_off = max(roi["col"]["first"] - margins[0], 0)
    row_off = max(roi["row"]["first"] - margins[1], 0)
    roi_width = roi["col"]["last"] - col_off + margins[2] + 1
    roi_height = roi["row"]["last"] - row_off + margins[3] + 1
    if col_off > width or row_off > height or col_off + roi_width < 0 or row_off + roi_height < 0:
        raise ValueError("Roi specified is outside the image")
    roi_width = min(roi_width, width - col_off)
    roi_height = min(roi_height, height - row_off)
    return row_off, col_off, roi_height, roi_width


def read_raster(path: str, window: Optional[Tuple[int, int, int, int]] = None):
    """Read a raster as ``(bands, rows, cols)`` float32 plus geo metadata.

    ``window`` is ``(row_off, col_off, n_rows, n_cols)`` (the reference ROI
    read, img_tools.get_window img_tools.py:61-98).

    :return: (data, transform, crs_ascii, nodata_tag, band_names)
    """
    data = None
    transform = None
    crs = None
    nodata = None
    band_names = None
    if path.lower().endswith((".tif", ".tiff")):
        import logging
        import struct as _struct
        import zlib as _zlib

        try:
            native = _read_tiff_native(path)
        except (ValueError, _struct.error, _zlib.error, KeyError, IndexError) as exc:
            # corrupt stream / unexpected layout: PIL may still read it,
            # but its tag handling differs (no GDAL nodata/band names) —
            # surface the fallback rather than silently changing behavior
            logging.warning("native TIFF reader failed on %s (%s); falling back to PIL", path, exc)
            native = None
        if native is not None:
            arr, tags = native
            data = arr.astype(np.float32)
            transform = _tags_geo_transform(tags)
            crs = tags.get(_T_GEOASCIIPARAMS)
            band_names = _gdal_band_names(tags.get(_T_GDAL_METADATA), arr.shape[0])
            if _T_GDAL_NODATA in tags:
                try:
                    nodata = float(str(tags[_T_GDAL_NODATA]).strip("\x00 "))
                except ValueError:
                    nodata = None

    if data is None:
        img = PILImage.open(path)
        transform = _pil_geo_transform(img)
        tags = getattr(img, "tag_v2", None)
        if tags is not None:
            if _T_GEOASCIIPARAMS in tags:
                crs = str(tags[_T_GEOASCIIPARAMS])
            if _T_GDAL_NODATA in tags:
                try:
                    nodata = float(str(tags[_T_GDAL_NODATA]).strip("\x00 "))
                except ValueError:
                    nodata = None
        frames = []
        n_frames = getattr(img, "n_frames", 1)
        for k in range(n_frames):
            if n_frames > 1:
                img.seek(k)
            arr = np.asarray(img)
            if arr.ndim == 2:
                frames.append(arr)
            else:  # interleaved multi-band (e.g. RGB png)
                frames.extend(arr[..., b] for b in range(arr.shape[-1]))
        data = np.stack(frames).astype(np.float32)

    if window is not None:
        r0, c0, nr, nc = window
        data = data[:, r0 : r0 + nr, c0 : c0 + nc]
        if transform is not None:
            a, b, c, d, e, f = transform
            transform = (a, b, c + a * c0 + b * r0, d, e, f + d * c0 + e * r0)
    return data, transform, crs, nodata, band_names


def read_image_input(
    img_path: str,
    nodata: float = -9999,
    mask_path: Optional[str] = None,
    window: Optional[Tuple[int, int, int, int]] = None,
):
    """Reference-equivalent image ingestion (create_dataset_from_inputs,
    img_tools.py:345-437):

    * nodata pixels (== nodata, or NaN if nodata is NaN/inf) are rewritten to
      -9999 in the image plane;
    * an internal int16 mask is built with the reference convention
      (img_tools.add_mask, img_tools.py:257-316): 0 = valid, 1 = nodata,
      2 = invalidated by the input mask; nodata wins over input-mask.

    :return: (image (bands, rows, cols) f32, msk (rows, cols) int16 or None,
              transform, crs, band_names)
    """
    data, transform, crs, _, band_names = read_raster(img_path, window)
    if np.isnan(nodata):
        no_data_pix = np.isnan(data)
    elif np.isinf(nodata):
        no_data_pix = np.isinf(data)
    else:
        no_data_pix = data == nodata
    no_data_2d = no_data_pix.any(axis=0)

    msk = None
    if mask_path is not None or no_data_2d.any():
        msk = np.zeros(data.shape[-2:], np.int16)
        if mask_path is not None:
            input_mask, *_ = read_raster(mask_path, window)
            msk[input_mask[0] != 0] = 2  # valid_pixels + no_data_mask + 1
        msk[no_data_2d] = 1

    data = np.where(no_data_pix, np.float32(-9999), data)
    return data, msk, transform, crs, band_names


def _pack_entries(entries):
    """entries: list of (tag, type_id, count, packed_value_bytes_or_int)."""
    out = b""
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHI", tag, typ, count)
        if isinstance(value, int):
            out += struct.pack("<I", value)
        else:
            out += (value + b"\x00" * 4)[:4]
    return out


def write_geotiff(
    path: str,
    data: np.ndarray,
    transform: Optional[Tuple[float, ...]] = None,
    crs: Optional[str] = None,
    nodata: Optional[float] = None,
    band_names: Optional[Tuple[str, ...]] = None,
    compression: str = "none",
) -> None:
    """Write a GeoTIFF (single strip), single or multi band
    ((rows, cols) or (bands, rows, cols) pixel-interleaved).

    Supports float32 / float64→float32 / uint8 / uint16 / int16 / int32.
    ``compression``: "none" (default) or "deflate" (zlib, read back by
    this module, rasterio/GDAL and PIL alike)."""
    data = np.asarray(data)
    if data.ndim == 3:
        data = np.moveaxis(data, 0, -1)  # (rows, cols, bands) chunky layout
    elif data.ndim != 2:
        raise ValueError(f"write_geotiff expects 2-D or 3-D data, got {data.shape}")
    if data.dtype == np.float64:
        data = data.astype(np.float32)
    rows, cols = data.shape[:2]
    n_bands = 1 if data.ndim == 2 else data.shape[2]
    itemsize = data.dtype.itemsize
    sample_format = _SAMPLEFORMAT[data.dtype.kind]

    if compression not in ("none", "deflate"):
        raise ValueError(f"unsupported compression {compression!r}")

    # layout: header(8) | IFD | external tag data | pixel data
    entries = [
        (_T_WIDTH, 3, 1, cols),
        (_T_HEIGHT, 3, 1, rows),
        (_T_COMPRESSION, 3, 1, 8 if compression == "deflate" else 1),
        (_T_PHOTOMETRIC, 3, 1, 1),
        (_T_SAMPLESPERPIXEL, 3, 1, n_bands),
        (_T_ROWSPERSTRIP, 3, 1, rows),
        (_T_PLANARCONFIG, 3, 1, 1),
    ]
    external = []  # (tag, type, count, payload_bytes)
    if n_bands <= 2:
        entries.append((_T_BITSPERSAMPLE, 3, n_bands, struct.pack(f"<{n_bands}H", *([itemsize * 8] * n_bands)) if n_bands == 2 else itemsize * 8))
        entries.append((_T_SAMPLEFORMAT, 3, n_bands, struct.pack(f"<{n_bands}H", *([sample_format] * n_bands)) if n_bands == 2 else sample_format))
    else:
        external.append((_T_BITSPERSAMPLE, 3, n_bands, struct.pack(f"<{n_bands}H", *([itemsize * 8] * n_bands))))
        external.append((_T_SAMPLEFORMAT, 3, n_bands, struct.pack(f"<{n_bands}H", *([sample_format] * n_bands))))
    if transform is not None:
        a, b, c, d, e, f = transform
        if b == 0 and d == 0:  # axis-aligned → pixel-scale + tiepoint
            external.append((_T_MODELPIXELSCALE, 12, 3, struct.pack("<3d", a, -e, 0.0)))
            external.append((_T_MODELTIEPOINT, 12, 6, struct.pack("<6d", 0, 0, 0, c, f, 0)))
        else:
            m = [a, b, 0, c, d, e, 0, f, 0, 0, 0, 0, 0, 0, 0, 1]
            external.append((_T_MODELTRANSFORMATION, 12, 16, struct.pack("<16d", *m)))
    if crs is not None:
        ascii_params = (crs + "|").encode() + b"\x00"
        # minimal GeoKeyDirectory: version, citation key pointing at ascii params
        keys = [1, 1, 0, 2, 1024, 0, 1, 2, 2049, 34737, len(ascii_params), 0]
        external.append((_T_GEOKEYDIRECTORY, 3, len(keys), struct.pack(f"<{len(keys)}H", *keys)))
        external.append((_T_GEOASCIIPARAMS, 2, len(ascii_params), ascii_params))
    if nodata is not None:
        nd = (f"{nodata}").encode() + b"\x00"
        external.append((_T_GDAL_NODATA, 2, len(nd), nd))
    if band_names:
        # band descriptions, same GDAL_METADATA XML rasterio/GDAL writes
        # (read back by _gdal_band_names; reference: common.write_data_array
        # band_names, common.py:70-99)
        items = "".join(
            f'<Item name="DESCRIPTION" sample="{i}" role="description">{n}</Item>\n'
            for i, n in enumerate(band_names)
        )
        xml = f"<GDALMetadata>\n{items}</GDALMetadata>\n".encode() + b"\x00"
        external.append((_T_GDAL_METADATA, 2, len(xml), xml))

    n_entries = len(entries) + len(external) + 2  # + strip offsets/bytecounts
    ifd_size = 2 + n_entries * 12 + 4
    ext_off = 8 + ifd_size
    ext_blob = b""
    for tag, typ, count, payload in external:
        if len(payload) <= 4:
            entries.append((tag, typ, count, (payload + b"\x00" * 4)[:4]))
        else:
            entries.append((tag, typ, count, ext_off + len(ext_blob)))
            if len(payload) % 2:
                payload += b"\x00"
            ext_blob += payload

    # strip offsets / byte counts (one strip total keeps the IFD tiny)
    if data.dtype.byteorder == ">":
        data = data.byteswap()
    payload = data.tobytes()
    if compression == "deflate":
        import zlib

        from . import _native

        payload = _native.compress(payload) or zlib.compress(payload, 6)
    data_off = ext_off + len(ext_blob)
    entries.append((_T_STRIPOFFSETS, 4, 1, data_off))
    entries.append((_T_STRIPBYTECOUNTS, 4, 1, len(payload)))

    with open(path, "wb") as fh:
        fh.write(b"II*\x00" + struct.pack("<I", 8))
        fh.write(struct.pack("<H", n_entries))
        fh.write(_pack_entries(entries))
        fh.write(struct.pack("<I", 0))  # next IFD
        fh.write(ext_blob)
        fh.write(payload)
