"""ctypes bridge to the native raster codec (native/raster_codec.cpp).

Built lazily with g++ on first use; every caller must handle ``lib() is
None`` (no compiler, build failure) by falling back to the pure-Python
path, so the package stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "raster_codec.cpp")
_SO = os.path.join(_NATIVE_DIR, "libraster_codec.so")

_lock = threading.Lock()
_lib: object = None  # None = not tried, False = unavailable, else CDLL


def lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is False:
        return None
    if _lib is not None:
        return _lib  # type: ignore[return-value]
    with _lock:
        if _lib is not None:
            return _lib if _lib is not False else None  # type: ignore[return-value]
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-march=native",
                        "-shared",
                        "-fPIC",
                        _SRC,
                        "-o",
                        _SO,
                        "-lz",
                        "-lpthread",
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            cdll = ctypes.CDLL(_SO)
            cdll.decode_chunks.restype = ctypes.c_int
            cdll.decode_chunks.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            _lib = cdll
        except Exception:
            _lib = False
            return None
    return _lib  # type: ignore[return-value]


def decode_chunks(
    raw: bytes,
    src_offsets: Sequence[int],
    src_lengths: Sequence[int],
    dst_sizes: Sequence[int],
    compression: int,
    n_threads: int = 0,
) -> Optional[List[np.ndarray]]:
    """Decompress every chunk in parallel; returns per-chunk uint8 views
    into one backing buffer, or None if the native library is unavailable
    (caller falls back to Python zlib)."""
    cdll = lib()
    if cdll is None:
        return None
    n = len(src_offsets)
    dc = np.ascontiguousarray(np.asarray(dst_sizes, np.int64))
    dst_off = np.zeros(n, np.int64)
    if n > 1:
        np.cumsum(dc[:-1], out=dst_off[1:])
    out = np.zeros(int(dc.sum()), np.uint8)
    so = np.ascontiguousarray(np.asarray(src_offsets, np.int64))
    sl = np.ascontiguousarray(np.asarray(src_lengths, np.int64))
    if n_threads <= 0:
        n_threads = min(32, os.cpu_count() or 1)
    rc = cdll.decode_chunks(
        raw,
        so.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        compression,
        out.ctypes.data_as(ctypes.c_char_p),
        n_threads,
    )
    if rc != 0:
        return None
    return [out[int(o) : int(o) + int(s)] for o, s in zip(dst_off, dst_sizes)]


def compress(src: bytes, level: int = 6) -> Optional[bytes]:
    """zlib-deflate via the native library (GeoTIFF deflate write path);
    None if unavailable (caller falls back to Python zlib)."""
    cdll = lib()
    if cdll is None:
        return None
    try:
        cdll.compress_buffer.restype = ctypes.c_int64
        cdll.compress_buffer.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        cap = len(src) + (len(src) >> 10) + 64
        dst = ctypes.create_string_buffer(cap)
        n = cdll.compress_buffer(src, len(src), dst, cap, level)
        if n <= 0:
            return None
        return dst.raw[: int(n)]
    except Exception:
        return None
