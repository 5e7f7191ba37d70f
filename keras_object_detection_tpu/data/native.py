"""ctypes binding to the native C++ loader (native/kot_loader.cpp).

Builds the shared library on first use (g++ + system libjpeg; ~1s) and caches
it next to the source. Falls back silently if a toolchain/libjpeg is missing —
``data.reader`` then uses cv2/PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libkot_loader.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.kot_decode_resize_file.restype = ctypes.c_int
        lib.kot_decode_resize_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.kot_load_batch.restype = ctypes.c_int
        lib.kot_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resize_file(path: str, out_h: int, out_w: int) -> np.ndarray:
    """Decode + resize one JPEG to (out_h, out_w, 3) RGB uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.kot_decode_resize_file(
        path.encode(), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path!r}")
    return out


def load_batch(paths: List[str], out_h: int, out_w: int,
               n_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel decode of a batch of JPEG files on the C++ thread pool.

    Returns ``(images (N, out_h, out_w, 3) u8, ok (N,) bool)``.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.kot_load_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return out, status == 0
