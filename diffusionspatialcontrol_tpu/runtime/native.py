"""ctypes bindings for the native image codec (native/src/imagecodec.cc).

Builds the shared library on first use (cached under native/build); every
function has a pure-Python fallback so the framework runs without a
toolchain. Used by the serving layer for the device-output -> response-bytes
hot path (uint8 conversion, PNG encoding, preview grids).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libdscimg.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dsc_tensor_to_u8.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.dsc_encode_png.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.c_int,
            ]
            lib.dsc_encode_png.restype = ctypes.c_int64
            lib.dsc_make_grid.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def tensor_to_u8(images: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """fp32 [-1, 1] -> uint8, any shape."""
    arr = np.ascontiguousarray(images, np.float32)
    lib = _load()
    if lib is None:
        return (
            (np.clip(arr * 0.5 + 0.5, 0.0, 1.0) * 255.0) + 0.5
        ).astype(np.uint8)
    out = np.empty(arr.shape, np.uint8)
    lib.dsc_tensor_to_u8(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.size,
        n_threads,
    )
    return out


def encode_png(rgb: np.ndarray, compression: int = 6) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes."""
    arr = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = arr.shape
    assert c == 3
    lib = _load()
    if lib is None:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG",
                                  compress_level=compression)
        return buf.getvalue()
    cap = arr.size + 4096
    out = np.empty(cap, np.uint8)
    n = lib.dsc_encode_png(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        compression,
    )
    if n < 0:
        cap = -n
        out = np.empty(cap, np.uint8)
        n = lib.dsc_encode_png(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            compression,
        )
    if n <= 0:
        raise RuntimeError("native PNG encode failed")
    return bytes(out[:n].tobytes())


def make_grid(images: np.ndarray, cols: int = 4) -> np.ndarray:
    """(N, H, W, 3) uint8 -> contact sheet (rows*H, cols*W, 3)."""
    arr = np.ascontiguousarray(images, np.uint8)
    n, h, w, _ = arr.shape
    rows = (n + cols - 1) // cols
    lib = _load()
    if lib is None:
        out = np.zeros((rows * h, cols * w, 3), np.uint8)
        for i in range(n):
            r, c = divmod(i, cols)
            out[r * h : (r + 1) * h, c * w : (c + 1) * w] = arr[i]
        return out
    out = np.empty((rows * h, cols * w, 3), np.uint8)
    lib.dsc_make_grid(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
