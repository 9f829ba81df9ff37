"""ctypes binding for the first-party C++ JPEG decoder (native/jpeg).

Build with ``make -C native/jpeg``. Select at runtime with
FASTDET_JPEG_BACKEND=native; jpeg.decode_rgb falls back to cv2/PIL when
the library is missing or the file is outside the baseline-sequential
subset the native decoder supports.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "jpeg", "libfd_jpeg.so",
)

_lib: Optional[ctypes.CDLL] = None


class NativeJpegUnavailable(RuntimeError):
    pass


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            raise NativeJpegUnavailable(
                f"{_LIB_PATH} not built (run: make -C native/jpeg)"
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fd_jpeg_info.restype = ctypes.c_int
        lib.fd_jpeg_info.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.fd_jpeg_decode_rgb.restype = ctypes.c_int
        lib.fd_jpeg_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeJpegUnavailable:
        return False


def info(data: bytes) -> Tuple[int, int, int]:
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.fd_jpeg_info(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"fd_jpeg_info failed: rc={rc}")
    return w.value, h.value, c.value


def decode_rgb(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to RGB uint8 (H, W, 3)."""
    lib = _load()
    w, h, _ = info(data)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.fd_jpeg_decode_rgb(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.nbytes,
    )
    if rc != 0:
        raise ValueError(f"fd_jpeg_decode_rgb failed: rc={rc}")
    return out
