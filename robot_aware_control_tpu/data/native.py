"""ctypes bindings for the native data-path kernels (native/resize.cpp).

Compiles on first use with the system C++ toolchain and caches the shared
object next to the source; falls back cleanly when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        src = os.path.join(here, "native", "resize.cpp")
        so = os.path.join(here, "native", "_resize.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["c++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.bilinear_resize_batch_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def bilinear_resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """img (H, W[, C]) any numeric dtype -> (h, w[, C]) float32, bilinear
    with half-pixel centers (torchvision/cv2 semantics)."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native resize unavailable")
    squeeze = img.ndim == 2
    x = np.ascontiguousarray(img[..., None] if squeeze else img, np.float32)
    H, W, C = x.shape
    out = np.empty((h, w, C), np.float32)
    lib.bilinear_resize_batch_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 1, H, W, C,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
    )
    return out[..., 0] if squeeze else out


def bilinear_resize_batch(imgs: np.ndarray, w: int, h: int) -> np.ndarray:
    """imgs (N, H, W, C) -> (N, h, w, C) float32."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native resize unavailable")
    x = np.ascontiguousarray(imgs, np.float32)
    N, H, W, C = x.shape
    out = np.empty((N, h, w, C), np.float32)
    lib.bilinear_resize_batch_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), N, H, W, C,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
    )
    return out
