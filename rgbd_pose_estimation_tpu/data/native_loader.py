"""ctypes binding for the native C++ PNG decode core (native/rgbd_native.cpp).

Builds the shared library on demand with the repo Makefile (g++ + libpng are
part of the toolchain) and caches the handle; every entry point falls back
to OpenCV transparently if the native library is unavailable, so the
framework never hard-depends on the build step.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librgbd_native.so")

_lock = threading.Lock()
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rgbd_png_dims.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.rgbd_decode_depth16.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int64,
            ]
            lib.rgbd_decode_gray8.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            if lib.rgbd_version() != 1:
                raise RuntimeError("native ABI mismatch")
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def _dims(lib, path: str):
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.rgbd_png_dims(
        path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch), ctypes.byref(bd)
    )
    if rc != 0:
        raise IOError(f"rgbd_png_dims({path}) -> {rc}")
    return w.value, h.value, ch.value, bd.value


def decode_depth16(path: str) -> np.ndarray:
    """16-bit TUM depth PNG → (H, W) uint16 (native; cv2 fallback)."""
    lib = _load()
    if lib is None:
        import cv2

        return cv2.imread(path, cv2.IMREAD_UNCHANGED)
    w, h, _, _ = _dims(lib, path)
    out = np.empty((h, w), np.uint16)
    rc = lib.rgbd_decode_depth16(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out.size
    )
    if rc != 0:
        raise IOError(f"rgbd_decode_depth16({path}) -> {rc}")
    return out


def decode_gray8(path: str) -> np.ndarray:
    """Any PNG → (H, W) uint8 luma (native; cv2 fallback)."""
    lib = _load()
    if lib is None:
        import cv2

        img = cv2.imread(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    w, h, _, _ = _dims(lib, path)
    out = np.empty((h, w), np.uint8)
    rc = lib.rgbd_decode_gray8(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size
    )
    if rc != 0:
        raise IOError(f"rgbd_decode_gray8({path}) -> {rc}")
    return out
