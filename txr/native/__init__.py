"""ctypes bindings for the native image codec (txr/native/imageio.cpp).

Auto-builds the shared library on first import if a toolchain is present;
falls back cleanly (``AVAILABLE = False``) so pure-Python paths (PIL) keep
working.  This is the counterpart of the reference's vendored stb_image
(SURVEY §2.3): image decode/encode as native code under a thin binding.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtxr_native.so")

_lib = None
AVAILABLE = False


def _build():
    subprocess.run(
        ["make", "-C", _DIR, "-s"], check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            _build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.txr_png_encode.restype = ctypes.c_size_t
    lib.txr_png_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.txr_png_decode.restype = ctypes.c_void_p
    lib.txr_png_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.txr_jpeg_decode.restype = ctypes.c_void_p
    lib.txr_jpeg_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.txr_f32_to_u8.restype = None
    lib.txr_f32_to_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    lib.txr_free.restype = None
    lib.txr_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    AVAILABLE = True
    return lib


def png_encode(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """[H,W,3|4] uint8 → PNG bytes (native)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native imageio unavailable")
    pixels = np.ascontiguousarray(pixels, np.uint8)
    h, w, c = pixels.shape
    out = ctypes.c_void_p()
    n = lib.txr_png_encode(
        pixels.ctypes.data_as(ctypes.c_void_p), h, w, c, compress_level,
        ctypes.byref(out),
    )
    if not n:
        raise RuntimeError("png encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.txr_free(out)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → [H,W,C] uint8 (native; 8-bit non-interlaced)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native imageio unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = ctypes.c_void_p(
        lib.txr_png_decode(data, len(data), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    )
    if not buf:
        raise RuntimeError("png decode failed")
    try:
        raw = ctypes.string_at(buf, h.value * w.value * c.value)
    finally:
        lib.txr_free(buf)
    return np.frombuffer(raw, np.uint8).reshape(h.value, w.value, c.value).copy()


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → [H,W,C] uint8 (C = 1 or 3).  Native
    (txr/native/jpeg.cpp — the stb_image-equivalent for the reference's
    shipped JPEG assets, GLWrapper.cpp:284-354).  Raises on progressive /
    arithmetic / 12-bit streams — callers fall back to PIL."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native imageio unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = ctypes.c_void_p(
        lib.txr_jpeg_decode(data, len(data), ctypes.byref(h), ctypes.byref(w),
                            ctypes.byref(c))
    )
    if not buf:
        raise RuntimeError("jpeg decode failed (unsupported or corrupt)")
    try:
        raw = ctypes.string_at(buf, h.value * w.value * c.value)
    finally:
        lib.txr_free(buf)
    return np.frombuffer(raw, np.uint8).reshape(h.value, w.value, c.value).copy()


def f32_to_u8(img: np.ndarray) -> np.ndarray:
    """float32 [0,1] → uint8 with clamping (native hot path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native imageio unavailable")
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty(img.shape, np.uint8)
    lib.txr_f32_to_u8(
        img.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p), img.size
    )
    return out


def save_png(path, img_f32_or_u8):
    """Fast PNG save using the native codec."""
    arr = np.asarray(img_f32_or_u8)
    if arr.dtype != np.uint8:
        arr = f32_to_u8(arr)
    with open(path, "wb") as f:
        f.write(png_encode(arr))
    return path


# try to load eagerly but never fail import
_load()
