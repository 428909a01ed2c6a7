"""Optional ctypes binding to a SYSTEM libwebp, when one exists.

Two jobs:
1. External verifier for the in-repo pure-numpy WebP codecs (webpcodec.py):
   the parity tests that were skipif-guarded on Pillow now execute against
   libwebp directly wherever the shared library is installed — "our VP8L
   streams decode in libwebp and vice versa" is an executed assertion, not
   a claim.
2. Reference-output generator for the lossy VP8 (key-frame) decoder:
   WebPEncodeRGB produces genuine lossy VP8 bitstreams and WebPDecodeRGBA
   their spec-exact reconstruction (VP8 decoding is bit-exact by
   construction, RFC 6386 §2), giving in-sandbox golden vectors.

This is NOT a production decode path by default — codecs.decode stays
pure-Python so the engine has no native dependency; swapping this in at
that seam on a real cluster is the documented deployment option.

All ABI surface used here is the public, stable libwebp simple API
(decode.h / encode.h): WebPDecodeRGBA, WebPEncodeLosslessRGBA,
WebPEncodeRGB, WebPGetInfo, WebPFree.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_LIB_NAMES = ("libwebp.so.7", "libwebp.so", "libwebp.dylib", "webp")
_lib = None
_lib_tried = False


def load() -> Optional[ctypes.CDLL]:
    """The system libwebp handle, or None if absent (cached)."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    for name in _LIB_NAMES:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            _bind(lib)
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    return load() is not None


def _bind(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.restype = u8p
    lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_int,
                                           ctypes.POINTER(u8p)]
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_float,
                                  ctypes.POINTER(u8p)]
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_int,
                                   ctypes.c_float, ctypes.POINTER(u8p)]
    u8pp = ctypes.POINTER(u8p)
    lib.WebPDecodeYUV.restype = u8p
    lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int),
                                  u8pp, u8pp,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.WebPGetInfo.restype = ctypes.c_int
    lib.WebPGetInfo.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]


def decode_rgba(data: bytes) -> np.ndarray:
    """WebP bytes (VP8 or VP8L) → uint8 (4, h, w) in RGBA plane order."""
    lib = load()
    if lib is None:
        raise RuntimeError("no system libwebp available")
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp failed to decode stream")
    try:
        n = w.value * h.value * 4
        buf = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return buf.reshape(h.value, w.value, 4).transpose(2, 0, 1)


def decode_yuv(data: bytes) -> tuple:
    """WebP bytes → (y, u, v) uint8 planes — the spec-exact VP8 output.

    VP8 decoding is bit-exact by construction (RFC 6386 §2) in YUV420
    space; the RGB conversion is implementation-defined.  This is the
    parity oracle for the pure-Python key-frame decoder (vp8codec.py).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("no system libwebp available")
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(stride), ctypes.byref(uv_stride))
    if not yp:
        raise ValueError("libwebp failed to decode stream (YUV)")
    try:
        W, H, s, us = w.value, h.value, stride.value, uv_stride.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        y = np.ctypeslib.as_array(yp, shape=(H * s,)).reshape(H, s)[:, :W].copy()
        u = np.ctypeslib.as_array(up, shape=(ch * us,)).reshape(ch, us)[:, :cw].copy()
        v = np.ctypeslib.as_array(vp, shape=(ch * us,)).reshape(ch, us)[:, :cw].copy()
    finally:
        lib.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return y, u, v


def _rgb_hw3(a: np.ndarray) -> np.ndarray:
    """(1|3, h, w) planes → contiguous (h, w, 3) uint8."""
    if a.ndim != 3:
        raise ValueError("expected (nb, h, w)")
    if a.shape[0] == 1:
        a = np.repeat(a, 3, axis=0)
    if a.shape[0] != 3:
        raise ValueError("expected 1 or 3 bands")
    return np.ascontiguousarray(a.transpose(1, 2, 0)).astype(np.uint8)


def encode_lossless_rgba(a: np.ndarray) -> bytes:
    """uint8 (1|3|4, h, w) planes → lossless WebP (VP8L) bytes via libwebp."""
    lib = load()
    if lib is None:
        raise RuntimeError("no system libwebp available")
    if a.shape[0] == 4:
        argb = a
        rgba = np.ascontiguousarray(np.stack([argb[1], argb[2], argb[3], argb[0]], axis=-1))
    else:
        rgb = _rgb_hw3(a)
        rgba = np.concatenate([rgb, np.full(rgb.shape[:2] + (1,), 255, np.uint8)], axis=-1)
        rgba = np.ascontiguousarray(rgba)
    h, w = rgba.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(rgba.tobytes(), w, h, w * 4, ctypes.byref(out))
    if n == 0:
        raise ValueError("libwebp lossless encode failed")
    try:
        return bytes(np.ctypeslib.as_array(out, shape=(n,)))
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def encode_lossy_rgba(a: np.ndarray, quality: float = 75.0) -> bytes:
    """uint8 (4, h, w) ARGB planes → LOSSY WebP (VP8 key frame + ALPH
    alpha chunk in a VP8X container) via libwebp — the test-vector
    generator for the ALPH decode path."""
    lib = load()
    if lib is None:
        raise RuntimeError("no system libwebp available")
    if a.ndim != 3 or a.shape[0] != 4:
        raise ValueError("expected (4, h, w) ARGB planes")
    rgba = np.ascontiguousarray(
        np.stack([a[1], a[2], a[3], a[0]], axis=-1))
    h, w = rgba.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba.tobytes(), w, h, w * 4,
                           ctypes.c_float(quality), ctypes.byref(out))
    if n == 0:
        raise ValueError("libwebp lossy RGBA encode failed")
    try:
        return bytes(np.ctypeslib.as_array(out, shape=(n,)))
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def encode_lossy_rgb(a: np.ndarray, quality: float = 75.0) -> bytes:
    """uint8 (1|3, h, w) planes → LOSSY WebP (VP8 key frame) via libwebp."""
    lib = load()
    if lib is None:
        raise RuntimeError("no system libwebp available")
    rgb = _rgb_hw3(a)
    h, w = rgb.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb.tobytes(), w, h, w * 3, ctypes.c_float(quality),
                          ctypes.byref(out))
    if n == 0:
        raise ValueError("libwebp lossy encode failed")
    try:
        return bytes(np.ctypeslib.as_array(out, shape=(n,)))
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
