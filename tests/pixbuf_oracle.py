"""Test-only ctypes binding of the system gdk-pixbuf as an EXECUTED
third-party decode oracle (libpng / libjpeg-turbo / libtiff / giflib /
bmp loader behind one flat C API).

This is the counterpart of gdalcubes_spark.libwebp for the remaining
codecs: the skipif(PIL) parity seams never executed in this sandbox
(no Pillow), but gdk-pixbuf + its loaders ARE here, so the "a real
image library reads our streams / we read real-library streams"
claims become executed tests instead of skipped ones.

Loader notes (checked against this container's loader dir):
- png / jpeg are built into gdk-pixbuf core (libpng16, libjpeg-turbo 62)
- gif / bmp / tiff are plugin loaders (giflib 7, libtiff 6)
- the tiff loader promotes everything to RGBA (alpha added); callers
  compare the leading bands
- animation: GdkPixbufAnimation iterates composited frames (the gif
  loader applies palettes/disposal itself) — used as the oracle for the
  multi-frame GIF decode path
"""
from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

_lib = None


def load():
    """The bound gdk-pixbuf CDLL, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        g = ctypes.CDLL("libgdk_pixbuf-2.0.so.0")
    except OSError:
        return None
    g.gdk_pixbuf_new_from_file.restype = ctypes.c_void_p
    g.gdk_pixbuf_new_from_file.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    g.gdk_pixbuf_get_pixels.restype = ctypes.POINTER(ctypes.c_uint8)
    g.gdk_pixbuf_get_pixels.argtypes = [ctypes.c_void_p]
    for fn in ("gdk_pixbuf_get_width", "gdk_pixbuf_get_height",
               "gdk_pixbuf_get_rowstride", "gdk_pixbuf_get_n_channels"):
        getattr(g, fn).restype = ctypes.c_int
        getattr(g, fn).argtypes = [ctypes.c_void_p]
    g.g_object_unref.restype = None
    g.g_object_unref.argtypes = [ctypes.c_void_p]
    g.gdk_pixbuf_new_from_data.restype = ctypes.c_void_p
    g.gdk_pixbuf_new_from_data.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]
    # varargs NULL-terminated (key, value, ..., NULL) option list
    g.gdk_pixbuf_save.restype = ctypes.c_int
    # animation API
    g.gdk_pixbuf_animation_new_from_file.restype = ctypes.c_void_p
    g.gdk_pixbuf_animation_new_from_file.argtypes = [ctypes.c_char_p,
                                                     ctypes.c_void_p]
    g.gdk_pixbuf_animation_get_iter.restype = ctypes.c_void_p
    g.gdk_pixbuf_animation_get_iter.argtypes = [ctypes.c_void_p,
                                                ctypes.c_void_p]
    g.gdk_pixbuf_animation_iter_get_pixbuf.restype = ctypes.c_void_p
    g.gdk_pixbuf_animation_iter_get_pixbuf.argtypes = [ctypes.c_void_p]
    g.gdk_pixbuf_animation_iter_get_delay_time.restype = ctypes.c_int
    g.gdk_pixbuf_animation_iter_get_delay_time.argtypes = [ctypes.c_void_p]
    g.gdk_pixbuf_animation_iter_advance.restype = ctypes.c_int
    g.gdk_pixbuf_animation_iter_advance.argtypes = [ctypes.c_void_p,
                                                    ctypes.c_void_p]
    g.gdk_pixbuf_animation_iter_on_currently_loading_frame.restype = \
        ctypes.c_int
    g.gdk_pixbuf_animation_iter_on_currently_loading_frame.argtypes = \
        [ctypes.c_void_p]
    _lib = g
    return g


def _pixbuf_to_planes(g, pb) -> np.ndarray:
    w, h = g.gdk_pixbuf_get_width(pb), g.gdk_pixbuf_get_height(pb)
    rs, nc = g.gdk_pixbuf_get_rowstride(pb), g.gdk_pixbuf_get_n_channels(pb)
    buf = np.ctypeslib.as_array(g.gdk_pixbuf_get_pixels(pb), shape=(h, rs))
    return np.moveaxis(buf[:, :w * nc].reshape(h, w, nc).copy(), -1, 0)


def decode(data: bytes, suffix: str) -> np.ndarray | None:
    """bytes → (nc, h, w) uint8 planes via the system loaders, or None if
    gdk-pixbuf (or the loader for this format) is unavailable.  nc is
    whatever the loader produces (grey→1|3, rgb→3, rgba/tiff→4)."""
    g = load()
    if g is None:
        return None
    path = tempfile.mktemp(suffix="." + suffix.lstrip("."))
    try:
        with open(path, "wb") as f:
            f.write(data)
        pb = g.gdk_pixbuf_new_from_file(path.encode(), None)
        if not pb:
            return None
        try:
            return _pixbuf_to_planes(g, pb)
        finally:
            g.g_object_unref(pb)
    finally:
        if os.path.exists(path):
            os.unlink(path)


def encode(planes: np.ndarray, fmt: str, **options: str) -> bytes | None:
    """(3|4, h, w) uint8 planes → encoded bytes via the system encoders
    (libpng / libjpeg-turbo / libtiff / bmp writer), or None if
    unavailable.  `fmt` is a gdk-pixbuf writer type: "png", "jpeg",
    "tiff", "bmp".  Options are writer-specific strings, e.g.
    encode(a, "jpeg", quality="90")."""
    g = load()
    if g is None:
        return None
    nb, h, w = planes.shape
    if nb not in (3, 4):
        raise ValueError("pixbuf encode takes RGB or RGBA planes")
    inter = np.ascontiguousarray(np.moveaxis(planes, 0, -1))
    buf = inter.tobytes()  # new_from_data does NOT copy — keep alive
    pb = g.gdk_pixbuf_new_from_data(buf, 0, int(nb == 4), 8,
                                    w, h, w * nb, None, None)
    if not pb:
        return None
    path = tempfile.mktemp(suffix="." + fmt)
    try:
        argv: list = [ctypes.c_void_p(pb), path.encode(), fmt.encode(),
                      None]
        for k, v in options.items():
            argv += [k.encode(), v.encode()]
        argv.append(None)
        if not g.gdk_pixbuf_save(*argv):
            return None
        with open(path, "rb") as f:
            return f.read()
    finally:
        g.g_object_unref(pb)
        if os.path.exists(path):
            os.unlink(path)


def decode_animation(data: bytes, suffix: str,
                     max_frames: int = 64) -> list[np.ndarray] | None:
    """bytes → list of composited (nc, h, w) frames via GdkPixbufAnimation
    (GTimeVal advance at each frame's delay), or None if unavailable.

    The iterator yields FULLY COMPOSITED frames — the loader has already
    applied disposal/blending — which is exactly the contract our own
    multi-frame decode exposes."""
    g = load()
    if g is None:
        return None

    class _GTimeVal(ctypes.Structure):
        _fields_ = [("tv_sec", ctypes.c_long), ("tv_usec", ctypes.c_long)]

    path = tempfile.mktemp(suffix="." + suffix.lstrip("."))
    try:
        with open(path, "wb") as f:
            f.write(data)
        anim = g.gdk_pixbuf_animation_new_from_file(path.encode(), None)
        if not anim:
            return None
        try:
            t = _GTimeVal(0, 0)
            it = g.gdk_pixbuf_animation_get_iter(anim, ctypes.byref(t))
            frames = []
            for _ in range(max_frames):
                pb = g.gdk_pixbuf_animation_iter_get_pixbuf(it)
                if not pb:
                    break
                frames.append(_pixbuf_to_planes(g, pb))
                delay_ms = g.gdk_pixbuf_animation_iter_get_delay_time(it)
                if delay_ms < 0:  # static image / end of animation
                    break
                usec = t.tv_usec + delay_ms * 1000
                t = _GTimeVal(t.tv_sec + usec // 1_000_000, usec % 1_000_000)
                if not g.gdk_pixbuf_animation_iter_advance(it,
                                                           ctypes.byref(t)):
                    break  # advancing no longer changes the frame
            g.g_object_unref(it)
            return frames
        finally:
            g.g_object_unref(anim)
    finally:
        if os.path.exists(path):
            os.unlink(path)
