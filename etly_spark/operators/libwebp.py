"""Lossy-WebP (VP8) decode via the platform libwebp, ctypes-bound.

Same rationale as operators/zstd.py: lossy VP8 is
boolean-arithmetic-coded with empirical probability tables (RFC 6386)
that the spec-table honesty rule forbids reproducing from memory — but
the container ships the REFERENCE implementation (libwebp.so.7), so
binding it gives validated decode with nothing guessed. When no
library loads, the original gate stands.

The binding also makes libwebp an external VALIDATOR for the repo's
from-scratch VP8L codec (operators/webp.py): tests round-trip
our-encoder→libwebp-decoder and libwebp-encoder→our-decoder, far
stronger evidence than the single CPython fixture used in r8.

API surface (all simple-function, ctypes-safe — no structs):
WebPGetInfo, WebPDecodeRGBA, WebPEncodeRGB/WebPEncodeLosslessRGBA
(fixture generation for tests), WebPFree.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from ctypes import POINTER, byref, c_char_p, c_float, c_int, c_size_t, c_uint8, c_void_p

import numpy as np

__all__ = ["available", "decode_rgba", "get_info", "encode_lossy_rgb", "encode_lossless_rgba"]

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("webp")
    if found:
        names.append(found)
    names += ["libwebp.so.7", "libwebp.so", "libwebp.dylib"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.WebPGetInfo.restype = c_int
            lib.WebPGetInfo.argtypes = [c_char_p, c_size_t, POINTER(c_int), POINTER(c_int)]
            lib.WebPDecodeRGBA.restype = POINTER(c_uint8)
            lib.WebPDecodeRGBA.argtypes = [c_char_p, c_size_t, POINTER(c_int), POINTER(c_int)]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [c_void_p]
            lib.WebPEncodeRGB.restype = c_size_t
            lib.WebPEncodeRGB.argtypes = [
                c_char_p, c_int, c_int, c_int, c_float, POINTER(c_void_p),
            ]
            lib.WebPEncodeLosslessRGBA.restype = c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                c_char_p, c_int, c_int, c_int, POINTER(c_void_p),
            ]
            _LIB = lib
            break
        except (OSError, AttributeError):
            continue
    return _LIB


def available() -> bool:
    return _load() is not None


def get_info(data: bytes) -> tuple[int, int] | None:
    lib = _load()
    if lib is None or not data:
        return None
    w, h = c_int(0), c_int(0)
    if not lib.WebPGetInfo(data, len(data), byref(w), byref(h)):
        return None
    return w.value, h.value


def decode_rgba(data: bytes) -> np.ndarray | None:
    """Decode ANY WebP flavor to (h, w, 4) uint8 via the reference
    library; None on malformed input or when no library is present."""
    lib = _load()
    if lib is None or not data:
        return None
    w, h = c_int(0), c_int(0)
    ptr = lib.WebPDecodeRGBA(data, len(data), byref(w), byref(h))
    if not ptr:
        return None
    try:
        n = w.value * h.value * 4
        buf = ctypes.string_at(ptr, n)
    finally:
        lib.WebPFree(ctypes.cast(ptr, c_void_p))
    return np.frombuffer(buf, dtype=np.uint8).reshape(h.value, w.value, 4).copy()


def _encode(fn, raw: bytes, w: int, h: int, stride: int, *extra) -> bytes | None:
    out = c_void_p(0)
    size = fn(raw, w, h, stride, *extra, byref(out))
    if not size or not out:
        return None
    lib = _load()
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)


def encode_lossy_rgb(rgb: np.ndarray, quality: float = 80.0) -> bytes | None:
    """Reference lossy VP8 encode of an (h, w, 3) uint8 array — test
    fixtures for the decode path (no lossy encoder is implemented
    in-repo; the honesty rule stands)."""
    lib = _load()
    if lib is None:
        return None
    h, w, _ = rgb.shape
    raw = np.ascontiguousarray(rgb, dtype=np.uint8).tobytes()
    return _encode(lib.WebPEncodeRGB, raw, w, h, w * 3, c_float(quality))


def encode_lossless_rgba(rgba: np.ndarray) -> bytes | None:
    """Reference VP8L encode of an (h, w, 4) uint8 array — the external
    validator for operators/webp.decode_webp_pixels."""
    lib = _load()
    if lib is None:
        return None
    h, w, _ = rgba.shape
    raw = np.ascontiguousarray(rgba, dtype=np.uint8).tobytes()
    return _encode(lib.WebPEncodeLosslessRGBA, raw, w, h, w * 4)
