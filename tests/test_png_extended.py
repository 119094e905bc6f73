"""Extended-PNG decode tests: palette (PLTE/tRNS), sub-byte and 16-bit
depths, Adam7 interlace (operators/codecs._decode_png).

Fixtures are built by an independent test-side writer (chunk layout,
bit packing and pass extraction re-derived from the spec here, not
shared with the decoder), so agreement is two implementations meeting
— the same twin discipline as the other codecs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etly_spark.operators.codecs import _ADAM7, _decode_png, decode_image_pixels


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    """Pack one row of samples (flat, values < 2^depth) MSB-first."""
    if depth == 8:
        return samples.astype(np.uint8).tobytes()
    if depth == 16:
        return samples.astype(">u2").tobytes()
    bits = np.zeros(len(samples) * depth, dtype=np.uint8)
    for k in range(depth):
        bits[k::depth] = (samples >> (depth - 1 - k)) & 1
    return np.packbits(bits).tobytes()


def _scanlines(img: np.ndarray, depth: int) -> bytes:
    h = img.shape[0]
    flat = img.reshape(h, -1)
    return b"".join(b"\x00" + _pack_row(flat[y], depth) for y in range(h))


def _png(img: np.ndarray, color_type: int, depth: int, plte=None, trns=None,
         interlace=0) -> bytes:
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    if interlace == 0:
        raw = _scanlines(img, depth)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_scanlines(sub, depth))
        raw = b"".join(parts)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", np.asarray(plte, dtype=np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", bytes(trns))
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out


def test_palette_8bit_with_and_without_trns():
    rng = np.random.default_rng(1)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    dec = _decode_png(_png(idx[:, :, None], 3, 8, plte=plte))
    assert np.array_equal(dec, plte[idx])
    trns = bytes([10, 200, 255, 0])
    dec2 = _decode_png(_png(idx[:, :, None], 3, 8, plte=plte, trns=trns))
    assert dec2.shape == (9, 13, 4)
    assert np.array_equal(dec2[:, :, :3], plte[idx])
    want_a = np.full(16, 255, dtype=np.uint8)
    want_a[:4] = np.frombuffer(trns, dtype=np.uint8)
    assert np.array_equal(dec2[:, :, 3], want_a[idx])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_palette_subbyte_depths(depth):
    rng = np.random.default_rng(depth)
    n = 1 << depth
    plte = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (7, 11), dtype=np.uint8)
    dec = _decode_png(_png(idx[:, :, None], 3, depth, plte=plte))
    assert np.array_equal(dec, plte[idx])


@pytest.mark.parametrize("depth,scale", [(1, 255), (2, 85), (4, 17)])
def test_gray_subbyte_scales_exactly(depth, scale):
    rng = np.random.default_rng(depth + 10)
    g = rng.integers(0, 1 << depth, (6, 10), dtype=np.uint8)
    dec = _decode_png(_png(g[:, :, None], 0, depth))
    assert dec.shape == (6, 10)
    assert np.array_equal(dec, (g * scale).astype(np.uint8))


def test_16bit_gray_and_rgb_downshift():
    rng = np.random.default_rng(3)
    g16 = rng.integers(0, 65536, (8, 9), dtype=np.uint16)
    dec = _decode_png(_png(g16[:, :, None], 0, 16))
    assert np.array_equal(dec, (g16 >> 8).astype(np.uint8))
    rgb16 = rng.integers(0, 65536, (5, 6, 3), dtype=np.uint16)
    dec2 = _decode_png(_png(rgb16, 2, 16))
    assert np.array_equal(dec2, (rgb16 >> 8).astype(np.uint8))


@pytest.mark.parametrize("shape", [(16, 16), (13, 17), (1, 1), (2, 3), (7, 1)])
def test_adam7_equals_noninterlaced(shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    plain = _decode_png(_png(img, 2, 8))
    inter = _decode_png(_png(img, 2, 8, interlace=1))
    assert plain is not None and inter is not None
    assert np.array_equal(plain, img) and np.array_equal(inter, img)


def test_adam7_palette_and_gray():
    rng = np.random.default_rng(4)
    plte = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (12, 12), dtype=np.uint8)
    dec = _decode_png(_png(idx[:, :, None], 3, 2, plte=plte, interlace=1))
    assert np.array_equal(dec, plte[idx])
    g = rng.integers(0, 2, (10, 10), dtype=np.uint8)
    dec2 = _decode_png(_png(g[:, :, None], 0, 1, interlace=1))
    assert np.array_equal(dec2, (g * 255).astype(np.uint8))


def test_dispatcher_still_routes():
    rng = np.random.default_rng(5)
    plte = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (4, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_image_pixels(_png(idx[:, :, None], 3, 4, plte=plte)), plte[idx]
    )


def test_corrupt_rejected():
    rng = np.random.default_rng(6)
    plte = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (6, 6), dtype=np.uint8)
    good = _png(idx[:, :, None], 3, 8, plte=plte)
    assert _decode_png(good[: len(good) // 2]) is None
    # palette index out of range -> None, not garbage
    bad_idx = idx.copy()
    bad_idx[0, 0] = 200
    assert _decode_png(_png(bad_idx[:, :, None], 3, 8, plte=plte)) is None
    # paletted file without PLTE -> None
    assert _decode_png(_png(idx[:, :, None], 3, 8)) is None
    # short IDAT (missing a pass) -> None
    img = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    full = _png(img, 2, 8, interlace=1)
    plain = _png(img, 2, 8, interlace=0)
    # claim interlace but provide non-interlaced (shorter) data
    hacked = bytearray(plain)
    hacked[8 + 8 + 12] = 1  # IHDR interlace byte
    # fix IHDR crc
    ihdr = bytes(hacked[16 : 16 + 13])
    struct.pack_into(">I", hacked, 16 + 13, zlib.crc32(b"IHDR" + ihdr))
    assert _decode_png(bytes(hacked)) is None
    assert _decode_png(full) is not None


# ------------------------------------------- libpng cross-validation (r9)


def _libpng():
    """Minimal ctypes harness over libpng's simplified API (png_image —
    a documented FIXED-layout struct since 1.6). Test-only: the product
    decoder needs no library; libpng here is an independent reference
    ENCODER whose adaptive per-row filter choices exercise our
    unfilter paths on real-encoder output."""
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("png16") or ctypes.util.find_library("png")
    if name is None:
        pytest.skip("no libpng on this host")
    lib = ctypes.CDLL(name)

    class PngImage(ctypes.Structure):
        _fields_ = [
            ("opaque", ctypes.c_void_p),
            ("version", ctypes.c_uint32),
            ("width", ctypes.c_uint32),
            ("height", ctypes.c_uint32),
            ("format", ctypes.c_uint32),
            ("flags", ctypes.c_uint32),
            ("colormap_entries", ctypes.c_uint32),
            ("warning_or_error", ctypes.c_uint32),
            ("message", ctypes.c_char * 64),
        ]

    return lib, PngImage


def _libpng_encode_rgba(rgba: np.ndarray) -> bytes:
    import ctypes

    lib, PngImage = _libpng()
    h, w = rgba.shape[:2]
    img = PngImage()
    img.version = 1  # PNG_IMAGE_VERSION
    img.width, img.height = w, h
    img.format = 3  # PNG_FORMAT_RGBA (COLOR|ALPHA)
    raw = np.ascontiguousarray(rgba, dtype=np.uint8).tobytes()
    size = ctypes.c_size_t(0)
    ok = lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, raw, 0, None
    )
    assert ok and size.value, bytes(img.message)
    buf = ctypes.create_string_buffer(size.value)
    ok = lib.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0, raw, 0, None
    )
    assert ok, bytes(img.message)
    return buf.raw[: size.value]


def _libpng_decode_rgba(data: bytes) -> np.ndarray:
    import ctypes

    lib, PngImage = _libpng()
    img = PngImage()
    img.version = 1
    ok = lib.png_image_begin_read_from_memory(ctypes.byref(img), data, len(data))
    assert ok, bytes(img.message)
    img.format = 3  # request RGBA
    out = ctypes.create_string_buffer(img.width * img.height * 4)
    ok = lib.png_image_finish_read(ctypes.byref(img), None, out, 0, None)
    assert ok, bytes(img.message)
    return np.frombuffer(out.raw, np.uint8).reshape(img.height, img.width, 4)


def test_real_libpng_output_decodes_pixel_exact():
    """libpng-encoded files (adaptive per-row filters, real zlib
    stream shapes) decode pixel-exact in our from-scratch decoder —
    independent-reference validation on ENCODER-CHOSEN filter mixes,
    not just our own handcrafted streams."""
    from etly_spark.operators.codecs import _decode_png

    rng = np.random.default_rng(3)
    for shape in ((16, 16), (7, 33), (64, 48)):
        # gradient+noise: makes libpng pick varied filters across rows
        y = np.linspace(0, 255, shape[0], dtype=np.uint8)[:, None, None]
        img = (
            rng.integers(0, 40, (*shape, 4)).astype(np.uint8) + y
        ).astype(np.uint8)
        img[:, :, 3] = 255
        data = _libpng_encode_rgba(img)
        got = _decode_png(data)
        assert got is not None
        got3 = got[:, :, :3] if got.shape[2] >= 3 else got
        assert (got3 == img[:, :, :3]).all()


def test_our_streams_decode_identically_in_libpng():
    """The triangle closes: our handcrafted PNG streams decode to the
    same pixels in libpng as in our decoder (8-bit RGBA + RGB,
    interlaced and not)."""
    from etly_spark.operators.codecs import _decode_png

    rng = np.random.default_rng(9)
    rgba = rng.integers(0, 256, (11, 14, 4), dtype=np.uint8)
    for interlace in (0, 1):
        data = _png(rgba, color_type=6, depth=8, interlace=interlace)
        ours = _decode_png(data)
        ref = _libpng_decode_rgba(data)
        assert (ours == ref).all(), f"interlace={interlace}"
