"""TIFF 6.0 codec tests (operators/codecs).

Every supported compression (none / LZW-with-EarlyChange / PackBits)
is lossless, so all round-trips assert exact equality — including the
LZW width transitions at 510/1022/2046 (the EarlyChange off-by-one
that breaks naive GIF-LZW ports) and the 12-bit table reset.
"""

from __future__ import annotations

import numpy as np
import pytest

from etly_spark.operators.codecs import (
    _decode_tiff,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    _tiff_packbits_decode,
    _tiff_packbits_encode,
    decode_image_pixels,
    encode_tiff,
)
from etly_spark.operators.multimodal import parse_image_header


def _img(h, w, nch=1, seed=1):
    rng = np.random.default_rng(seed)
    shape = (h, w, nch) if nch > 1 else (h, w)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("nch", [1, 3, 4])
@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_exact(nch, comp, big_endian):
    img = _img(23, 31, nch)
    dec = _decode_tiff(encode_tiff(img, compression=comp, big_endian=big_endian))
    assert dec is not None and np.array_equal(dec, img)


def test_predictor_helps_and_roundtrips():
    smooth = np.clip(np.add.outer(np.arange(64) * 2, np.arange(80)), 0, 255).astype(
        np.uint8
    )
    with_pred = encode_tiff(smooth, compression=5, predictor=2)
    without = encode_tiff(smooth, compression=5, predictor=1)
    assert len(with_pred) < len(without)
    assert np.array_equal(_decode_tiff(with_pred), smooth)
    # rgb predictor differs per sample plane
    rgb = np.dstack([smooth, smooth[::-1], smooth.T[: 64, : 80] if False else smooth])
    dec = _decode_tiff(encode_tiff(rgb, compression=5, predictor=2))
    assert np.array_equal(dec, rgb)


def test_lzw_width_transitions_and_reset():
    rng = np.random.default_rng(2)
    # random bytes grow the table one entry per ~emission: 40k input
    # crosses 510/1022/2046 and the 4094 table reset multiple times
    for n in (1, 509, 510, 511, 1023, 5000, 40000):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _tiff_lzw_decode(_tiff_lzw_encode(d), n) == d, n
    # repetitive data exercises the prefix-extend (code == len(table))
    d = b"abcabcabcabc" * 400
    assert _tiff_lzw_decode(_tiff_lzw_encode(d), len(d)) == d


def test_packbits_runs_and_literals():
    cases = [
        b"",
        b"x",
        b"a" * 300,
        b"abcdef",
        b"aabbaabb" + b"z" * 130 + b"qr",
    ]
    for d in cases:
        assert _tiff_packbits_decode(_tiff_packbits_encode(d), len(d) + 1) == d


def test_multi_strip_and_single_strip():
    img = _img(50, 40, 3, seed=3)
    for rps in (1, 7, 16, 50, 64):
        dec = _decode_tiff(encode_tiff(img, rows_per_strip=rps))
        assert np.array_equal(dec, img), rps


def test_white_is_zero_inversion():
    # hand-flip PhotometricInterpretation to 0 -> decoder must invert
    img = _img(8, 8, seed=4)
    enc = bytearray(encode_tiff(img, compression=1))
    # find tag 262 in the IFD and set its value to 0
    import struct

    (ifd,) = struct.unpack_from("<I", enc, 4)
    (n_tags,) = struct.unpack_from("<H", enc, ifd)
    for t in range(n_tags):
        off = ifd + 2 + 12 * t
        (tag,) = struct.unpack_from("<H", enc, off)
        if tag == 262:
            struct.pack_into("<H", enc, off + 8, 0)
    dec = _decode_tiff(bytes(enc))
    assert np.array_equal(dec, 255 - img)


def test_dispatcher_and_header_parse():
    img = _img(12, 34, 3, seed=5)
    for be in (False, True):
        enc = encode_tiff(img, big_endian=be)
        assert np.array_equal(decode_image_pixels(enc), img)
        assert parse_image_header(enc) == ("tiff", 34, 12)


def test_corrupt_and_unsupported_rejected():
    img = _img(10, 10)
    enc = encode_tiff(img)
    assert _decode_tiff(enc[:30]) is None
    assert _decode_tiff(b"II*\x00" + b"\xff" * 30) is None
    assert _decode_tiff(b"ohno" + enc[4:]) is None
    # 16-bit samples unsupported -> None, not garbage
    import struct

    bad = bytearray(enc)
    (ifd,) = struct.unpack_from("<I", bad, 4)
    (n_tags,) = struct.unpack_from("<H", bad, ifd)
    for t in range(n_tags):
        off = ifd + 2 + 12 * t
        if struct.unpack_from("<H", bad, off)[0] == 258:
            struct.pack_into("<H", bad, off + 8, 16)
    assert _decode_tiff(bytes(bad)) is None


def test_lzw_eoi_width_at_exact_boundary():
    """Regression: when next_code lands exactly on an EarlyChange width
    boundary (510/1022/2046) at end-of-data, the decoder appends the
    final code's table entry and widens BEFORE reading EOI — the
    encoder must emit EOI at the widened width (hypothesis-found with
    an RGBA 12x16 image, LZW, rows_per_strip=4)."""
    import numpy as np

    from etly_spark.operators.codecs import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        decode_image_pixels,
        encode_tiff,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (12, 16, 4), dtype=np.uint8)
    enc = encode_tiff(img, compression=5, big_endian=False, rows_per_strip=4)
    dec = decode_image_pixels(enc)
    assert dec is not None and np.array_equal(dec, img)
    # raw-stream pin: incompressible strips of many lengths cross every
    # 9->10 boundary alignment
    for n in range(240, 280):
        data = rng.integers(0, 256, n * 4, dtype=np.uint8).tobytes()
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data
