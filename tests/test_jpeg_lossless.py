"""Lossless JPEG (SOF3, T.81 Annex H) tests.

The process is exactly reversible, so every encode->decode assertion
is exact equality at full precision — including 12/16-bit samples the
baseline/progressive paths can't represent. Covers all 7 predictors,
multi-component interleave, the modulo-2^16 wraparound (SSSS=16), the
point transform, restart intervals, and the uint8 display conversion
used by the feature pipeline.
"""

from __future__ import annotations

import numpy as np
import pytest

from etly_spark.operators.codecs import (
    _decode_jpeg,
    decode_image_pixels,
    decode_lossless_jpeg,
    encode_lossless_jpeg,
)


def _gray(h, w, seed=1, hi=256, dtype=np.uint8):
    return np.random.default_rng(seed).integers(0, hi, (h, w)).astype(dtype)


@pytest.mark.parametrize("predictor", range(1, 8))
def test_all_predictors_exact_gray8(predictor):
    img = _gray(23, 31)
    out = decode_lossless_jpeg(encode_lossless_jpeg(img, predictor=predictor))
    assert out is not None
    dec, prec = out
    assert prec == 8 and np.array_equal(dec, img.astype(np.uint16))


def test_rgb_interleaved_exact():
    rgb = np.random.default_rng(2).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec, prec = decode_lossless_jpeg(encode_lossless_jpeg(rgb))
    assert prec == 8 and np.array_equal(dec, rgb.astype(np.uint16))


@pytest.mark.parametrize("precision,hi", [(12, 4096), (16, 65536)])
def test_high_precision_exact(precision, hi):
    img = _gray(20, 17, seed=3, hi=hi, dtype=np.uint16)
    dec, prec = decode_lossless_jpeg(encode_lossless_jpeg(img, precision=precision))
    assert prec == precision and np.array_equal(dec, img)


def test_smooth_16bit_compresses():
    # the format's real-world home: high-precision smooth rasters
    # (DICOM/DNG) where prediction leaves tiny residuals
    rng = np.random.default_rng(4)
    img = (
        (np.cumsum(rng.integers(-40, 40, (64, 64)), axis=1) + 32768)
        .clip(0, 65535)
        .astype(np.uint16)
    )
    enc = encode_lossless_jpeg(img, predictor=4)
    assert len(enc) < 0.75 * img.size * 2
    dec, _ = decode_lossless_jpeg(enc)
    assert np.array_equal(dec, img)


def test_mod_65536_wraparound_ssss16():
    # extreme alternation forces |diff| == 32768 (SSSS=16, no extra
    # bits) and exercises the modulo-2^16 reconstruction
    img = np.tile([0, 32768], 32).reshape(8, 8).astype(np.uint16)
    dec, prec = decode_lossless_jpeg(encode_lossless_jpeg(img, predictor=1))
    assert prec == 16 and np.array_equal(dec, img)


def test_restart_intervals_whole_rows():
    img = _gray(23, 31, seed=5)
    enc = encode_lossless_jpeg(img, restart_rows=5)
    assert b"\xff\xdd" in enc  # DRI present
    dec, _ = decode_lossless_jpeg(enc)
    assert np.array_equal(dec, img.astype(np.uint16))


def test_display_path_uint8_and_pipeline():
    rgb = np.random.default_rng(6).integers(0, 256, (12, 14, 3), dtype=np.uint8)
    enc = encode_lossless_jpeg(rgb)
    d8 = _decode_jpeg(enc)
    assert d8.dtype == np.uint8 and np.array_equal(d8, rgb)
    # 16-bit input downshifts to its top byte for the uint8 pipeline
    img16 = _gray(9, 9, seed=7, hi=65536, dtype=np.uint16)
    d = _decode_jpeg(encode_lossless_jpeg(img16))
    assert d is not None and np.array_equal(d, (img16 >> 8).astype(np.uint8))
    # and the generic magic-byte dispatcher routes SOF3 correctly
    px = decode_image_pixels(enc)
    assert px is not None and np.array_equal(px, rgb)


def test_corrupt_streams_rejected():
    img = _gray(8, 8, seed=8)
    enc = bytearray(encode_lossless_jpeg(img))
    assert decode_lossless_jpeg(bytes(enc)) is not None
    # truncated entropy data
    assert decode_lossless_jpeg(bytes(enc[: len(enc) // 2])) is None
    # unaligned DRI (not a whole number of lines) must be refused
    enc2 = encode_lossless_jpeg(img, restart_rows=3)
    i = enc2.index(b"\xff\xdd")
    bad = bytearray(enc2)
    bad[i + 4] = 0
    bad[i + 5] = 7  # Ri=7, not a multiple of w=8
    assert decode_lossless_jpeg(bytes(bad)) is None


def test_point_transform_decode():
    # encoder always writes Pt=0; hand-patch Al to 1 and check the
    # decoder shifts the output left accordingly (spec H.2.1)
    img = (np.arange(64).reshape(8, 8) % 128).astype(np.uint8) >> 1
    enc = bytearray(encode_lossless_jpeg(img.astype(np.uint8), predictor=1))
    # find SOS, set Al=1 (last byte of the SOS header), and halve...
    # simpler: just assert Pt=0 streams decode exactly (the Pt!=0
    # branch is unit-covered via _jpeg_lossless_scan directly)
    from etly_spark.operators.codecs import _jpeg_build_huff, _jpeg_lossless_scan

    # one-sample scan: SSSS=0 diff, so value == default == 2^(P-Pt-1),
    # then << Pt. P=8, Pt=1 -> default 64, output 128.
    tab = _jpeg_build_huff([1] + [0] * 15, bytes([0]))
    planes = _jpeg_lossless_scan(8, 1, 1, [(1, 0, 0)], {(0, 0): tab}, 0, b"\x00", 1, 1)
    assert planes is not None and int(planes[0, 0, 0]) == 128
