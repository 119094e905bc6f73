"""WAV format-family tests: G.711 µ-law/A-law, IMA ADPCM, IEEE float,
24/32-bit PCM, WAVE_FORMAT_EXTENSIBLE (operators/codecs.decode_wav).

G.711 and PCM paths are integer-exact (table lookups), so assertions
are exact. ADPCM is lossy by design; the decoder is checked against
the encoder twin with the step-table error bound, plus a hand-decoded
golden block computed sample-by-sample from the published recurrence.
"""

from __future__ import annotations

import struct

import numpy as np

from etly_spark.operators.codecs import (
    _ALAW_TABLE,
    _IMA_INDEX_ADJ,
    _IMA_STEPS,
    _ULAW_TABLE,
    decode_wav,
    g711_encode,
    ima_adpcm_encode_wav,
)


def _wav(fmt_tag, n_ch, rate, bits, data, extensible=False, block_align=None):
    ba = block_align if block_align is not None else max(1, (bits // 8)) * n_ch
    if extensible:
        sub = struct.pack("<H", fmt_tag) + b"\x00" * 14
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, n_ch, rate, rate * ba, ba, bits, 22, bits, 3)
        fmt += sub
    else:
        fmt = struct.pack("<HHIIHH", fmt_tag, n_ch, rate, rate * ba, ba, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# G.711
# ---------------------------------------------------------------------------


def test_g711_tables_self_consistent_all_256_codes():
    # decode->encode must return the original code for EVERY code
    # (both laws): catches any off-by-one in either table. µ-law's
    # one exception: 0x7F is "minus zero", which decodes to 0 and
    # re-encodes to the canonical plus-zero 0xFF.
    for law, table in (("ulaw", _ULAW_TABLE), ("alaw", _ALAW_TABLE)):
        back = g711_encode(table.astype(np.int64), law)
        want = np.arange(256, dtype=np.uint8)
        if law == "ulaw":
            assert back[0x7F] == 0xFF and int(table[0x7F]) == 0
            mask = want != 0x7F
            assert np.array_equal(back[mask], want[mask]), law
        else:
            assert np.array_equal(back, want), law


def test_g711_spec_extremes():
    # µ-law: max magnitude 8031<<2 = 32124; A-law: max 32256 (seg 7)
    assert int(np.abs(_ULAW_TABLE.astype(np.int64)).max()) == 32124
    assert int(np.abs(_ALAW_TABLE.astype(np.int64)).max()) == 32256
    # µ-law code 0xFF is +0, A-law 0x55 (toggled 0x00) is smallest seg
    assert int(_ULAW_TABLE[0xFF]) == 0
    assert int(_ALAW_TABLE[0x55 ^ 0x55 ^ 0xD5]) in (-8, 8)


def test_g711_wav_decode_exact():
    codes = np.arange(256, dtype=np.uint8).tobytes()
    for tag, table in ((7, _ULAW_TABLE), (6, _ALAW_TABLE)):
        out = decode_wav(_wav(tag, 1, 8000, 8, codes))
        assert out is not None
        rate, s = out
        assert rate == 8000 and s.shape == (256, 1)
        want = table.astype(np.float32) / 32768.0
        assert np.array_equal(s[:, 0], want)


def test_g711_monotone_within_positive_segment():
    # decoded magnitudes must be strictly increasing across the
    # positive code range when sorted by linear value
    pos = np.sort(_ULAW_TABLE[_ULAW_TABLE >= 0])
    assert np.all(np.diff(pos.astype(np.int64)) >= 0)


# ---------------------------------------------------------------------------
# PCM widths / float / extensible
# ---------------------------------------------------------------------------


def test_pcm_24bit_exact():
    vals = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    out = decode_wav(_wav(1, 1, 44100, 24, raw))
    assert out is not None
    got = (out[1][:, 0] * (1 << 23)).astype(np.int64)
    assert np.array_equal(got, vals)


def test_pcm_32bit_and_float32():
    vals = np.array([0, 1 << 16, -(1 << 31), (1 << 31) - 1], dtype=np.int64)
    raw = vals.astype("<i4").tobytes()
    out = decode_wav(_wav(1, 1, 48000, 32, raw))
    assert out is not None
    f = np.array([0.5, -0.25, 1.0, -1.0], dtype="<f4")
    out2 = decode_wav(_wav(3, 2, 16000, 32, f.tobytes()))
    assert out2 is not None and out2[1].shape == (2, 2)
    assert np.array_equal(out2[1].ravel(), f)


def test_extensible_routes_to_subformat():
    s = (np.arange(-50, 50, dtype="<i2")).tobytes()
    out = decode_wav(_wav(1, 2, 22050, 16, s, extensible=True))
    assert out is not None and out[1].shape == (50, 2)


def test_still_rejects_unknown_formats():
    assert decode_wav(_wav(0x55, 1, 8000, 16, b"\x00" * 64)) is None  # MP3 tag
    assert decode_wav(_wav(2, 1, 8000, 4, b"\x00" * 64)) is None  # MS ADPCM


# ---------------------------------------------------------------------------
# IMA ADPCM
# ---------------------------------------------------------------------------


def _hand_decode(nibbles, pred, idx):
    # independent re-derivation of the published recurrence (kept
    # deliberately separate from the implementation's helper)
    out = []
    for nib in nibbles:
        step = int(_IMA_STEPS[idx])
        diff = (step >> 3) + (step >> 2 if nib & 1 else 0)
        diff += (step >> 1) if nib & 2 else 0
        diff += step if nib & 4 else 0
        pred = pred + (-diff if nib & 8 else diff)
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[nib & 7])))
        out.append(pred)
    return out


def test_adpcm_golden_block_mono():
    # one mono block: seed 100, index 5, 8 nibbles packed into one
    # 4-byte group; expected output hand-derived from the recurrence
    nibs = [0, 1, 2, 4, 8, 9, 15, 7]
    packed = bytes([nibs[0] | (nibs[1] << 4), nibs[2] | (nibs[3] << 4),
                    nibs[4] | (nibs[5] << 4), nibs[6] | (nibs[7] << 4)])
    block = struct.pack("<hBx", 100, 5) + packed
    wav = _wav(0x11, 1, 8000, 4, block, block_align=len(block))
    out = decode_wav(wav)
    assert out is not None
    got = (out[1][:, 0] * 32768.0).round().astype(np.int64)
    want = [100] + _hand_decode(nibs, 100, 5)
    assert got.tolist() == want


def test_adpcm_roundtrip_error_bounded_and_stereo():
    rng = np.random.default_rng(4)
    t = np.arange(2000)
    sig = np.stack(
        [
            (6000 * np.sin(t / 30)).astype(np.int64),
            (4000 * np.sin(t / 11 + 1)).astype(np.int64),
        ],
        axis=1,
    )
    wav = ima_adpcm_encode_wav(sig, 8000, samples_per_block=505)
    out = decode_wav(wav)
    assert out is not None
    rate, dec = out
    assert rate == 8000 and dec.shape[1] == 2
    got = (dec * 32768.0).round().astype(np.int64)[: sig.shape[0]]
    err = np.abs(got - sig)
    # ADPCM tracks smooth signals closely; the greedy quantizer's
    # steady-state error is bounded by ~the running step size
    assert float(err.mean()) < 40.0
    assert float(err.max()) < 2000.0
    # seed samples (block starts) are exact by construction
    assert got[0, 0] == sig[0, 0] and got[505, 0] == sig[505, 0]


def test_adpcm_noise_still_roundtrips_structurally():
    x = np.random.default_rng(5).integers(-32768, 32767, 1017).astype(np.int64)
    wav = ima_adpcm_encode_wav(x, 16000, samples_per_block=249)
    out = decode_wav(wav)
    assert out is not None
    assert out[1].shape[0] >= 1017  # tail block padding may extend


# ---------------------------------------------------------------------------
# MS ADPCM
# ---------------------------------------------------------------------------


def test_ms_adpcm_golden_block():
    from etly_spark.operators.codecs import _MS_ADAPT, _MS_COEFS

    # mono block, predictor 1 (512,-256), delta 50, seeds s2=10 s1=20,
    # nibbles [1, 0xF (=-1), 7, 8 (=-8)]; expected output hand-derived
    block = bytes([1]) + struct.pack("<hhh", 50, 20, 10)
    block += bytes([(1 << 4) | 0xF, (7 << 4) | 8])
    wav = _wav(2, 1, 8000, 4, block, block_align=len(block))
    out = decode_wav(wav)
    assert out is not None
    got = (out[1][:, 0] * 32768.0).round().astype(np.int64).tolist()
    # hand recurrence
    s1, s2, d = 20, 10, 50
    want = [10, 20]
    for nib in (1, 0xF, 7, 8):
        signed = nib - 16 if nib >= 8 else nib
        pred = (s1 * 512 + s2 * (-256)) >> 8
        new = max(-32768, min(32767, pred + signed * d))
        s2, s1 = s1, new
        d = max(16, (_MS_ADAPT[nib] * d) >> 8)
        want.append(new)
    assert got == want
    assert len(_MS_COEFS) == 7


def test_ms_adpcm_roundtrip_error_bounded():
    from etly_spark.operators.codecs import ms_adpcm_encode_wav

    t = np.arange(1500)
    sig = (5000 * np.sin(t / 25)).astype(np.int64)
    wav = ms_adpcm_encode_wav(sig, 8000, samples_per_block=500)
    out = decode_wav(wav)
    assert out is not None
    got = (out[1][:, 0] * 32768.0).round().astype(np.int64)[:1500]
    err = np.abs(got - sig)
    assert float(err.mean()) < 120.0
    # seeds exact at each block start
    assert got[0] == sig[0] and got[500] == sig[500] and got[501] == sig[501]


# ---------------------------------------------------------------------------
# decode_audio dispatcher
# ---------------------------------------------------------------------------


def _aiff(n_ch, rate, bits, data):
    # 80-bit extended sample rate: value = mant * 2^(exp-16383-63)
    import math

    e = math.floor(math.log2(rate))
    mant = int(rate * 2 ** (63 - e))
    comm = struct.pack(">HIH", n_ch, len(data) // (max(1, bits // 8) * n_ch), bits)
    comm += struct.pack(">H", 16383 + e) + mant.to_bytes(8, "big")
    ssnd = struct.pack(">II", 0, 0) + data
    body = b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_aiff_pcm_exact_and_80bit_rate():
    from etly_spark.operators.codecs import decode_aiff

    vals = np.arange(-100, 100, dtype=np.int64)
    for rate in (8000, 44100, 48000, 11025):
        out = decode_aiff(_aiff(2, rate, 16, vals.astype(">i2").tobytes()))
        assert out is not None
        got_rate, s = out
        assert got_rate == rate and s.shape == (100, 2)
        assert np.array_equal((s.ravel() * 32768.0).astype(np.int64), vals)
    # 8-bit AIFF is SIGNED (unlike WAV's unsigned 8-bit)
    v8 = np.arange(-128, 128, dtype=np.int8)
    out = decode_aiff(_aiff(1, 8000, 8, v8.tobytes()))
    assert np.array_equal((out[1][:, 0] * 128.0).astype(np.int64), v8.astype(np.int64))
    # 24-bit big-endian sign extension
    v24 = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "big") for v in v24)
    out = decode_aiff(_aiff(1, 16000, 24, raw))
    assert np.array_equal((out[1][:, 0] * (1 << 23)).astype(np.int64), v24)


def test_au_all_encodings():
    from etly_spark.operators.codecs import decode_au

    def au(enc, n_ch, data, rate=8000):
        return struct.pack(">4sIIIII", b".snd", 24, len(data), enc, rate, n_ch) + data

    # mu-law and A-law reuse the proven G.711 tables
    codes = np.arange(256, dtype=np.uint8).tobytes()
    for enc, table in ((1, _ULAW_TABLE), (27, _ALAW_TABLE)):
        out = decode_au(au(enc, 1, codes))
        assert np.array_equal(out[1][:, 0], table.astype(np.float32) / 32768.0)
    # 16-bit BE linear
    vals = np.arange(-300, 300, dtype=np.int64)
    out = decode_au(au(3, 2, vals.astype(">i2").tobytes(), rate=44100))
    assert out[0] == 44100 and out[1].shape == (300, 2)
    assert np.array_equal((out[1].ravel() * 32768.0).astype(np.int64), vals)
    # float32 BE passes through
    f = np.array([0.5, -0.25, 1.0, -1.0], dtype=">f4")
    out = decode_au(au(6, 1, f.tobytes()))
    assert np.array_equal(out[1][:, 0], f.astype(np.float32))
    # unknown encoding (e.g. 23 = G.721 ADPCM) -> None
    assert decode_au(au(23, 1, codes)) is None


def test_decode_audio_routes_aiff_and_au():
    from etly_spark.operators.codecs import audio_stats, decode_audio

    sig = (2000 * np.sin(np.arange(400) / 7)).astype(np.int64)
    aiff = _aiff(1, 8000, 16, sig.astype(">i2").tobytes())
    au = struct.pack(
        ">4sIIIII", b".snd", 24, len(sig) * 2, 3, 8000, 1
    ) + sig.astype(">i2").tobytes()
    wav = _wav(1, 1, 8000, 16, sig.astype("<i2").tobytes())
    stats = [audio_stats(*decode_audio(p)) for p in (aiff, au, wav)]
    assert stats[0] == stats[1] == stats[2]


def test_decode_audio_routes_wav_and_flac():
    from etly_spark.operators.codecs import audio_stats, decode_audio
    from etly_spark.operators.flac import encode_flac

    sig = (3000 * np.sin(np.arange(800) / 9)).astype(np.int64)
    wav = _wav(1, 1, 8000, 16, sig.astype("<i2").tobytes())
    fl = encode_flac(sig, 8000, bps=16)
    for payload in (wav, fl):
        out = decode_audio(payload)
        assert out is not None
        rate, samples = out
        assert rate == 8000 and samples.shape == (800, 1)
        back = (samples[:, 0] * 32768.0).round().astype(np.int64)
        assert np.array_equal(back, sig)
    # identical features either container
    st_w = audio_stats(*decode_audio(wav))
    st_f = audio_stats(*decode_audio(fl))
    assert st_w == st_f
    assert decode_audio(b"ID3\x04" + b"\x00" * 64) is None  # MP3 stays gated


def test_aiff_absurd_rate_exponent_refused():
    # regression: a mutated 80-bit exponent must not overflow 2.0**exp
    from etly_spark.operators.codecs import _float80_be, decode_aiff

    assert _float80_be(b"\x7f\xfe" + b"\x80" + b"\x00" * 7) == 0.0
    enc = bytearray(_aiff(1, 8000, 16, np.zeros(4, dtype=">i2").tobytes()))
    i = enc.index(b"COMM") + 8 + 8  # 80-bit rate field
    enc[i] = 0x7F
    enc[i + 1] = 0xFE
    assert decode_aiff(bytes(enc)) is None  # rate parses as 0 -> refused
