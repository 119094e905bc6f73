"""Property-based tests (hypothesis) for the pure-numpy media codecs:
any image round-trips bit-exactly through every container/filter
combination, any PCM waveform round-trips through WAV, and corrupt
truncations never crash — they return None (corrupt media is data)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etly_spark.operators import codecs as C
from tests.test_codecs import encode_bmp, encode_png, encode_ppm, encode_wav

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _img(h: int, w: int, nch: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    shape = (h, w, nch) if nch > 1 else (h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@given(dims, st.integers(0, 2**32 - 1), st.booleans())
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_any_dims(hw, seed, top_down):
    h, w = hw
    img = _img(h, w, 3, seed)
    assert np.array_equal(C.decode_image_pixels(encode_bmp(img, top_down=top_down)), img)


@given(dims, st.integers(0, 2**32 - 1), st.sampled_from([1, 3]))
@settings(max_examples=60, deadline=None)
def test_netpbm_roundtrip_any_dims(hw, seed, nch):
    h, w = hw
    img = _img(h, w, nch, seed)
    assert np.array_equal(C.decode_image_pixels(encode_ppm(img)), img)


@given(dims, st.integers(0, 2**32 - 1), st.sampled_from([1, 3, 4]), st.data())
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_filters(hw, seed, nch, data):
    h, w = hw
    img = _img(h, w, nch, seed)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    assert np.array_equal(C.decode_image_pixels(encode_png(img, filters)), img)


@given(dims, st.integers(0, 2**32 - 1), st.integers(0, 200))
@settings(max_examples=60, deadline=None)
def test_truncation_never_crashes(hw, seed, cut):
    """Any prefix of a valid container either decodes to the exact image
    (nothing essential cut) or returns None — never raises, never
    returns wrong pixels."""
    h, w = hw
    img = _img(h, w, 3, seed)
    for enc in (encode_bmp(img), encode_ppm(img), encode_png(img)):
        payload = enc[: max(0, len(enc) - cut)]
        out = C.decode_image_pixels(payload)
        assert out is None or np.array_equal(out, img)


@given(
    st.integers(1, 3000),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 44100]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_any_shape(n, nch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-1, 1, (n, nch))
    dec = C.decode_wav(encode_wav(samples, rate))
    assert dec is not None
    got_rate, got = dec
    assert got_rate == rate and got.shape == (n, nch)
    # 16-bit quantization: encoder truncates at 32767 scale, decoder
    # divides by 32768 -> up to ~2 LSB combined
    assert np.abs(got - np.clip(samples, -1, 1)).max() <= 2.5 / 32768


@given(
    st.integers(1, 8),
    st.tuples(st.integers(1, 8), st.integers(1, 8)),
    st.sampled_from(["420", "422", "444"]),
    st.integers(0, 2**32 - 1),
    st.integers(0, 120),
)
@settings(max_examples=60, deadline=None)
def test_y4m_roundtrip_and_truncation(n_frames, hw, chroma, seed, cut):
    from tests.test_codecs import encode_y4m

    h2, w2 = hw
    h, w = h2 * 2, w2 * 2  # even dims (chroma subsampling grids)
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n_frames, h, w), dtype=np.uint8)
    payload = encode_y4m(frames, fps=25, chroma=chroma)
    dec = C.decode_y4m(payload)
    assert dec is not None and np.array_equal(dec[1], frames)
    out = C.decode_y4m(payload[: max(0, len(payload) - cut)])
    # truncation mid-frame -> the decoder refuses (None); truncation at
    # an exact frame boundary -> a clean PREFIX of frames; never garbage
    assert out is None or np.array_equal(out[1], frames[: out[1].shape[0]])


@given(
    st.tuples(st.integers(1, 16), st.integers(1, 16)),
    st.integers(2, 32),
    st.integers(0, 2**32 - 1),
    st.booleans(),
    st.integers(0, 60),
)
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_any_palette(hw, n_colors, seed, compressed, cut):
    from tests.test_codecs import encode_gif, encode_gif_lzw

    h, w = hw
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (h, w), dtype=np.uint8)
    enc = encode_gif_lzw if compressed else encode_gif
    payload = enc(idx, palette)
    assert np.array_equal(C.decode_image_pixels(payload), palette[idx])
    out = C.decode_image_pixels(payload[: max(0, len(payload) - cut)])
    assert out is None or np.array_equal(out, palette[idx])


@given(dims, st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_hashes_total_and_stable(hw, seed):
    """Perceptual hashes are defined for EVERY image (any dims, both
    upsample and downsample paths) and identical across containers of
    the same pixels."""
    h, w = hw
    img = _img(h, w, 3, seed)
    a = C.ahash64(img)
    assert 0 <= a < (1 << 64)
    assert C.ahash64(C.decode_image_pixels(encode_png(img))) == a
    assert C.dhash64(C.decode_image_pixels(encode_bmp(img))) == C.dhash64(img)


@given(
    dims,
    st.integers(0, 2**32 - 1),
    st.sampled_from([1, 3]),
    st.sampled_from([10, 50, 85, 100]),
    st.sampled_from(["444", "420"]),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_progressive_equals_baseline_any_input(hw, seed, nch, quality, subsample):
    """For ANY image, quality, and subsampling, the progressive encoding
    decodes bit-identically to the baseline encoding of the same source:
    the scan script transmits every coefficient bit, so the two codec
    paths must reconstruct the same quantized spectrum."""
    h, w = hw
    img = _img(h, w, nch, seed)
    base = C.decode_image_pixels(C.encode_baseline_jpeg(img, quality=quality, subsample=subsample))
    prog = C.decode_image_pixels(C.encode_progressive_jpeg(img, quality=quality, subsample=subsample))
    assert base is not None and prog is not None
    assert np.array_equal(base, prog)


@given(dims, st.integers(0, 2**32 - 1), st.integers(0, 400))
@settings(max_examples=40, deadline=None)
def test_jpeg_truncation_never_crashes(hw, seed, cut):
    """Any prefix of either JPEG flavor returns a decode or None —
    never raises (corrupt media is data at 100 TB)."""
    h, w = hw
    img = _img(h, w, 3, seed)
    for enc in (C.encode_baseline_jpeg(img), C.encode_progressive_jpeg(img)):
        out = C.decode_image_pixels(enc[: max(2, len(enc) - cut)])
        assert out is None or out.shape == (h, w, 3)


@given(
    dims,
    st.integers(0, 2**32 - 1),
    st.sampled_from([1, 3, 4]),
    st.booleans(),
    st.sampled_from([0, 4]),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_webp_lossless_roundtrip_any_input(hw, seed, nch, subtract_green, cache_bits, use_lz77):
    """VP8L is lossless: ANY image through ANY encoder feature combo
    round-trips bit-exactly."""
    from etly_spark.operators import webp as W

    h, w = hw
    img = _img(h, w, nch, seed)
    enc = W.encode_lossless_webp(
        img, subtract_green=subtract_green, cache_bits=cache_bits, use_lz77=use_lz77
    )
    dec = W.decode_webp_pixels(enc)
    want = np.stack([img] * 3, axis=-1) if nch == 1 else img
    assert dec is not None and np.array_equal(dec, want)


@given(dims, st.integers(0, 2**32 - 1), st.integers(0, 300))
@settings(max_examples=40, deadline=None)
def test_webp_truncation_never_crashes(hw, seed, cut):
    from etly_spark.operators import webp as W

    h, w = hw
    img = _img(h, w, 3, seed)
    enc = W.encode_lossless_webp(img)
    out = W.decode_webp_pixels(enc[: max(0, len(enc) - cut)])
    assert out is None or np.array_equal(out, img)


@given(
    st.integers(1, 1200),
    st.sampled_from([1, 2, 3]),
    st.sampled_from([8, 16]),
    st.sampled_from([192, 256, 777]),
    st.booleans(),
    st.sampled_from([0, 1]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_flac_roundtrip_any_input(n, nch, bps, block_size, try_lpc, rice_method, seed):
    """FLAC is lossless: ANY waveform through ANY encoder feature combo
    round-trips bit-exactly, and the STREAMINFO MD5 gate holds."""
    from etly_spark.operators import flac as FL

    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, (n, nch)).astype(np.int64)
    enc = FL.encode_flac(
        x, 44100, bps=bps, block_size=block_size,
        try_lpc=try_lpc, rice_method=rice_method,
    )
    out = FL.decode_flac(enc)
    assert out is not None and np.array_equal(out[1], x)


@given(st.integers(1, 600), st.integers(0, 400), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_flac_truncation_never_crashes(n, cut, seed):
    """Any prefix of a valid FLAC stream returns the exact samples or
    None — never raises, never returns wrong audio (CRC/MD5 gates)."""
    from etly_spark.operators import flac as FL

    rng = np.random.default_rng(seed)
    x = rng.integers(-2000, 2000, n).astype(np.int64)
    enc = FL.encode_flac(x, 8000, block_size=192)
    out = FL.decode_flac(enc[: max(0, len(enc) - cut)])
    assert out is None or np.array_equal(out[1][:, 0], x)


@given(st.integers(2, 900), st.sampled_from([249, 505]), st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_adpcm_decoders_never_crash_and_stay_bounded(n, spb, seed):
    """IMA and MS ADPCM decode of any twin-encoded waveform stays in
    [-1, 1] and covers at least the input length."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32767, n).astype(np.int64)
    for enc in (
        C.ima_adpcm_encode_wav(x, 8000, samples_per_block=spb),
        C.ms_adpcm_encode_wav(x, 8000, samples_per_block=spb - 1 if spb % 2 else spb),
    ):
        out = C.decode_wav(enc)
        assert out is not None
        assert out[1].shape[0] >= n
        assert float(np.abs(out[1]).max()) <= 1.0


@given(
    dims,
    st.integers(0, 2**32 - 1),
    st.sampled_from([1, 3, 4]),
    st.sampled_from([1, 5, 32773]),
    st.booleans(),
    st.sampled_from([1, 4, 16]),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_any_input(hw, seed, nch, comp, big_endian, rps):
    """TIFF strips are lossless under every supported compression:
    ANY image x any strip height x either byte order round-trips
    bit-exactly."""
    h, w = hw
    img = _img(h, w, nch, seed)
    enc = C.encode_tiff(img, compression=comp, big_endian=big_endian, rows_per_strip=rps)
    dec = C.decode_image_pixels(enc)
    assert dec is not None and np.array_equal(dec, img)


@given(dims, st.integers(0, 2**32 - 1), st.integers(0, 200))
@settings(max_examples=40, deadline=None)
def test_tiff_truncation_never_crashes(hw, seed, cut):
    h, w = hw
    img = _img(h, w, 3, seed)
    enc = C.encode_tiff(img, compression=5)
    out = C.decode_image_pixels(enc[: max(0, len(enc) - cut)])
    assert out is None or np.array_equal(out, img)


@given(st.integers(0, 2**32 - 1), st.integers(0, 4096))
@settings(max_examples=80, deadline=None)
def test_random_bytes_never_crash_any_dispatcher(seed, n):
    """Pure garbage through every decode dispatcher returns None (or a
    well-formed array if the garbage happens to parse) — never raises.
    Magic-byte prefixes are prepended half the time so the format
    parsers themselves get fuzzed, not just the dispatch."""
    rng = np.random.default_rng(seed)
    body = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    prefixes = [
        b"", b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"P6\n",
        b"II*\x00", b"MM\x00*", b"RIFF" + body[:4] + b"WEBP",
        b"RIFF" + body[:4] + b"WAVE", b"RIFF" + body[:4] + b"AVI ",
        b"fLaC", b"FORM" + body[:4] + b"AIFF", b".snd", b"YUV4MPEG2 ",
    ]
    payload = prefixes[seed % len(prefixes)] + body
    for dec in (C.decode_image_pixels, C.decode_audio, C.decode_video):
        out = dec(payload)
        assert out is None or out is not None  # no exception is the assertion


@given(st.integers(0, 2**32 - 1), st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_mutated_valid_files_never_crash(seed, n_flips):
    """Valid containers with random byte smashes return None or a
    well-formed result — never raise. Caught for real: a zeroed JPEG
    sampling factor used to reach a division in chroma upsampling."""
    from etly_spark.operators import flac as FL

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    sig = rng.integers(-2000, 2000, 300).astype(np.int64)
    seeds_enc = [
        C.encode_tiff(img),
        C.encode_baseline_jpeg(img),
        C.encode_lossless_jpeg(img),
        FL.encode_flac(sig, 8000),
        C.encode_mjpeg_avi(np.stack([img[:, :, 0]] * 3), fps=5),
    ]
    enc = bytearray(seeds_enc[seed % len(seeds_enc)])
    for _ in range(n_flips):
        enc[int(rng.integers(0, len(enc)))] = int(rng.integers(0, 256))
    p = bytes(enc)
    for dec in (C.decode_image_pixels, C.decode_audio, C.decode_video):
        dec(p)  # no exception is the assertion


def test_jpeg_zero_sampling_factor_refused():
    # regression: SOF with a 0 sampling factor must return None, not
    # divide by zero in the upsampler
    enc = bytearray(C.encode_baseline_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = enc.index(b"\xff\xc0")
    enc[i + 2 + 2 + 5 + 1] = 0x00  # first component's h/v byte
    assert C.decode_image_pixels(bytes(enc)) is None
