"""Real-codec round-trips: hand-encoded BMP/PPM/PGM/PNG/WAV fixtures
decoded by `operators.codecs` against ground-truth numpy arrays, then
the Spark-side operators (decode_pixel_features / decode_audio_features
/ image_near_dup) end-to-end."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from etly_spark.operators import codecs as C
from etly_spark.operators import multimodal as MM

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# encoders (test-side ground truth)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray, top_down: bool = False, bpp: int = 24) -> bytes:
    h, w = arr.shape[:2]
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    rows = arr[:, :, ::-1]  # RGB -> BGR
    if nch == 4:
        rows = np.concatenate([arr[:, :, 2::-1], arr[:, :, 3:4]], axis=2)
    if not top_down:
        rows = rows[::-1]
    body = bytearray()
    for y in range(h):
        line = rows[y].tobytes()
        body += line + b"\x00" * (row_bytes - len(line))
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return header + info + bytes(body)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    magic = b"P6" if arr.ndim == 3 else b"P5"
    return magic + f"\n# c\n{w} {h}\n255\n".encode() + arr.tobytes()


def encode_png(arr: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Real PNG encoder with selectable per-row filter types — the exact
    inverse of the decoder's unfilter, so every filter path is proven."""
    if arr.ndim == 2:
        color_type, nch = 0, 1
        arr3 = arr[:, :, None]
    elif arr.shape[2] == 3:
        color_type, nch = 2, 3
        arr3 = arr
    else:
        color_type, nch = 6, 4
        arr3 = arr
    h, w = arr.shape[:2]
    stride = w * nch
    flat = arr3.reshape(h, stride).astype(np.int32)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        left = np.concatenate([np.zeros(nch, dtype=np.int32), cur[:-nch]])
        upleft = np.concatenate([np.zeros(nch, dtype=np.int32), prev[:-nch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        raw += bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">II5B", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    n, nch = samples.shape
    if bits == 16:
        data = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = (np.clip(samples, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * bits // 8, nch * bits // 8, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def encode_gif(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Real GIF89a encoder using the classic 'uncompressed LZW' trick:
    a CLEAR code before every pixel keeps the code width fixed, so the
    emitter needs no string table — valid per spec, decodable by any
    conformant reader."""
    h, w = idx.shape
    log2n = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << log2n
    mcs = log2n
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (log2n - 1), 0, 0])
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([mcs])
    # bit-pack LSB-first: CLEAR, then (pixel, CLEAR)*, EOI
    acc = nbits = 0
    data = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for px in idx.ravel():
        emit(int(px))
        emit(clear)
    emit(eoi)
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_lzw(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Real compressing GIF encoder (greedy LZW with table growth and
    width escalation) — exercises the decoder's dictionary-building
    branches incl. the KwKwK (code == next_code) case."""
    h, w = idx.shape
    log2n = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    n = 1 << log2n
    mcs = log2n
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (log2n - 1), 0, 0])
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00" + bytes([mcs])

    acc = nbits = 0
    width = mcs + 1
    data = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    seq: tuple = ()
    for px in map(int, idx.ravel()):
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # decoder widens when next_code hits 1<<width; the encoder
            # must widen at the same boundary
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        seq = (px,)
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_real_lzw_roundtrip():
    rng = np.random.default_rng(4)
    palette = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    # repetitive image -> deep LZW table, width growth, KwKwK patterns
    idx = np.tile(np.array([0, 0, 1, 1, 2, 2, 3, 3, 0, 1, 2, 3], dtype=np.uint8), 200).reshape(
        40, 60
    )
    dec = C.decode_image_pixels(encode_gif_lzw(idx, palette))
    assert dec is not None
    assert np.array_equal(dec, palette[idx])
    # pure run (aaaa...) is the canonical KwKwK stream
    runs = np.zeros((16, 16), dtype=np.uint8)
    dec2 = C.decode_image_pixels(encode_gif_lzw(runs, palette))
    assert np.array_equal(dec2, palette[runs])
    # random large image stresses width escalation to many bits
    big = rng.integers(0, 4, (64, 64), dtype=np.uint8)
    dec3 = C.decode_image_pixels(encode_gif_lzw(big, palette))
    assert np.array_equal(dec3, palette[big])


def test_gif_roundtrip_exact():
    rng = np.random.default_rng(13)
    palette = rng.integers(0, 256, (13, 3), dtype=np.uint8)
    idx = rng.integers(0, 13, (9, 14), dtype=np.uint8)
    payload = encode_gif(idx, palette)
    dec = C.decode_image_pixels(payload)
    assert dec is not None and dec.shape == (9, 14, 3)
    assert np.array_equal(dec, palette[idx])
    # header parse agrees
    from etly_spark.operators.multimodal import parse_image_header

    assert parse_image_header(payload) == ("gif", 14, 9)
    # truncation: refused, not garbage
    assert C.decode_image_pixels(payload[:-10]) is None
    # tiny palette exercises the 2-bit minimum code size
    small = C.decode_image_pixels(
        encode_gif(np.array([[0, 1], [1, 0]], dtype=np.uint8), palette[:2])
    )
    assert np.array_equal(small, palette[:2][np.array([[0, 1], [1, 0]])])


def rand_img(h: int, w: int, nch: int = 3) -> np.ndarray:
    shape = (h, w, nch) if nch > 1 else (h, w)
    return RNG.integers(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# pure-codec round trips
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_exact():
    img = rand_img(13, 17)  # width*3 not divisible by 4 -> real padding path
    assert np.array_equal(C.decode_image_pixels(encode_bmp(img)), img)
    assert np.array_equal(C.decode_image_pixels(encode_bmp(img, top_down=True)), img)


def test_bmp_32bit_roundtrip():
    img = rand_img(5, 7, 4)
    dec = C.decode_image_pixels(encode_bmp(img, bpp=32))
    # decoder returns RGBA slice reversed from BGRA -> first 3 = RGB
    assert dec.shape == (5, 7, 4)
    assert np.array_equal(dec[:, :, :3], img[:, :, :3])


def test_netpbm_roundtrip_exact():
    rgb, gray = rand_img(9, 11), rand_img(6, 4, 1)
    assert np.array_equal(C.decode_image_pixels(encode_ppm(rgb)), rgb)
    assert np.array_equal(C.decode_image_pixels(encode_ppm(gray)), gray)


@pytest.mark.parametrize("nch", [1, 3, 4])
def test_png_all_filters_roundtrip_exact(nch):
    img = rand_img(10, 8, nch)
    # one row per filter type, cycling — proves every unfilter branch
    filters = [y % 5 for y in range(10)]
    assert np.array_equal(C.decode_image_pixels(encode_png(img, filters)), img)


def test_decode_rejects_garbage():
    assert C.decode_image_pixels(b"not an image") is None
    assert C.decode_image_pixels(b"") is None
    assert C.decode_image_pixels(None) is None
    # truncated BMP: header promises more pixels than present
    assert C.decode_image_pixels(encode_bmp(rand_img(8, 8))[:-40]) is None
    # PNG with corrupt zlib stream
    png = bytearray(encode_png(rand_img(4, 4)))
    png[60] ^= 0xFF
    assert C.decode_image_pixels(bytes(png)) is None


def test_wav_roundtrip_and_stats():
    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples = np.stack([sine, sine], axis=1)
    dec = C.decode_wav(encode_wav(samples, rate))
    assert dec is not None
    got_rate, got = dec
    st = C.audio_stats(got_rate, got)
    assert st["sample_rate"] == rate and st["n_channels"] == 2
    assert abs(st["duration_s"] - 1.0) < 1e-9
    assert abs(st["rms"] - 0.5 / np.sqrt(2)) < 1e-3  # sine RMS = A/sqrt(2)
    assert abs(st["zero_cross_rate"] - 2 * 440 / rate) < 0.01
    assert C.decode_wav(b"RIFFxxxxWAVE") is None
    assert C.decode_wav(b"not audio") is None
    # 8-bit path
    dec8 = C.decode_wav(encode_wav(samples, rate, bits=8))
    assert dec8 is not None and abs(C.audio_stats(*dec8)["rms"] - 0.5 / np.sqrt(2)) < 0.01


def test_perceptual_hash_properties():
    base = rand_img(64, 64)
    # identical -> identical hashes
    assert C.ahash64(base) == C.ahash64(base.copy())
    # light noise -> small hamming; inversion -> huge hamming
    noisy = np.clip(base.astype(np.int16) + RNG.integers(-8, 9, base.shape), 0, 255).astype(
        np.uint8
    )
    inv = (255 - base).astype(np.uint8)
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(C.ahash64(base), C.ahash64(noisy)) <= 6
    assert ham(C.ahash64(base), C.ahash64(inv)) >= 40
    assert ham(C.dhash64(base), C.dhash64(noisy)) <= 10
    assert 0 <= C.ahash64(base) < (1 << 64)


def test_audio_fingerprint_properties():
    rate = 8000
    t = np.arange(rate) / rate
    melody = (
        0.4 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
        + 0.3 * np.sin(2 * np.pi * 440 * t) * (np.sin(2 * np.pi * 5 * t) < 0)
    )
    other = 0.4 * np.sin(2 * np.pi * 330 * t) * (np.sin(2 * np.pi * 7 * t) > 0)
    ham = lambda a, b: bin(a ^ b).count("1")
    fp = C.audio_fingerprint64(melody)
    assert 0 <= fp < (1 << 64)
    # gain invariance: a re-levelled copy fingerprints IDENTICALLY
    assert C.audio_fingerprint64(0.5 * melody) == fp
    # mild noise: small hamming
    rng = np.random.default_rng(3)
    noisy = melody + rng.normal(0, 0.01, melody.shape)
    assert ham(C.audio_fingerprint64(noisy), fp) <= 8
    # different melody: far
    assert ham(C.audio_fingerprint64(other), fp) >= 16
    # short clips are padded, not crashed
    assert 0 <= C.audio_fingerprint64(np.ones(10)) < (1 << 64)


def test_audio_near_dup_spark(spark):
    from etly_spark.operators.multimodal import audio_near_dup, decode_audio_features

    rate = 8000
    t = np.arange(rate) / rate
    rng = np.random.default_rng(9)

    def clip(seed):
        r = np.random.default_rng(seed)
        f1, f2 = r.uniform(150, 500), r.uniform(150, 500)
        g1, g2 = r.uniform(2, 9), r.uniform(2, 9)
        return 0.4 * np.sin(2 * np.pi * f1 * t) * (np.sin(2 * np.pi * g1 * t) > 0) + 0.3 * np.sin(
            2 * np.pi * f2 * t
        ) * (np.sin(2 * np.pi * g2 * t) < 0)

    rows = []
    for i in range(6):
        w = clip(i)
        rows.append((i, bytearray(encode_wav(w[:, None], rate))))
        # re-levelled + lightly noised copy of clips 0 and 1
        if i < 2:
            dup = 0.6 * w + rng.normal(0, 0.005, w.shape)
            rows.append((100 + i, bytearray(encode_wav(dup[:, None], rate))))
    rows.append((200, bytearray(b"not audio")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = decode_audio_features(df)
    pairs = {(r.doc_a, r.doc_b) for r in audio_near_dup(feats, max_hamming=7).collect()}
    assert (0, 100) in pairs and (1, 101) in pairs
    assert all(p[0] not in (200,) and p[1] not in (200,) for p in pairs)
    assert all({a, b} & {0, 100} or {a, b} & {1, 101} for a, b in pairs) or pairs == {
        (0, 100),
        (1, 101),
    }


def encode_y4m(frames: np.ndarray, fps: int = 25, chroma: str = "420") -> bytes:
    """Real Y4M encoder (test-side ground truth): luma frames get neutral
    chroma planes per the declared subsampling."""
    n, h, w = frames.shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C{chroma}\n".encode())
    if chroma == "420":
        cpl = (w // 2) * (h // 2) * 2
    elif chroma == "422":
        cpl = (w // 2) * h * 2
    else:
        cpl = w * h * 2
    for f in frames:
        out += b"FRAME\n" + f.tobytes() + b"\x80" * cpl
    return bytes(out)


def test_y4m_roundtrip_exact():
    frames = RNG.integers(0, 256, size=(6, 8, 12), dtype=np.uint8)
    for chroma in ("420", "422", "444"):
        dec = C.decode_y4m(encode_y4m(frames, fps=30, chroma=chroma))
        assert dec is not None
        fps, got = dec
        assert fps == 30.0
        assert np.array_equal(got, frames)
    # truncated / torn streams refuse rather than emit garbage
    payload = encode_y4m(frames)
    assert C.decode_y4m(payload[:-5]) is None
    assert C.decode_y4m(b"YUV4MPEG2 W0 H0 F25:1\n") is None
    assert C.decode_y4m(b"not video") is None
    # frame cap bounds memory per record
    fps, got = C.decode_y4m(payload, max_frames=3)
    assert got.shape[0] == 3


def test_video_fingerprint_properties():
    t = np.linspace(0, 4 * np.pi, 120)
    curve = (np.sin(t) * 60 + 120).astype(np.uint8)
    frames = np.repeat(curve[:, None, None], 16 * 16, axis=1).reshape(120, 16, 16)
    other = np.repeat(
        ((np.cos(2.3 * t) * 60 + 120).astype(np.uint8))[:, None, None], 16 * 16, axis=1
    ).reshape(120, 16, 16)
    ham = lambda a, b: bin(a ^ b).count("1")
    fp = C.video_fingerprint64(frames)
    # contrast/gain scaling preserves the brightness ordering -> same fp
    scaled = np.clip(frames.astype(np.float64) * 0.7 + 20, 0, 255).astype(np.uint8)
    assert C.video_fingerprint64(scaled) == fp
    assert ham(C.video_fingerprint64(other), fp) >= 16


def test_single_frame_video_is_data_not_exception(spark):
    """Regression: a valid 1-frame clip must yield a feature row (flat
    temporal fingerprint = 0), not an IndexError that kills the task."""
    from etly_spark.operators.multimodal import decode_video_features

    one = np.full((1, 4, 4), 7, dtype=np.uint8)
    assert C.video_fingerprint64(one) == 0
    df = spark.createDataFrame(
        [(1, bytearray(encode_y4m(one)))], "doc_id long, payload binary"
    )
    row = decode_video_features(df).first()
    assert row.n_frames == 1 and row.vhash64 == 0 and row.duration_s == 1 / 25


def test_video_near_dup_spark(spark):
    from etly_spark.operators.multimodal import decode_video_features, video_near_dup

    rng = np.random.default_rng(21)

    def vid(seed):
        r = np.random.default_rng(seed)
        t = np.linspace(0, r.uniform(2, 6) * np.pi, 80)
        curve = np.sin(t + r.uniform(0, 6)) * 50 + 120
        base = np.repeat(curve[:, None, None], 12 * 12, axis=1).reshape(80, 12, 12)
        return np.clip(base + r.normal(0, 3, base.shape), 0, 255).astype(np.uint8)

    rows = []
    for i in range(5):
        v = vid(i)
        rows.append((i, bytearray(encode_y4m(v))))
        if i < 2:  # re-graded + noised copy
            dup = np.clip(v.astype(np.float64) * 0.8 + 10 + rng.normal(0, 1, v.shape), 0, 255)
            rows.append((100 + i, bytearray(encode_y4m(dup.astype(np.uint8)))))
    rows.append((200, bytearray(b"not video")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = decode_video_features(df)
    got = {r.doc_id: r for r in feats.collect()}
    assert got[0].width == 12 and got[0].n_frames == 80 and got[0].fps == 25.0
    assert got[200].vhash64 is None
    pairs = {(r.doc_a, r.doc_b) for r in video_near_dup(feats).collect()}
    assert (0, 100) in pairs and (1, 101) in pairs
    assert all(200 not in p for p in pairs)


def test_audio_video_incremental_equals_batch(spark):
    """The generalized incremental probe matches the batch self-join
    restricted to new-involving pairs, for BOTH AV modalities."""
    from etly_spark.operators.multimodal import (
        audio_near_dup,
        audio_near_dup_incremental,
        decode_audio_features,
        decode_video_features,
        video_near_dup,
        video_near_dup_incremental,
    )

    from pyspark.sql import functions as F

    rate = 8000
    n = rate // 2
    rows_a, rows_v = [], []
    for i in range(8):
        r = np.random.default_rng(50 + i)
        env = np.abs(np.cumsum(r.normal(0, 1, 65))) + 0.1
        wave = np.repeat(env / env.max(), n // 65 + 1)[:n] * r.normal(0, 0.2, n)
        rows_a.append((i, bytearray(encode_wav(wave[:, None], rate))))
        curve = np.clip(120 + np.cumsum(r.normal(0, 8, 40)), 10, 245)
        vid = np.repeat(curve[:, None, None], 64, axis=1).reshape(40, 8, 8).astype(np.uint8)
        rows_v.append((i, bytearray(encode_y4m(vid))))
        if i < 2:  # "new batch": re-levelled copies of clips 0 and 1
            rows_a.append((100 + i, bytearray(encode_wav((0.7 * wave)[:, None], rate))))
            dv = np.clip(vid.astype(np.float64) * 0.8 + 5, 0, 255).astype(np.uint8)
            rows_v.append((100 + i, bytearray(encode_y4m(dv))))

    for rows, dec, batch_fn, inc_fn in (
        (rows_a, decode_audio_features, audio_near_dup, audio_near_dup_incremental),
        (rows_v, decode_video_features, video_near_dup, video_near_dup_incremental),
    ):
        feats = dec(spark.createDataFrame(rows, "doc_id long, payload binary"))
        new = feats.filter(F.col("doc_id") >= 100)
        inc = {(r.doc_a, r.doc_b) for r in inc_fn(new, feats).collect()}
        batch = {
            (r.doc_a, r.doc_b)
            for r in batch_fn(feats).collect()
            if r.doc_a >= 100 or r.doc_b >= 100
        }
        assert inc == batch and {(0, 100), (1, 101)} <= inc


def test_batch_p6_fast_path_matches_scalar():
    """The vectorized uniform-P6 batch kernel must be value-identical
    to the scalar per-image path (the oracle gate rides on it)."""
    imgs = [rand_img(16, 16) for _ in range(40)]
    payloads = [encode_ppm(im) for im in imgs]
    stack = C.batch_uniform_p6(payloads)
    assert stack is not None and stack.shape == (40, 16, 16, 3)
    st = C.batch_image_stats(stack)
    for i, im in enumerate(imgs):
        ref = C.image_stats(im)
        assert np.array_equal(stack[i], im)
        assert st["mean_luma"][i] == ref["mean_luma"]  # bit-identical
        assert int(st["ahash64"][i]) == ref["ahash64"]
        assert int(st["dhash64"][i]) == ref["dhash64"]
        assert abs(st["std_luma"][i] - ref["std_luma"]) < 1e-12
    # mixed batches refuse the fast path
    assert C.batch_uniform_p6(payloads + [encode_ppm(rand_img(8, 8))]) is None
    assert C.batch_uniform_p6([encode_bmp(imgs[0])] + payloads) is None
    assert C.batch_uniform_p6([]) is None


def test_resize_nearest_geometry():
    img = rand_img(32, 48)
    small = C.resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    # exact gather: output pixel (0,0) is input pixel (0,0)
    assert np.array_equal(small[0, 0], img[0, 0])


# ---------------------------------------------------------------------------
# Spark operators over the real codecs
# ---------------------------------------------------------------------------


def test_decode_pixel_features_spark(spark):
    img = rand_img(12, 12)
    rows = [
        (0, bytearray(encode_bmp(img))),
        (1, bytearray(encode_ppm(img))),
        (2, bytearray(encode_png(img, [y % 5 for y in range(12)]))),
        (3, bytearray(b"garbage bytes")),
        (4, bytearray(encode_gif(np.zeros((5, 5), dtype=np.uint8),
                                 np.array([[9, 9, 9]], dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in MM.decode_pixel_features(df).collect()}
    lum = C.luminance(img)
    for did, fmt in [(0, "bmp"), (1, "ppm"), (2, "png")]:
        r = out[did]
        assert r.format == fmt and r.width == 12 and r.height == 12 and r.n_pixels == 144
        assert r.pixel_md5 == hashlib.md5(img.tobytes()).hexdigest()
        assert abs(r.mean_luma - lum.mean()) < 1e-9
        assert abs(r.std_luma - lum.std()) < 1e-9
    # all three containers decode to the SAME pixels -> same perceptual hash
    assert out[0].ahash64 == out[1].ahash64 == out[2].ahash64
    bad = out[3]
    assert bad.format is None and bad.pixel_md5 is None and bad.ahash64 is None
    gif = out[4]
    assert gif.format == "gif" and gif.n_pixels == 25 and gif.mean_luma == 9.0


def test_decode_audio_features_spark(spark):
    rate = 4000
    t = np.arange(rate // 2) / rate
    wav = encode_wav(np.stack([0.25 * np.sin(2 * np.pi * 100 * t)], axis=1), rate)
    df = spark.createDataFrame(
        [(0, bytearray(wav)), (1, bytearray(b"nope"))], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in MM.decode_audio_features(df).collect()}
    assert out[0].sample_rate == rate and out[0].n_channels == 1
    assert abs(out[0].duration_s - 0.5) < 1e-9
    assert abs(out[0].rms - 0.25 / np.sqrt(2)) < 1e-2
    assert out[1].sample_rate is None and out[1].rms is None


def test_image_near_dup_spark(spark):
    base1, base2 = rand_img(32, 32), rand_img(32, 32)
    jitter = lambda im: np.clip(
        im.astype(np.int16) + RNG.integers(-4, 5, im.shape), 0, 255
    ).astype(np.uint8)
    rows = [
        (0, bytearray(encode_bmp(base1))),
        (1, bytearray(encode_bmp(jitter(base1)))),  # near-dup of 0
        (2, bytearray(encode_png(base2))),
        (3, bytearray(encode_ppm(jitter(base2)))),  # near-dup of 2, across formats
        (4, bytearray(encode_bmp(rand_img(32, 32)))),  # unrelated
        (5, bytearray(b"corrupt")),  # null hash must not join
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = MM.decode_pixel_features(df)
    pairs = {(r.doc_a, r.doc_b) for r in MM.image_near_dup(feats, max_hamming=8).collect()}
    assert (0, 1) in pairs and (2, 3) in pairs
    assert all(4 not in p and 5 not in p for p in pairs)


def test_synthesized_ppm_oracle_arithmetic(spark):
    """The catalog path: payload synthesized from text decodes with the
    REAL codec, and every stat equals plain byte arithmetic over the
    space-padded text — the property the DuckDB oracle mirrors."""
    texts = [(0, "hello pixel world"), (1, "x" * 2000), (2, "")]
    df = MM.synthesize_ppm_payload(
        spark.createDataFrame(texts, "doc_id long, text string"), w=16, h=16
    )
    out = {r.doc_id: r for r in MM.decode_pixel_features(df).collect()}
    for did, text in texts:
        raster = text.encode()[:768].ljust(768, b" ")
        arr = np.frombuffer(raster, dtype=np.uint8).reshape(16, 16, 3)
        r = out[did]
        assert r.format == "ppm" and r.width == 16 and r.height == 16
        assert r.pixel_md5 == hashlib.md5(raster).hexdigest()
        assert abs(r.mean_luma - C.luminance(arr).mean()) < 1e-9


# ---------------------------------------------------------------------------
# Baseline JPEG (r8): pure-numpy JFIF decode + Annex-K encode twin
# ---------------------------------------------------------------------------


def _jpeg_gray():
    yy, xx = np.mgrid[0:24, 0:40]
    return ((yy * 5 + xx * 3) % 256).astype(np.uint8)


def _jpeg_rgb():
    yy, xx = np.mgrid[0:24, 0:40]
    return np.stack(
        [(yy * 255 // 24), (xx * 255 // 40), ((yy + xx) * 255 // 64)], axis=-1
    ).astype(np.uint8)


def test_jpeg_gray_roundtrip_and_goldens():
    img = _jpeg_gray()
    enc = C.encode_baseline_jpeg(img, quality=90)
    # deterministic bytes both directions, pinned (cross-version drift
    # in either codec half fails loudly here)
    assert hashlib.md5(enc).hexdigest() == "56c5ce3bb646afb10ff131e9d5ffaaf2"
    dec = C.decode_image_pixels(enc)
    assert dec.shape == (24, 40) and dec.dtype == np.uint8
    assert hashlib.md5(dec.tobytes()).hexdigest() == "ad67629cab35428db796f42db494ce58"
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 1.5 and err.max() <= 4


@pytest.mark.parametrize("quality,tol_mean,tol_max", [(95, 1.0, 4), (60, 3.0, 12)])
def test_jpeg_rgb_444_roundtrip(quality, tol_mean, tol_max):
    img = _jpeg_rgb()
    dec = C.decode_image_pixels(C.encode_baseline_jpeg(img, quality=quality))
    assert dec.shape == (24, 40, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < tol_mean and err.max() <= tol_max


def test_jpeg_420_subsampling_and_restart_goldens():
    img = _jpeg_rgb()
    enc = C.encode_baseline_jpeg(img, quality=90, subsample="420", restart_interval=3)
    assert hashlib.md5(enc).hexdigest() == "5915cfc7dda4a2d677ab6a282f7ec3b8"
    dec = C.decode_image_pixels(enc)
    assert hashlib.md5(dec.tobytes()).hexdigest() == "032600e1d573d3f9e4d76feeacd11c62"
    # chroma is box-downsampled 2x2 then replicated -> looser than 4:4:4
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 24
    # restart markers present and the no-restart encode agrees pixelwise
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    dec_nr = C.decode_image_pixels(C.encode_baseline_jpeg(img, quality=90, subsample="420"))
    assert np.array_equal(dec, dec_nr)


def test_jpeg_odd_dims_420_pads_with_edge():
    img = _jpeg_rgb()[:17, :13]
    dec = C.decode_image_pixels(C.encode_baseline_jpeg(img, subsample="420"))
    assert dec.shape == (17, 13, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4.0


def test_jpeg_q100_noise_nearly_lossless():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16), dtype=np.int64).astype(np.uint8)
    dec = C.decode_image_pixels(C.encode_baseline_jpeg(img, quality=100))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_rejects_malformed_streams():
    img = _jpeg_gray()
    enc = bytearray(C.encode_baseline_jpeg(img))
    # rewrite SOF0 -> SOF2: the scan header (Ss=0, Se=63) is illegal in
    # progressive (DC scans carry DC only, T.81 G.1.1.1.1) -> rejected
    sof = enc.find(b"\xff\xc0")
    prog = bytes(enc[:sof]) + b"\xff\xc2" + bytes(enc[sof + 2 :])
    assert C.decode_image_pixels(prog) is None
    # truncated entropy stream
    assert C.decode_image_pixels(bytes(enc[:-30])) is None
    # stray bytes after SOI
    assert C.decode_image_pixels(b"\xff\xd8\x00\x00garbage") is None


# ---------------------------------------------------------------------------
# Progressive JPEG (r8): SOF2 multi-scan decode + optimal-table encode twin
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,quality,subsample",
    [
        ("gray", 90, "444"),
        ("rgb444", 85, "444"),
        ("rgb420", 85, "420"),
        ("q10", 10, "444"),
        ("q100", 100, "444"),
    ],
)
def test_jpeg_progressive_decodes_bit_identical_to_baseline(name, quality, subsample):
    # the scan script (DC first Al=1 -> AC first bands Al=1 -> DC/AC
    # refine to Al=0) transmits every coefficient bit, so progressive
    # and baseline encodings of one source MUST decode identically
    img = _jpeg_gray() if name == "gray" else _jpeg_rgb()
    base = C.decode_image_pixels(C.encode_baseline_jpeg(img, quality=quality, subsample=subsample))
    penc = C.encode_progressive_jpeg(img, quality=quality, subsample=subsample)
    assert b"\xff\xc2" in penc  # really SOF2
    prog = C.decode_image_pixels(penc)
    assert prog is not None and np.array_equal(base, prog)


def test_jpeg_progressive_goldens_and_eobrun():
    # a flat image produces long EOB runs (EOBn symbols + appended run
    # bits) in the AC-first scans — the path Annex K tables can't even
    # express; golden hashes pin both codec halves
    flat = np.full((64, 64), 128, np.uint8)
    enc = C.encode_progressive_jpeg(flat)
    assert hashlib.md5(enc).hexdigest() == "040aab3d1a5308b7d5cf356e946bf8cf"
    dec = C.decode_image_pixels(enc)
    assert np.array_equal(dec, flat)
    # graded image golden (exercises AC refine correction bits)
    enc2 = C.encode_progressive_jpeg(_jpeg_rgb(), quality=85, subsample="420")
    assert hashlib.md5(enc2).hexdigest() == "ecfd68bb6f4ec233a65110ed2976a276"
    dec2 = C.decode_image_pixels(enc2)
    base2 = C.decode_image_pixels(C.encode_baseline_jpeg(_jpeg_rgb(), quality=85, subsample="420"))
    assert np.array_equal(dec2, base2)


def test_jpeg_progressive_odd_dims_and_noise():
    img = _jpeg_rgb()[:17, :13]
    dec = C.decode_image_pixels(C.encode_progressive_jpeg(img, subsample="420"))
    base = C.decode_image_pixels(C.encode_baseline_jpeg(img, subsample="420"))
    assert dec.shape == (17, 13, 3) and np.array_equal(dec, base)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (56, 72, 3), dtype=np.int64).astype(np.uint8)
    dec_n = C.decode_image_pixels(C.encode_progressive_jpeg(noise, quality=40, subsample="420"))
    base_n = C.decode_image_pixels(C.encode_baseline_jpeg(noise, quality=40, subsample="420"))
    assert np.array_equal(dec_n, base_n)


def test_jpeg_single_component_scan_ignores_sampling_factors():
    # T.81 A.2: a single-component scan is non-interleaved over the
    # component's own block raster; some transcoders emit grayscale with
    # 2x2 luma factors kept. Patch the SOF hv byte 0x11 -> 0x22: the
    # entropy stream is unchanged (raster order), so decode must match.
    img = _jpeg_gray()
    enc = bytearray(C.encode_baseline_jpeg(img, quality=90))
    sof = enc.find(b"\xff\xc0")
    assert enc[sof + 11] == 0x11
    enc[sof + 11] = 0x22
    dec = C.decode_image_pixels(bytes(enc))
    base = C.decode_image_pixels(C.encode_baseline_jpeg(img, quality=90))
    assert dec is not None and np.array_equal(dec, base)


def test_jpeg_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    img = _jpeg_rgb()
    clean = C.encode_baseline_jpeg(img, quality=90, subsample="420", restart_interval=3)
    base = C.decode_image_pixels(clean)
    # fill before the first restart marker and before EOI
    rst = clean.find(b"\xff\xd0")
    assert rst > 0
    padded = clean[:rst] + b"\xff\xff" + clean[rst:]
    padded = padded[:-2] + b"\xff\xff\xff" + padded[-2:]
    assert np.array_equal(C.decode_image_pixels(padded), base)
    # progressive: fill before a mid-stream DHT/SOS marker
    peng = C.encode_progressive_jpeg(img, quality=90)
    sos2 = peng.find(b"\xff\xc4", peng.find(b"\xff\xda"))  # 2nd scan's DHT
    assert sos2 > 0
    ppad = peng[:sos2] + b"\xff" + peng[sos2:]
    assert np.array_equal(C.decode_image_pixels(ppad), C.decode_image_pixels(peng))


def test_jpeg_zero_component_sos_returns_none():
    # corrupt media is data, not an exception: ns=0 must not raise
    enc = bytearray(C.encode_progressive_jpeg(_jpeg_gray()))
    sos = enc.find(b"\xff\xda")
    # rewrite scan header: ns=0, keep Ss/Se bytes in range
    enc[sos + 4] = 0
    assert C.decode_image_pixels(bytes(enc)) is None


def test_jpeg_decode_speed_is_linear():
    # the bit accumulators must be truncated as bits are consumed; an
    # unmasked bigint makes decode quadratic (8.95s for this before)
    import time

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (256, 256), dtype=np.int64).astype(np.uint8)
    enc = C.encode_baseline_jpeg(img, quality=95)
    t0 = time.time()
    dec = C.decode_image_pixels(enc)
    assert dec is not None and time.time() - t0 < 2.0


def test_jpeg_progressive_truncation_returns_none():
    enc = C.encode_progressive_jpeg(_jpeg_gray())
    for cut in (30, len(enc) // 2, len(enc) - 10):
        assert C.decode_image_pixels(enc[:cut]) is None


def test_jpeg_progressive_header_parse_and_spark_features(spark):
    gray, rgb = _jpeg_gray(), _jpeg_rgb()
    enc_g = C.encode_progressive_jpeg(gray, quality=90)
    assert MM.parse_image_header(enc_g) == ("jpeg", 40, 24)
    rows = [
        (0, bytearray(enc_g)),
        (1, bytearray(C.encode_progressive_jpeg(rgb, quality=90, subsample="420"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in MM.decode_pixel_features(df).collect()}
    for did in (0, 1):
        r = out[did]
        dec = C.decode_image_pixels(bytes(rows[did][1]))
        assert r.format == "jpeg" and r.width == 40 and r.height == 24
        assert r.pixel_md5 == hashlib.md5(dec.tobytes()).hexdigest()


def test_jpeg_header_parse_no_entropy_decode():
    enc = C.encode_baseline_jpeg(_jpeg_rgb(), subsample="420")
    assert MM.parse_image_header(enc) == ("jpeg", 40, 24)
    # truncating to the SOF region still parses (metadata never needs
    # the entropy segment)
    sof = enc.find(b"\xff\xc0")
    assert MM.parse_image_header(enc[: sof + 9]) == ("jpeg", 40, 24)


def test_jpeg_through_decode_pixel_features_spark(spark):
    gray, rgb = _jpeg_gray(), _jpeg_rgb()
    rows = [
        (0, bytearray(C.encode_baseline_jpeg(gray, quality=90))),
        (1, bytearray(C.encode_baseline_jpeg(rgb, quality=90, subsample="420"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in MM.decode_pixel_features(df).collect()}
    for did, src in ((0, gray), (1, rgb)):
        r = out[did]
        assert r.format == "jpeg" and r.width == 40 and r.height == 24
        dec = C.decode_image_pixels(bytes(rows[did][1]))
        assert r.pixel_md5 == hashlib.md5(dec.tobytes()).hexdigest()
        assert abs(r.mean_luma - C.luminance(dec).mean()) < 1e-9


def test_gif_interlaced_roundtrip():
    """Interlaced GIFs deliver rows in the 4-pass order; the decoder
    must scatter them back. Build one by encoding pass-ordered rows
    and setting the descriptor's interlace flag."""
    rng = np.random.default_rng(9)
    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    for h, w in ((16, 10), (13, 7), (3, 5), (1, 4)):
        idx = rng.integers(0, 8, (h, w), dtype=np.uint8)
        order = np.concatenate(
            [np.arange(s, h, step) for s, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        enc = bytearray(encode_gif(idx[order], palette))
        n = 8  # encoder pads the table to 8 entries for this palette
        desc_packed = 13 + n * 3 + 9
        assert enc[desc_packed - 9] == 0x2C and enc[desc_packed] == 0x00
        enc[desc_packed] = 0x40
        dec = C.decode_image_pixels(bytes(enc))
        assert dec is not None and np.array_equal(dec, palette[idx]), (h, w)
