"""Real media codecs in pure numpy + stdlib — no PIL required.

The reference treats media as opaque bytes it moves without decoding
(transfer_object_service.go:89-109). A training-data pipeline must look
inside: decode, featurize, perceptually hash. This container has no
image/audio libraries, but several real container formats need none —
their codecs are pure byte layout (BMP, PPM/PGM) or stdlib zlib (PNG)
or stdlib struct (WAV/PCM). Those are decoded HERE, for real:

- BMP: 24/32-bit uncompressed BI_RGB, bottom-up and top-down rows,
  4-byte row padding, BGR(A)->RGB.
- PPM (P6) / PGM (P5): binary Netpbm, maxval <= 255.
- PNG: 8-bit gray/RGB/RGBA, non-interlaced; zlib-inflated IDAT,
  all five scanline filters (None/Sub/Up/Average/Paeth) unfiltered.
- GIF: 87a/89a first frame, global/local color tables, pure-Python
  variable-width LZW (non-interlaced).
- WAV: RIFF/PCM 8- and 16-bit, mono/stereo, manual chunk walk.
- Y4M: YUV4MPEG2 uncompressed video -> luma frame stack.

Only entropy-coded formats (JPEG, WebP, H.26x video) stay behind the
PIL gate in `operators.multimodal.decode_real`.

Everything returns numpy arrays; the Spark face of these codecs is
Arrow-batched `mapInPandas` in `operators.multimodal` — a pure map,
no shuffle, codec parallelism = executor parallelism at 100 TB.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# Image pixel decode
# ---------------------------------------------------------------------------


def _decode_bmp(payload: bytes) -> np.ndarray | None:
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (dib,) = struct.unpack_from("<I", payload, 14)
    if dib < 40:  # BITMAPCOREHEADER etc. — header parse only, no pixels
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    need = data_off + row_bytes * h
    if len(payload) < need:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = rows.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    if nch == 4:  # BGRA -> RGBA (alpha preserved)
        return np.ascontiguousarray(rows[:, :, [2, 1, 0, 3]])
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def _decode_netpbm(payload: bytes) -> np.ndarray | None:
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"56":
        return None
    binary_rgb = payload[1:2] == b"6"
    # tokenize the ASCII preamble: magic, width, height, maxval
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3 and i < min(len(payload), 4096):
        c = payload[i : i + 1]
        if c == b"#":
            j = payload.find(b"\n", i)
            i = len(payload) if j < 0 else j + 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(tokens) < 3 or not payload[i : i + 1].isspace():
        return None
    i += 1  # exactly ONE whitespace byte separates maxval from raster
    w, h, maxval = tokens
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    nch = 3 if binary_rgb else 1
    need = w * h * nch
    if len(payload) - i < need:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
    return arr.reshape(h, w, nch) if binary_rgb else arr.reshape(h, w)


def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int] | None:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    CLEAR resets the table, EOI terminates. Returns pixel indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    width = 0
    next_code = 0
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                return None  # corrupt stream
            out.extend(entry)
            if len(out) > max_pixels:
                return out[:max_pixels]
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _decode_gif(payload: bytes) -> np.ndarray | None:
    """GIF87a/89a first frame: global/local color table, pure-Python
    LZW, no interlace. Animated GIFs yield their first image."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        packed = payload[10]
        i = 13
        gct = None
        if packed & 0x80:
            n = 2 ** ((packed & 0x07) + 1)
            gct = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
            i += n * 3
        while i < len(payload):
            b0 = payload[i]
            if b0 == 0x21:  # extension: label + sub-blocks
                i += 2
                while i < len(payload) and payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
            elif b0 == 0x2C:  # image descriptor
                w, h = struct.unpack_from("<HH", payload, i + 5)
                ipacked = payload[i + 9]
                i += 10
                ct = gct
                if ipacked & 0x80:
                    n = 2 ** ((ipacked & 0x07) + 1)
                    ct = np.frombuffer(payload, np.uint8, n * 3, i).reshape(n, 3)
                    i += n * 3
                if ipacked & 0x40 or ct is None or w <= 0 or h <= 0:
                    return None  # interlace out of scope; no color table
                min_code = payload[i]
                i += 1
                data = bytearray()
                while i < len(payload) and payload[i] != 0:
                    ln = payload[i]
                    data += payload[i + 1 : i + 1 + ln]
                    i += 1 + ln
                idx = _gif_lzw_decode(bytes(data), min_code, w * h)
                if idx is None or len(idx) < w * h:
                    return None
                arr = np.asarray(idx[: w * h], dtype=np.int32)
                if arr.max() >= ct.shape[0]:
                    return None
                return ct[arr].reshape(h, w, 3)
            elif b0 == 0x3B:  # trailer
                return None
            else:
                return None
    except (IndexError, struct.error):
        return None
    return None


_PNG_CH = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> channels (8-bit only)


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. Rows carry a leading filter-type byte;
    Sub/Average/Paeth have intra-row serial dependencies, so the scan is
    per-row Python over vectorized numpy rows — still thousands of rows
    per second, and the Spark layer batches per partition."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        if ftype == 0:  # None
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub
            line = cur.copy()
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = line.astype(np.uint8)
        prev = out[y]
    return out


def _decode_png(payload: bytes) -> np.ndarray | None:
    if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack_from(
        ">IIBBBBB", payload, 16
    )
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CH:
        return None  # paletted/16-bit/Adam7 stay out of scope
    nch = _PNG_CH[color_type]
    # walk chunks, concatenate IDAT
    idat = bytearray()
    i = 8
    while i + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat += payload[i + 8 : i + 8 + clen]
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if not idat:
        return None
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error:
        return None
    stride = w * nch
    if raw.size != h * (stride + 1):
        return None
    out = _png_unfilter(raw, h, stride, nch)
    arr = out.reshape(h, w, nch)
    return arr[:, :, 0] if nch == 1 else arr


def decode_image_pixels(payload: bytes | None) -> np.ndarray | None:
    """Full REAL pixel decode: bytes -> uint8 array (h, w[, channels]).

    Supports BMP (24/32-bit BI_RGB), PPM/PGM binary, PNG 8-bit
    gray/RGB/RGBA non-interlaced, GIF87a/89a non-interlaced (pure-
    Python LZW; first frame of animations). Returns None for anything
    else — corrupt or exotic media is data, not an exception, at
    100 TB.
    """
    if not payload:
        return None
    try:
        for dec in (_decode_bmp, _decode_png, _decode_netpbm, _decode_gif):
            arr = dec(payload)
            if arr is not None:
                return arr
    except (ValueError, struct.error):
        return None
    return None


def batch_uniform_p6(payloads: list) -> np.ndarray | None:
    """Vectorized fast path: if EVERY payload is a P6 with the
    identical header (same dims) and identical total length, decode
    the whole Arrow batch as ONE frombuffer+reshape -> (n, h, w, 3).
    Returns None when the batch is mixed — callers fall back to the
    per-payload scalar decoder, whose results are bit-identical (the
    fast path is pure layout, no arithmetic).

    This is the thumbnail-pipeline case (uniform-shape rasters), where
    per-image Python dispatch dominates scalar decode cost; one
    reshape amortizes it across the batch."""
    if not payloads:
        return None
    first = bytes(payloads[0])
    if not first.startswith(b"P6"):
        return None
    arr0 = _decode_netpbm(first)
    if arr0 is None or arr0.ndim != 3:
        return None
    h, w, _ = arr0.shape
    hdr_len = len(first) - h * w * 3
    header = first[:hdr_len]
    total = len(first)
    for p in payloads:
        if len(p) != total or not bytes(p[:hdr_len]) == header:
            return None
    big = np.frombuffer(b"".join(bytes(p) for p in payloads), dtype=np.uint8)
    return big.reshape(len(payloads), total)[:, hdr_len:].reshape(len(payloads), h, w, 3)


def batch_image_stats(stack: np.ndarray) -> dict:
    """Vectorized image_stats over a uniform (n, h, w, 3) stack —
    value-identical to per-image `image_stats` (same single-division
    mean, same block-mean hash construction, broadcast across n)."""
    n, h, w, _ = stack.shape
    flat = stack.reshape(n, -1).astype(np.int64)
    byte_sum = flat.sum(axis=1)
    lum = stack.astype(np.float64).mean(axis=3)  # (n, h, w)
    # ahash: 8x8 area thumbnail per image
    bh, bw = h // 8, w // 8
    weights = np.arange(63, -1, -1, dtype=np.uint64)
    if bh >= 1 and bw >= 1:
        thumb = lum[:, : bh * 8, : bw * 8].reshape(n, 8, bh, 8, bw).mean(axis=(2, 4))
        bits = (thumb > thumb.mean(axis=(1, 2), keepdims=True)).astype(np.uint64)
        ahash = (bits.reshape(n, 64) << weights).sum(axis=1)
    else:
        ahash = np.array([ahash64(stack[i]) for i in range(n)], dtype=np.uint64)
    # dhash: 8x9 area thumbnail per image
    dh, dw = h // 8, w // 9
    if dh >= 1 and dw >= 1:
        t9 = lum[:, : dh * 8, : dw * 9].reshape(n, 8, dh, 9, dw).mean(axis=(2, 4))
        dbits = (t9[:, :, 1:] > t9[:, :, :-1]).astype(np.uint64)
        dhash = (dbits.reshape(n, 64) << weights).sum(axis=1)
    else:
        dhash = np.array([dhash64(stack[i]) for i in range(n)], dtype=np.uint64)
    return {
        "width": w,
        "height": h,
        "n_pixels": h * w,
        "mean_luma": byte_sum / (h * w * 3),
        "std_luma": lum.std(axis=(1, 2)),
        "ahash64": ahash,
        "dhash64": dhash,
    }


# ---------------------------------------------------------------------------
# Image features: luminance stats, nearest-neighbor resize, perceptual hash
# ---------------------------------------------------------------------------


def luminance(arr: np.ndarray) -> np.ndarray:
    """Per-pixel luma as float64. Gray passes through; color uses the
    integer-exact channel mean so byte-arithmetic oracles can mirror it."""
    if arr.ndim == 2:
        return arr.astype(np.float64)
    return arr[:, :, :3].astype(np.float64).mean(axis=2)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample via index gather — the real thumbnailing
    primitive (no interpolation libs needed)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


def resize_area(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area (block-mean) downsample of a 2-D array — the anti-aliased
    resize perceptual hashing needs: per-pixel noise is averaged over
    the whole block (sigma/block_size), where nearest-neighbor GATHER
    passes single-pixel jitter straight into the hash cell (measured:
    planted-near-dup recall 0.002 with gather vs ~1.0 with area means
    on low-variance rasters). Crops to the largest block-divisible
    region; falls back to gather when upsampling."""
    h, w = arr.shape[:2]
    if h < out_h or w < out_w:
        return resize_nearest(arr, out_h, out_w).astype(np.float64)
    bh, bw = h // out_h, w // out_w
    a = arr[: bh * out_h, : bw * out_w].astype(np.float64)
    return a.reshape(out_h, bh, out_w, bw).mean(axis=(1, 3))


def ahash64(arr: np.ndarray) -> int:
    """Average hash: 8x8 area-resampled luma thumbnail, 1 bit per cell
    (above/below thumbnail mean), MSB-first row-major -> uint64. The
    image twin of simhash: hamming distance ~ perceptual distance."""
    thumb = resize_area(luminance(arr), 8, 8)
    bits = (thumb > thumb.mean()).astype(np.uint64).ravel()
    return int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum())


def dhash64(arr: np.ndarray) -> int:
    """Difference hash: 8x9 area-resampled luma thumbnail, bit =
    left<right gradient. More robust than ahash to global brightness
    shifts."""
    thumb = resize_area(luminance(arr), 8, 9)
    bits = (thumb[:, 1:] > thumb[:, :-1]).astype(np.uint64).ravel()
    return int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum())


def image_stats(arr: np.ndarray) -> dict:
    """Deterministic per-image features over REAL decoded pixels.

    mean_luma is ONE division of exact integers (byte_sum / byte_count)
    rather than numpy's accumulated float mean: both engines of the
    oracle gate then produce the bit-identical double, so HALF_UP
    rounding at 6 dp can't diverge on a boundary (the mm_decode_frames
    mean_byte precedent)."""
    h, w = arr.shape[:2]
    nch = 1 if arr.ndim == 2 else min(arr.shape[2], 3)
    rgb = arr if arr.ndim == 2 else arr[:, :, :3]
    byte_sum = int(rgb.astype(np.int64).sum())
    return {
        "width": int(w),
        "height": int(h),
        "n_pixels": int(h * w),
        "mean_luma": byte_sum / (h * w * nch),
        "std_luma": float(luminance(arr).std()),
        "ahash64": ahash64(arr),
        "dhash64": dhash64(arr),
    }


# ---------------------------------------------------------------------------
# Video decode (Y4M / YUV4MPEG2 — uncompressed, the PPM of video)
# ---------------------------------------------------------------------------


def decode_y4m(
    payload: bytes | None, max_frames: int = 256
) -> tuple[float, np.ndarray] | None:
    """REAL video decode: YUV4MPEG2 container -> (fps, luma frames as
    uint8 array (n, h, w)). Parses the ASCII stream header (W/H/F
    tags), walks FRAME markers, and reads each frame's Y plane (chroma
    planes are skipped per the declared subsampling; 420/422/444
    supported). None for anything else — same corrupt-is-data contract
    as the image/audio codecs. ``max_frames`` bounds memory per record.
    """
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = 0
    fps = 0.0
    chroma = "420"
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        c, val = tag[:1], tag[1:]
        try:
            if c == b"W":
                w = int(val)
            elif c == b"H":
                h = int(val)
            elif c == b"F":
                num, den = val.split(b":")
                fps = int(num) / int(den)
            elif c == b"C":
                chroma = val.decode("ascii", "ignore")
        except (ValueError, ZeroDivisionError):
            return None
    if w <= 0 or h <= 0 or fps <= 0:
        return None
    y_size = w * h
    if chroma.startswith("420"):
        frame_size = y_size + 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("422"):
        frame_size = y_size + 2 * ((w // 2) * h)
    elif chroma.startswith("444"):
        frame_size = 3 * y_size
    else:
        return None
    frames: list[np.ndarray] = []
    i = nl + 1
    while i < len(payload) and len(frames) < max_frames:
        if payload[i : i + 5] != b"FRAME":
            return None  # torn stream: refuse rather than emit garbage
        j = payload.find(b"\n", i)
        if j < 0 or len(payload) - (j + 1) < frame_size:
            return None
        y = np.frombuffer(payload, dtype=np.uint8, count=y_size, offset=j + 1)
        frames.append(y.reshape(h, w))
        i = j + 1 + frame_size
    if not frames:
        return None
    return fps, np.stack(frames)


def video_fingerprint64(frames: np.ndarray) -> int:
    """64-bit temporal video fingerprint: per-frame mean luma resampled
    to 65 points, bit i = luma rises from point i to i+1 — the same
    rise/fall comparison scheme as the audio fingerprint, over the
    scene-brightness curve. Invariant to global gain/contrast scaling;
    hamming ~ temporal dissimilarity (cuts, motion)."""
    curve = frames.reshape(frames.shape[0], -1).mean(axis=1)
    n = curve.shape[0]
    # n == 1: a flat "curve" — every comparison false, fingerprint 0
    # (indexing with (n-1)=0 keeps idx in range; max(n-1,1) did NOT
    # and crashed the task on single-frame clips)
    idx = (np.arange(65) * (n - 1)) // 64
    pts = curve[idx]
    bits = (pts[1:] > pts[:-1]).astype(np.uint64)
    return int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum())


def video_stats(fps: float, frames: np.ndarray) -> dict:
    """Per-video features over REAL decoded luma frames: geometry,
    duration, luminance stats, temporal fingerprint, and the spatial
    ahash of the middle frame (thumbnail identity)."""
    n, h, w = frames.shape
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": int(n),
        "fps": float(fps),
        "duration_s": float(n / fps),
        "mean_luma": float(frames.mean()),
        "vhash64": video_fingerprint64(frames),
        "mid_ahash64": ahash64(frames[n // 2]),
    }


# ---------------------------------------------------------------------------
# Audio decode (WAV / RIFF, PCM)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """REAL WAV decode: RIFF chunk walk -> (sample_rate, float32 samples
    in [-1, 1], shape (n_samples, n_channels)). PCM 8-bit unsigned and
    16-bit signed little-endian. None for anything else."""
    if not payload or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or n_ch < 1 or rate <= 0 or bits not in (8, 16):
        return None
    if bits == 16:
        n = len(data) // (2 * n_ch)
        samples = np.frombuffer(data, dtype="<i2", count=n * n_ch).astype(np.float32) / 32768.0
    else:
        n = len(data) // n_ch
        samples = (
            np.frombuffer(data, dtype=np.uint8, count=n * n_ch).astype(np.float32) - 128.0
        ) / 128.0
    if n == 0:
        return None
    return rate, samples.reshape(n, n_ch)


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit perceptual audio fingerprint: mono mixdown, 65 equal
    energy frames, bit i = energy rises from frame i to i+1 (the
    energy-delta comparison scheme classic audio fingerprinting is
    built on). Invariant to amplitude scaling (a monotone gain scales
    every frame's energy equally, preserving all comparisons) and
    robust to mild noise; hamming distance ~ waveform dissimilarity —
    the audio twin of dhash."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = mono.shape[0]
    if n < 65:
        mono = np.pad(mono, (0, 65 - n))
        n = 65
    edges = (np.arange(66) * n) // 65
    energy = np.array(
        [float(np.sum(mono[edges[i] : edges[i + 1]] ** 2)) for i in range(65)]
    )
    bits = (energy[1:] > energy[:-1]).astype(np.uint64)
    return int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum())


def audio_stats(rate: int, samples: np.ndarray) -> dict:
    """Waveform features over REAL decoded PCM: duration, RMS energy,
    peak, zero-crossing rate (mono mixdown)."""
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return {
        "sample_rate": int(rate),
        "n_channels": int(samples.shape[1]),
        "n_samples": int(n),
        "duration_s": float(n / rate),
        "rms": float(np.sqrt(np.mean(mono**2))),
        "peak": float(np.abs(mono).max()),
        "zero_cross_rate": float(zc / max(n - 1, 1)),
    }
