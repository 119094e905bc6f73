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
- PNG: gray/RGB/RGBA/palette at 1/2/4/8/16-bit depths, Adam7
  interlace, PLTE+tRNS; zlib-inflated IDAT, all five scanline
  filters (None/Sub/Up/Average/Paeth) unfiltered per pass.
- GIF: 87a/89a first frame, global/local color tables, pure-Python
  variable-width LZW, 4-pass interlace.
- TIFF: 6.0 strips, both byte orders, none/LZW-EarlyChange/PackBits,
  horizontal predictor; `encode_tiff` twin.
- WAV: RIFF walk — PCM 8/16/24/32, float32, G.711 mu-law/A-law, IMA
  and MS ADPCM, EXTENSIBLE; AIFF (80-bit rates, BE PCM); Sun AU.
- Y4M: YUV4MPEG2 uncompressed video -> luma frame stack.
- JPEG (r8): baseline JFIF — SOF0/SOF1 Huffman sequential, gray /
  4:4:4 / 4:2:0, 8/16-bit DQT, RSTn restarts — decoded for real
  (marker walk -> Huffman entropy decode -> dequant -> IDCT ->
  YCbCr->RGB), plus an `encode_baseline_jpeg` twin (Annex K tables)
  that builds interoperable fixtures in-sandbox and serves as the
  entropy-coded member of the sink-side codec family.
- Progressive JPEG (r8): SOF2 spectral selection + successive
  approximation (T.81 Annex G) — multi-scan coefficient accumulation
  (DC first/refine, AC first with EOB runs, AC refine correction
  bits), plus an `encode_progressive_jpeg` twin with per-scan optimal
  Huffman tables (T.81 K.2; the Annex K sequential tables carry no
  EOBn symbols). The full scan script transmits every coefficient
  bit, so progressive and baseline encodings of one source decode
  bit-identically — the round-trip self-check in tests.

- Lossless WebP (r8): VP8L — Huffman + LZ77 + 4 reversible
  transforms, in `operators.webp` (with an `encode_lossless_webp`
  twin and EXTERNAL validation against a real libwebp bitstream).

Only arithmetic-coded formats — lossy VP8 WebP, arithmetic/lossless
JPEG, H.26x video — stay behind the PIL gate in
`operators.multimodal.decode_real`.

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
                if ct is None or w <= 0 or h <= 0:
                    return None  # no color table anywhere
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
                img = ct[arr].reshape(h, w, 3)
                if ipacked & 0x40:
                    # interlaced: rows arrive in the four GIF passes
                    # (8/8, 8/8+4, 4/4+2, 2/2+1) — scatter them back
                    order = np.concatenate(
                        [np.arange(s, h, step) for s, step in
                         ((0, 8), (4, 8), (2, 4), (1, 2))]
                    )
                    out = np.empty_like(img)
                    out[order] = img
                    return out
                return img
            elif b0 == 0x3B:  # trailer
                return None
            else:
                return None
    except (IndexError, struct.error):
        return None
    return None




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


# Adam7 interlace passes: (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
_PNG_NCH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unpack_rows(
    flt: np.ndarray, ph: int, pw: int, nch: int, depth: int
) -> np.ndarray:
    """Unfiltered scanline bytes -> (ph, pw, nch) samples at the file's
    depth (uint8 for <=8, uint16 for 16). Sub-byte depths unpack
    MSB-first per PNG's packing."""
    if depth == 8:
        return flt[:, : pw * nch].reshape(ph, pw, nch)
    if depth == 16:
        a = flt.reshape(ph, -1)[:, : pw * nch * 2].reshape(ph, pw * nch, 2)
        vals = a[..., 0].astype(np.uint16) * 256 + a[..., 1]
        return vals.reshape(ph, pw, nch)
    # 1/2/4-bit: unpack bits row-wise, regroup into depth-bit samples
    bits = np.unpackbits(flt, axis=1)
    spb = bits.shape[1] // depth
    vals = np.zeros((ph, spb), dtype=np.uint8)
    for k in range(depth):
        vals = (vals << 1) | bits[:, k::depth][:, :spb]
    return vals[:, : pw * nch].reshape(ph, pw, nch)


def _decode_png(payload: bytes) -> np.ndarray | None:
    if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h, depth, color_type, comp, filt, interlace = struct.unpack_from(
        ">IIBBBBB", payload, 16
    )
    if (
        comp != 0 or filt != 0 or interlace > 1 or w == 0 or h == 0
        or color_type not in _PNG_DEPTHS or depth not in _PNG_DEPTHS[color_type]
    ):
        return None
    nch = _PNG_NCH[color_type]
    idat = bytearray()
    plte: np.ndarray | None = None
    trns: bytes | None = None
    i = 8
    while i + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat += payload[i + 8 : i + 8 + clen]
        elif ctype == b"PLTE":
            plte = np.frombuffer(payload[i + 8 : i + 8 + clen], dtype=np.uint8)
            if plte.size % 3:
                return None
            plte = plte.reshape(-1, 3)
        elif ctype == b"tRNS" and color_type == 3:
            trns = payload[i + 8 : i + 8 + clen]
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if not idat or (color_type == 3 and plte is None):
        return None
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error:
        return None
    bpp = max(1, nch * depth // 8)
    dt = np.uint16 if depth == 16 else np.uint8
    img = np.zeros((h, w, nch), dtype=dt)
    passes = [(0, 0, 1, 1)] if interlace == 0 else _ADAM7
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = (pw * nch * depth + 7) // 8
        need = ph * (stride + 1)
        if pos + need > raw.size:
            return None
        try:
            flt = _png_unfilter(raw[pos : pos + need], ph, stride, bpp)
        except ValueError:
            return None  # bad filter byte: corrupt stream, not an error
        pos += need
        img[y0::dy, x0::dx] = _png_unpack_rows(flt, ph, pw, nch, depth)
    if pos != raw.size:
        return None
    # sample-depth conversions to the pipeline's uint8 convention
    if depth == 16:
        img = (img >> 8).astype(np.uint8)
    elif depth < 8 and color_type == 0:
        img = (img.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if color_type == 3:
        idx = img[:, :, 0]
        if plte is None or int(idx.max()) >= plte.shape[0]:
            return None
        rgb = plte[idx]
        if trns:
            alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img[:, :, 0] if nch == 1 else img


# ---------------------------------------------------------------------------
# Baseline JPEG (JFIF / ITU T.81 sequential DCT, Huffman)
# ---------------------------------------------------------------------------
# Public-knowledge decode: marker walk -> DQT/DHT/SOF0/SOS -> per-MCU
# Huffman entropy decode (byte-stuffed bit reader, RSTn restarts) ->
# dequantize -> de-zigzag -> 8x8 IDCT (exact float basis-matrix form)
# -> chroma upsample -> YCbCr->RGB. Baseline + extended-sequential
# (SOF0/SOF1) only: progressive (SOF2) and arithmetic coding return
# None and stay behind the PIL gate in operators.multimodal.

# zigzag scan position k -> natural (row-major) position
_JPEG_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _jpeg_dct_basis() -> np.ndarray:
    # A[x, u] = c(u)/2 * cos((2x+1) u pi / 16); pixels = A @ coefs @ A.T
    u = np.arange(8)
    x = np.arange(8)
    a = np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16) / 2
    a[:, 0] *= 1 / np.sqrt(2)
    return a


_JPEG_A = _jpeg_dct_basis()


class _JpegBits:
    """Entropy-segment bit reader: 0xFF00 unstuffs to 0xFF; any other
    marker ends the readable stream (restart handling splits segments
    BEFORE reading, so hitting a marker here means truncation)."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                return self.n > 0
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                    self.pos += 2
                else:
                    return self.n > 0  # marker: stream ends
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        return True

    def take(self, k: int) -> int | None:
        if k == 0:
            return 0
        if self.n < k and not self._fill():
            return None
        if self.n < k:
            return None
        self.n -= k
        out = (self.acc >> self.n) & ((1 << k) - 1)
        # truncate consumed history — an unmasked bigint accumulator
        # makes every shift copy the whole stream (quadratic decode)
        self.acc &= (1 << self.n) - 1
        return out

    def take1(self) -> int | None:
        return self.take(1)


def _jpeg_build_huff(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman from the DHT (BITS, HUFFVAL) form:
    {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(br: _JpegBits, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        bit = br.take1()
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _jpeg_extend(v: int, s: int) -> int:
    # T.81 F.2.2.1: magnitude category s, raw bits v
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_decode_block(
    br: _JpegBits,
    dc_tab: dict,
    ac_tab: dict,
    pred: int,
) -> tuple[np.ndarray, int] | None:
    s = _jpeg_huff_decode(br, dc_tab)
    if s is None or s > 15:
        return None
    if s:
        raw = br.take(s)
        if raw is None:
            return None
        pred += _jpeg_extend(raw, s)
    coef = np.zeros(64, dtype=np.float64)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _jpeg_huff_decode(br, ac_tab)
        if rs is None:
            return None
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        raw = br.take(size)
        if raw is None:
            return None
        coef[_JPEG_ZZ[k]] = _jpeg_extend(raw, size)
        k += 1
    return coef, pred


def _jpeg_restart_segments(data: bytes) -> list[bytes]:
    """Split an entropy-coded segment on RSTn markers (each sub-segment
    restarts DC predictors and, in progressive scans, the EOB run)."""
    segments = []
    start = 0
    i = 0
    while i + 1 < len(data):
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
            segments.append(data[start:i])
            start = i + 2
            i += 2
        elif data[i] == 0xFF and data[i + 1] == 0xFF:
            i += 1  # fill byte preceding a marker (T.81 B.1.1.2)
        elif data[i] == 0xFF and data[i + 1] not in (0x00,):
            break  # EOI or next marker
        else:
            i += 1
    segments.append(data[start:])
    return segments


def _jpeg_upsample_color(
    comps: list, planes: list[np.ndarray], hmax: int, vmax: int, h_img: int, w_img: int
) -> np.ndarray:
    """Shared decode tail: replicate subsampled chroma to full res, crop
    to the frame dims, level-shift, and YCbCr->RGB for 3-component."""
    full = []
    for comp, plane in zip(comps, planes):
        _, hs, vs, _ = comp
        if hs != hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        if vs != vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        full.append(plane[:h_img, :w_img] + 128.0)
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_jpeg(payload: bytes) -> np.ndarray | None:
    out = _decode_jpeg_impl(payload, lossless_exact=False)
    return out if out is None or isinstance(out, np.ndarray) else None


def _decode_jpeg_impl(payload: bytes, lossless_exact: bool = False):
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    progressive = False
    lossless = False
    precision = 8
    coefs: list[np.ndarray] | None = None  # per-comp (by, bx, 64) natural-order
    restart = 0
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > n:
            return None
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    return None
                if tbl.size != 64:
                    return None
                nat = np.zeros(64)
                nat[_JPEG_ZZ] = tbl  # table is transmitted in zigzag order
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = seg[i + 17 : i + 17 + nv]
                if len(vals) != nv:
                    return None
                huff[(tc, th)] = _jpeg_build_huff(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1 seq, SOF2 prog, SOF3 lossless
            if len(seg) < 6:
                return None
            precision = seg[0]
            if marker != 0xC3 and precision != 8:
                return None
            if marker == 0xC3 and not (2 <= precision <= 16):
                return None
            h_img, w_img, ncomp = struct.unpack_from(">HHB", seg, 1)
            if len(seg) < 6 + 3 * ncomp:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    return None  # T.81 B.2.2: sampling factors 1-4
                comps.append((cid, hs, vs, tq))
            if marker == 0xC3:
                if ncomp < 1 or ncomp > 4 or any(
                    hs != 1 or vs != 1 for _cid, hs, vs, _tq in comps
                ):
                    return None  # lossless: 1x1 sampling only (typical form)
            elif ncomp not in (1, 3):
                return None
            if w_img == 0 or h_img == 0:
                return None
            frame = (h_img, w_img, comps)
            progressive = marker == 0xC2
            lossless = marker == 0xC3
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # hierarchical / arithmetic coding: PIL gate
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg)
        elif marker == 0xDA:  # SOS
            if frame is None or len(seg) < 4:
                return None
            ns = seg[0]
            if ns == 0 or len(seg) < 4 + 2 * ns:
                return None
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            if lossless:
                h_img, w_img, comps = frame
                if ns != len(comps) or len(seg) < 1 + 2 * ns + 3:
                    return None
                pred_sel = seg[1 + 2 * ns]  # Ss carries the predictor
                pt = seg[3 + 2 * ns] & 0x0F  # Al carries the point transform
                planes = _jpeg_lossless_scan(
                    precision, h_img, w_img, scan, huff, restart,
                    payload[pos + seglen :], pred_sel, pt,
                )
                if planes is None:
                    return None
                arr = np.moveaxis(planes, 0, -1)
                if arr.shape[2] == 1:
                    arr = arr[:, :, 0]
                if lossless_exact:
                    return arr.astype(np.uint16), precision
                # display conversion for the feature pipeline (uint8)
                if precision > 8:
                    arr = arr >> (precision - 8)
                elif precision < 8:
                    arr = arr << (8 - precision)
                return arr.astype(np.uint8)
            if not progressive:
                data = payload[pos + seglen :]
                return _jpeg_decode_scan(frame, scan, qt, huff, restart, data)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if coefs is None:
                coefs = _jpeg_prog_alloc(frame)
            end = _jpeg_scan_end(payload, pos + seglen)
            ok = _jpeg_prog_scan(
                frame, scan, ss, se, ah, al, coefs, huff, restart,
                payload[pos + seglen : end],
            )
            if not ok:
                return None
            pos = end
            continue
        pos += seglen
    if progressive and coefs is not None:
        return _jpeg_prog_finish(frame, coefs, qt)
    return None


def _jpeg_decode_scan(frame, scan, qt, huff, restart, data) -> np.ndarray | None:
    h_img, w_img, comps = frame
    if len(scan) != len(comps):
        return None  # non-interleaved multi-scan: not baseline-typical
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is non-interleaved over the
        # component's own ceil(w/8) x ceil(h/8) raster regardless of its
        # declared sampling factors (some transcoders keep 2x2 luma
        # factors on grayscale output); neutralizing hs/vs makes the MCU
        # walk below BE that raster
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        comp = by_id.get(cs)
        if comp is None or (0, td) not in huff or (1, ta) not in huff:
            return None
        order.append((comp, huff[(0, td)], huff[(1, ta)]))
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), dtype=np.float64) for c, _, _ in order
    ]
    for c, _, _ in order:
        if c[3] not in qt:
            return None

    # split on restart markers up front; each segment resets predictors
    segments = _jpeg_restart_segments(data) if restart else [data]

    n_mcu = mcux * mcuy
    seg_idx = 0
    br = _JpegBits(segments[0])
    preds = [0] * len(order)
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                return None
            br = _JpegBits(segments[seg_idx])
            preds = [0] * len(order)
        my, mx = divmod(m, mcux)
        for ci, (comp, dc_tab, ac_tab) in enumerate(order):
            _, hs, vs, tq = comp
            q = qt[tq]
            for v in range(vs):
                for hh in range(hs):
                    got = _jpeg_decode_block(br, dc_tab, ac_tab, preds[ci])
                    if got is None:
                        return None
                    coef, preds[ci] = got
                    block = _JPEG_A @ (coef.reshape(8, 8) * q) @ _JPEG_A.T
                    y0 = (my * vs + v) * 8
                    x0 = (mx * hs + hh) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample to full resolution (sample replication), crop, color
    return _jpeg_upsample_color([c for c, _, _ in order], planes, hmax, vmax, h_img, w_img)


# --- progressive (SOF2) scan machinery ------------------------------------
# T.81 Annex G successive approximation + spectral selection: DC first /
# DC refine / AC first (EOB runs) / AC refine (correction bits). Scans
# accumulate integer coefficients per component; reconstruction happens
# once at EOI. Public-knowledge algorithm (ITU T.81 figures G.2-G.7).


def _jpeg_scan_end(payload: bytes, start: int) -> int:
    """End of an entropy-coded segment: the first marker that is neither
    a stuffed 0xFF00 nor a restart RSTn."""
    i = start
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            b = payload[i + 1]
            if b == 0x00 or 0xD0 <= b <= 0xD7:
                i += 2
                continue
            if b == 0xFF:  # fill byte (T.81 B.1.1.2)
                i += 1
                continue
            return i
        i += 1
    return n


def _jpeg_geom(frame):
    h_img, w_img, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _jpeg_prog_alloc(frame) -> list[np.ndarray]:
    _, _, comps = frame
    hmax, vmax, mcux, mcuy = _jpeg_geom(frame)
    return [
        np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64) for _, hs, vs, _ in comps
    ]


def _prog_ac_first(br, ac_tab, block, ss, se, al, eobrun):
    """Decode one block of an AC first scan (T.81 G.2 / figure G.5);
    returns the updated EOB run, or None on a corrupt stream."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_huff_decode(br, ac_tab)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                return None
            raw = br.take(s)
            if raw is None:
                return None
            block[_JPEG_ZZ[k]] = _jpeg_extend(raw, s) << al
            k += 1
        else:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    ext = br.take(r)
                    if ext is None:
                        return None
                    eobrun += ext
                return eobrun
            k += 16  # ZRL
    return 0


def _prog_ac_refine(br, ac_tab, block, ss, se, al, eobrun):
    """Decode one block of an AC refinement scan (T.81 figure G.7):
    correction bits for already-nonzero coefficients plus newly
    significant +-1<<Al values; returns the updated EOB run or None."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_huff_decode(br, ac_tab)
            if rs is None:
                return None
            r, s = rs >> 4, rs & 0x0F
            sval = 0
            if s:
                if s != 1:
                    return None
                bit = br.take1()
                if bit is None:
                    return None
                sval = p1 if bit else -p1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    ext = br.take(r)
                    if ext is None:
                        return None
                    eobrun += ext
                break
            # advance over r still-zero coefficients, emitting a
            # correction bit at every already-nonzero one passed
            while k <= se:
                c = int(_JPEG_ZZ[k])
                if block[c] != 0:
                    bit = br.take1()
                    if bit is None:
                        return None
                    if bit and (block[c] & p1) == 0:
                        block[c] += p1 if block[c] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval and k <= se:
                block[int(_JPEG_ZZ[k])] = sval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB band: correction bits only
            c = int(_JPEG_ZZ[k])
            if block[c] != 0:
                bit = br.take1()
                if bit is None:
                    return None
                if bit and (block[c] & p1) == 0:
                    block[c] += p1 if block[c] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_prog_scan(frame, scan, ss, se, ah, al, coefs, huff, restart, data) -> bool:
    h_img, w_img, comps = frame
    hmax, vmax, mcux, mcuy = _jpeg_geom(frame)
    by_id = {c[0]: (i, c) for i, c in enumerate(comps)}
    order = []  # (comp_index, comp, dc_tab|None, ac_tab|None)
    for cs, td, ta in scan:
        hit = by_id.get(cs)
        if hit is None:
            return False
        ci, comp = hit
        dc_tab = huff.get((0, td))
        ac_tab = huff.get((1, ta))
        order.append((ci, comp, dc_tab, ac_tab))

    dc_scan = ss == 0
    if dc_scan and se != 0:
        return False  # progressive DC scans carry DC only (T.81 G.1.1.1.1)
    if not dc_scan and (len(scan) != 1 or se > 63 or ss > se):
        return False  # AC scans are single-component, non-interleaved

    segments = _jpeg_restart_segments(data) if restart else [data]
    seg_idx = 0
    br = _JpegBits(segments[0])
    preds = [0] * len(order)
    eobrun = 0

    if dc_scan and len(order) > 1:
        units = mcux * mcuy  # interleaved MCU walk
        wb = 0  # unused in the interleaved path
    else:
        ci, comp, _, _ = order[0]
        _, hs, vs, _ = comp
        cw = -(-w_img * hs // hmax)
        ch = -(-h_img * vs // vmax)
        wb, hb = -(-cw // 8), -(-ch // 8)
        units = wb * hb  # non-interleaved raster over the comp's own blocks

    for m in range(units):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                return False
            br = _JpegBits(segments[seg_idx])
            preds = [0] * len(order)
            eobrun = 0
        if dc_scan:
            blocks = []  # (ci, comp_idx_in_order, by, bx)
            if len(order) > 1:
                my, mx = divmod(m, mcux)
                for oi, (ci, comp, dc_tab, _) in enumerate(order):
                    _, hs, vs, _ = comp
                    for v in range(vs):
                        for hh in range(hs):
                            blocks.append((oi, ci, my * vs + v, mx * hs + hh, dc_tab))
            else:
                oi, ci = 0, order[0][0]
                blocks.append((oi, ci, m // wb, m % wb, order[0][2]))
            for oi, ci, by, bx, dc_tab in blocks:
                blk = coefs[ci][by, bx]
                if ah == 0:  # DC first: diff-coded at scale Al
                    if dc_tab is None:
                        return False
                    s = _jpeg_huff_decode(br, dc_tab)
                    if s is None or s > 15:
                        return False
                    if s:
                        raw = br.take(s)
                        if raw is None:
                            return False
                        preds[oi] += _jpeg_extend(raw, s)
                    blk[0] = preds[oi] << al
                else:  # DC refine: one bit per block
                    bit = br.take1()
                    if bit is None:
                        return False
                    if bit:
                        blk[0] |= 1 << al
        else:
            ci, comp, _, ac_tab = order[0]
            if ac_tab is None:
                return False
            blk = coefs[ci][m // wb, m % wb]
            if ah == 0:
                eobrun = _prog_ac_first(br, ac_tab, blk, ss, se, al, eobrun)
            else:
                eobrun = _prog_ac_refine(br, ac_tab, blk, ss, se, al, eobrun)
            if eobrun is None:
                return False
    return True


def _jpeg_prog_finish(frame, coefs, qt) -> np.ndarray | None:
    h_img, w_img, comps = frame
    hmax, vmax, _, _ = _jpeg_geom(frame)
    planes = []
    for (cid, hs, vs, tq), carr in zip(comps, coefs):
        if tq not in qt:
            return None
        by, bx, _ = carr.shape
        deq = carr.reshape(by, bx, 8, 8).astype(np.float64) * qt[tq]
        # pixels = A @ C @ A.T, batched over the block grid — matmul
        # (not einsum) so the float summation associates exactly like
        # the sequential decoder's per-block `A @ (coef*q) @ A.T`:
        # einsum's reordered reduction differs by ULPs that can cross
        # the rint boundary and break prog==baseline bit-identity
        px = (_JPEG_A @ deq) @ _JPEG_A.T
        planes.append(px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _jpeg_upsample_color(comps, planes, hmax, vmax, h_img, w_img)


# Annex K reference tables (encoder side; the decoder reads whatever
# DQT/DHT the stream carries)
_JPEG_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_JPEG_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)
_JPEG_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JPEG_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _jpeg_enc_huff(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (encode-side twin of
    _jpeg_build_huff)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # truncate emitted history (bigint accumulators grow quadratic)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _jpeg_quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _jpeg_encode_block(
    wr: _JpegBitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc: dict,
    ac: dict,
) -> int:
    coef = _JPEG_A.T @ (block - 128.0) @ _JPEG_A
    zz = np.rint(coef / q).astype(np.int64).reshape(64)[_JPEG_ZZ]
    diff = int(zz[0]) - pred

    def mag(v: int) -> tuple[int, int]:
        s = int(abs(v)).bit_length()
        return (s, v if v >= 0 else v + (1 << s) - 1)

    s, bits_v = mag(diff)
    code, ln = dc[s]
    wr.put(code, ln)
    if s:
        wr.put(bits_v, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac[0xF0]  # ZRL
            wr.put(code, ln)
            run -= 16
        s, bits_v = mag(v)
        code, ln = ac[(run << 4) | s]
        wr.put(code, ln)
        wr.put(bits_v, s)
        run = 0
    if run:
        code, ln = ac[0x00]  # EOB
        wr.put(code, ln)
    return int(zz[0])


def _jpeg_enc_prepare(arr: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: validate, color-convert, subsample,
    MCU-pad. Returns (gray, comp_spec, padded_planes, qly, qlc, h, w,
    mcux, mcuy)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3) uint8 array")
    h_img, w_img = arr.shape[:2]
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    sub = (2, 2) if (subsample == "420" and not gray) else (1, 1)

    qly = _jpeg_quality_scale(_JPEG_QT_LUMA, quality)
    qlc = _jpeg_quality_scale(_JPEG_QT_CHROMA, quality)

    if gray:
        planes = [arr]
        comp_spec = [(1, 1, 1, 0)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sub == (2, 2):
            # pad to even dims, then 2x2 box average
            ph, pw = (h_img + 1) & ~1, (w_img + 1) & ~1
            def pad(p, ny, nx):
                return np.pad(p, ((0, ny - p.shape[0]), (0, nx - p.shape[1])), mode="edge")
            cb = pad(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        comp_spec = [(1, sub[0], sub[1], 0), (2, 1, 1, 1), (3, 1, 1, 1)]

    hmax = max(c[1] for c in comp_spec)
    vmax = max(c[2] for c in comp_spec)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    padded = []
    for (cid, hs, vs, tq), p in zip(comp_spec, planes):
        ny, nx = mcuy * vs * 8, mcux * hs * 8
        padded.append(
            np.pad(p, ((0, ny - p.shape[0]), (0, nx - p.shape[1])), mode="edge")
        )
    return gray, comp_spec, padded, qly, qlc, h_img, w_img, mcux, mcuy


def _jpeg_emit_headers(
    sof_marker: int,
    gray: bool,
    comp_spec: list,
    qly: np.ndarray,
    qlc: np.ndarray,
    h_img: int,
    w_img: int,
    restart_interval: int,
) -> bytearray:
    """SOI + JFIF + DQT + SOFn + DHT (+ DRI) — everything before the
    first SOS; shared by the baseline and progressive encoders."""
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, qly), (1, qlc)) if not gray else ((0, qly),):
        zz = tbl.reshape(64)[_JPEG_ZZ].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz.tobytes()
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * len(comp_spec), 8, h_img, w_img, len(comp_spec)
    )
    for cid, hs, vs, tq in comp_spec:
        out += bytes([cid, (hs << 4) | vs, tq])
    hts = [(0x00, _JPEG_DC_LUMA), (0x10, _JPEG_AC_LUMA)]
    if not gray:
        hts += [(0x01, _JPEG_DC_CHROMA), (0x11, _JPEG_AC_CHROMA)]
    for tcth, (bits, vals) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tcth])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def encode_baseline_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 raster — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline JFIF JPEG (SOF0, Annex K quant/Huffman tables, optional
    4:2:0 subsampling and RSTn restart intervals). The encode twin of
    ``_decode_jpeg``; used to build real in-sandbox fixtures (no image
    library ships in this container) and as the entropy-coded member of
    the sink-side codec family. Interoperable: standard markers/tables,
    decodable by any JPEG decoder."""
    gray, comp_spec, padded, qly, qlc, h_img, w_img, mcux, mcuy = _jpeg_enc_prepare(
        arr, quality, subsample
    )
    dc_l = _jpeg_enc_huff(*_JPEG_DC_LUMA)
    ac_l = _jpeg_enc_huff(*_JPEG_AC_LUMA)
    dc_c = _jpeg_enc_huff(*_JPEG_DC_CHROMA)
    ac_c = _jpeg_enc_huff(*_JPEG_AC_CHROMA)

    out = _jpeg_emit_headers(
        0xC0, gray, comp_spec, qly, qlc, h_img, w_img, restart_interval
    )
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_spec), len(comp_spec))
    for i, (cid, _, _, _) in enumerate(comp_spec):
        out += bytes([cid, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    tabs = [(qly, dc_l, ac_l)] + [(qlc, dc_c, ac_c)] * (0 if gray else 2)
    wr = _JpegBitWriter()
    preds = [0] * len(comp_spec)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wr.flush()
            out += wr.out
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            wr = _JpegBitWriter()
            preds = [0] * len(comp_spec)
        my, mx = divmod(m, mcux)
        for ci, ((cid, hs, vs, tq), plane, (q, dc, ac)) in enumerate(
            zip(comp_spec, padded, tabs)
        ):
            for v in range(vs):
                for hh in range(hs):
                    y0 = (my * vs + v) * 8
                    x0 = (mx * hs + hh) * 8
                    preds[ci] = _jpeg_encode_block(
                        wr, plane[y0 : y0 + 8, x0 : x0 + 8], q, preds[ci], dc, ac
                    )
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _NullWriter:
    """Counting-pass stand-in for _JpegBitWriter: discards bits."""

    def put(self, code: int, length: int) -> None:
        pass

    def flush(self) -> None:
        pass


class _CountTab:
    """Counting-pass stand-in for an encode Huffman table: records
    symbol frequencies and hands back a zero-length dummy code. Lets the
    scan emitters run unmodified as pass 1 of two-pass optimal-table
    encoding."""

    def __init__(self):
        self.freq: dict[int, int] = {}

    def __getitem__(self, sym: int) -> tuple[int, int]:
        self.freq[sym] = self.freq.get(sym, 0) + 1
        return (0, 0)


def _jpeg_optimal_table(freq_in: dict[int, int]) -> tuple[list[int], list[int]]:
    """Optimal length-limited Huffman table from symbol frequencies —
    the T.81 Annex K.2 algorithm (merge two least-frequent, then fold
    lengths >16 down and drop the reserved all-ones codepoint). Needed
    for progressive scans: the Annex K sequential AC tables have no
    EOBn symbols and no room to add them (the length-16 band is full)."""
    freq = [0] * 257
    for sym, c in freq_in.items():
        freq[sym] = c
    freq[256] = 1  # reserved: guarantees no real symbol gets all-ones
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1, c1 = -1, None
        for i in range(257):
            if freq[i] and (c1 is None or freq[i] <= c1):
                v1, c1 = i, freq[i]
        v2, c2 = -1, None
        for i in range(257):
            if freq[i] and i != v1 and (c2 is None or freq[i] <= c2):
                v2, c2 = i, freq[i]
        if v2 < 0:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for length in range(32, 16, -1):  # fold over-long codes down to <=16
        while bits[length] > 0:
            j = length - 2
            while bits[j] == 0:
                j -= 1
            bits[length] -= 2
            bits[length - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    length = 16
    while bits[length] == 0:
        length -= 1
    bits[length] -= 1  # drop the reserved codepoint
    pairs = sorted((codesize[i], i) for i in range(256) if codesize[i])
    return bits[1:17], [i for _, i in pairs]


def _jpeg_quantize_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize an MCU-padded plane into per-block zigzag
    coefficients, shape (by, bx, 64) int64 — the progressive encoder's
    working form (scans re-read the same blocks at different bit
    planes/bands, so compute them once)."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    # batched matmul, NOT einsum: einsum reorders the float reduction,
    # and a ULP on a halfway value makes rint disagree with the baseline
    # encoder's per-block `A.T @ (block-128) @ A` — breaking the
    # progressive==baseline decode bit-identity the tests pin
    coef = (_JPEG_A.T @ blocks) @ _JPEG_A
    nat = np.rint(coef.reshape(by, bx, 64) / q.reshape(64)[None, None, :]).astype(np.int64)
    return nat[:, :, _JPEG_ZZ]  # natural -> zigzag, as in _jpeg_encode_block


def _prog_enc_ac_first(wr, zzs, ac, ss, se, al, hb, wb) -> None:
    """AC first scan for one component band (T.81 G.1.2.2): spectral
    selection with EOB-run coding of all-zero bands."""
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, ln = ac[nbits << 4]
            wr.put(code, ln)
            if nbits:
                wr.put(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for by in range(hb):
        for bx in range(wb):
            zz = zzs[by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                m = (v if v >= 0 else -v) >> al
                if m == 0:
                    r += 1
                    continue
                emit_eobrun()
                while r > 15:
                    code, ln = ac[0xF0]  # ZRL
                    wr.put(code, ln)
                    r -= 16
                s = m.bit_length()
                code, ln = ac[(r << 4) | s]
                wr.put(code, ln)
                wr.put(m if v >= 0 else ~m & ((1 << s) - 1), s)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
    emit_eobrun()


def _prog_enc_ac_refine(wr, zzs, ac, ss, se, al, hb, wb) -> None:
    """AC refinement scan (T.81 G.1.2.3): one correction bit per
    already-nonzero coefficient, run-coded newly significant +-1s,
    correction bits buffered until the symbol they belong with."""
    eobrun = 0
    pend: list[int] = []  # correction bits owed with the pending EOB run

    def emit_eobrun():
        nonlocal eobrun, pend
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, ln = ac[nbits << 4]
            wr.put(code, ln)
            if nbits:
                wr.put(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
            for b in pend:
                wr.put(b, 1)
            pend = []

    for by in range(hb):
        for bx in range(wb):
            zz = zzs[by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eobk = ss - 1  # last newly-significant index; ZRLs beyond it fold into EOB
            for idx, k in enumerate(range(ss, se + 1)):
                if absv[idx] == 1:
                    eobk = k
            r = 0
            br: list[int] = []  # correction bits for the current run
            for idx, k in enumerate(range(ss, se + 1)):
                t = absv[idx]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobk:
                    emit_eobrun()
                    code, ln = ac[0xF0]
                    wr.put(code, ln)
                    r -= 16
                    for b in br:
                        wr.put(b, 1)
                    br = []
                if t > 1:  # previously nonzero: correction bit only
                    br.append(t & 1)
                    continue
                emit_eobrun()
                code, ln = ac[(r << 4) | 1]
                wr.put(code, ln)
                wr.put(1 if int(zz[k]) >= 0 else 0, 1)
                for b in br:
                    wr.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pend += br
                if eobrun == 0x7FFF:
                    emit_eobrun()
    emit_eobrun()


def encode_progressive_jpeg(
    arr: np.ndarray, quality: int = 85, subsample: str = "444"
) -> bytes:
    """Encode a uint8 raster as a progressive JFIF JPEG (SOF2) with a
    standard spectral-selection + successive-approximation scan script:
    DC first (Al=1) -> per-component AC first bands (Al=1) -> DC refine
    -> per-component AC refine (Al 1->0). The scan script transmits every
    coefficient bit, so the decoded pixels are bit-identical to the
    baseline encoding of the same source at the same quality/subsample —
    the decode twin's strongest self-check. Interoperable: standard
    markers and Annex K tables, decodable by any progressive-capable
    JPEG decoder."""
    gray, comp_spec, padded, qly, qlc, h_img, w_img, mcux, mcuy = _jpeg_enc_prepare(
        arr, quality, subsample
    )
    dc_l = _jpeg_enc_huff(*_JPEG_DC_LUMA)
    dc_c = _jpeg_enc_huff(*_JPEG_DC_CHROMA)
    dc_tabs = [dc_l] + [dc_c] * (0 if gray else 2)
    qs = [qly] + [qlc] * (0 if gray else 2)
    zzs = [_jpeg_quantize_blocks(p, q) for p, q in zip(padded, qs)]

    hmax = max(c[1] for c in comp_spec)
    vmax = max(c[2] for c in comp_spec)
    geom = []  # per-comp (hb, wb): REAL block counts (AC scans skip MCU padding)
    for cid, hs, vs, tq in comp_spec:
        cw = -(-w_img * hs // hmax)
        ch = -(-h_img * vs // vmax)
        geom.append((-(-ch // 8), -(-cw // 8)))

    out = _jpeg_emit_headers(0xC2, gray, comp_spec, qly, qlc, h_img, w_img, 0)

    def sos(comp_idxs, ss, se, ah, al, ac_tno=0):
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_idxs), len(comp_idxs)))
        for ci in comp_idxs:
            cid = comp_spec[ci][0]
            tno = 0 if ci == 0 else 1  # DC table slot
            out.extend(bytes([cid, (tno << 4) | ac_tno]))
        out.extend(bytes([ss, se, (ah << 4) | al]))

    def dc_scan(ah, al):
        sos(list(range(len(comp_spec))), 0, 0, ah, al)
        wr = _JpegBitWriter()
        preds = [0] * len(comp_spec)
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, (cid, hs, vs, tq) in enumerate(comp_spec):
                for v in range(vs):
                    for hh in range(hs):
                        zz0 = int(zzs[ci][my * vs + v, mx * hs + hh, 0])
                        if ah == 0:  # first: diff-code the point-transformed DC
                            t = zz0 >> al
                            diff = t - preds[ci]
                            preds[ci] = t
                            s = abs(diff).bit_length()
                            code, ln = dc_tabs[ci][s]
                            wr.put(code, ln)
                            if s:
                                wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        else:  # refine: next lower bit, one per block
                            wr.put((zz0 >> al) & 1, 1)
        wr.flush()
        out.extend(wr.out)

    def ac_scan(ci, ss, se, ah, al):
        # Two-pass per-scan optimal Huffman (the Annex K AC tables carry
        # no EOBn symbols): pass 1 counts symbols, then DHT + SOS + data.
        emit = _prog_enc_ac_first if ah == 0 else _prog_enc_ac_refine
        hb, wb = geom[ci]
        counter = _CountTab()
        emit(_NullWriter(), zzs[ci], counter, ss, se, al, hb, wb)
        bits, vals = _jpeg_optimal_table(counter.freq)
        out.extend(b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([0x10]))
        out.extend(bytes(bits) + bytes(vals))
        sos([ci], ss, se, ah, al, ac_tno=0)
        wr = _JpegBitWriter()
        emit(wr, zzs[ci], _jpeg_enc_huff(bits, vals), ss, se, al, hb, wb)
        wr.flush()
        out.extend(wr.out)

    dc_scan(0, 1)
    ac_scan(0, 1, 5, 0, 1)
    ac_scan(0, 6, 63, 0, 1)
    for ci in range(1, len(comp_spec)):
        ac_scan(ci, 1, 63, 0, 1)
    dc_scan(1, 0)
    for ci in range(len(comp_spec)):
        ac_scan(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (Adobe TIFF 6.0): baseline strips, both byte orders, LZW with
# EarlyChange + horizontal predictor, PackBits — the scientific-corpus
# container. All supported compressions are lossless, so round-trips
# are bit-exact (same testing strategy as PNG/VP8L/FLAC).
# ---------------------------------------------------------------------------


def _tiff_lzw_decode(data: bytes, max_bytes: int) -> bytes | None:
    """TIFF-variant LZW: MSB-first code packing, Clear=256, EOI=257,
    and EarlyChange (code width grows one code EARLY: at 510/1022/
    2046 — the difference from GIF's LZW that breaks naive ports)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == CLEAR:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            if len(out) > max_bytes:
                return None
            prev = entry
            # EarlyChange + the decoder's one-entry lag behind the
            # encoder's table: widen when the table reaches 2^width - 2
            # (510/1022/2046), one EARLIER than GIF's LZW
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _tiff_packbits_decode(data: bytes, max_bytes: int) -> bytes | None:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                return None
            out += bytes([data[i]]) * (257 - n)
            i += 1
        if len(out) > max_bytes:
            return None
    return bytes(out)


def _decode_tiff(payload: bytes) -> np.ndarray | None:
    if len(payload) < 8 or payload[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        return None
    (n_tags,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    for t in range(n_tags):
        off = ifd_off + 2 + 12 * t
        if off + 12 > len(payload):
            return None
        tag, ttype, count = struct.unpack_from(bo + "HHI", payload, off)
        if ttype not in type_size:
            continue
        total = type_size[ttype] * count
        vo = off + 8 if total <= 4 else struct.unpack_from(bo + "I", payload, off + 8)[0]
        if vo + total > len(payload):
            return None
        fmt = {1: "B", 3: "H", 4: "I"}[ttype]
        tags[tag] = list(struct.unpack_from(bo + str(count) + fmt, payload, vo))
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError:
        return None
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1] * spp)
    comp = tags.get(259, [1])[0]
    pred = tags.get(317, [1])[0]
    rows_per_strip = tags.get(278, [h])[0] or h
    planar = tags.get(284, [1])[0]
    if (
        w == 0 or h == 0 or spp not in (1, 3, 4) or any(b != 8 for b in bps)
        or planar != 1 or len(offsets) != len(counts)
        or comp not in (1, 5, 32773) or pred not in (1, 2)
    ):
        return None
    row_bytes = w * spp
    raw = bytearray()
    for k, (so, sc) in enumerate(zip(offsets, counts)):
        strip = payload[so : so + sc]
        if len(strip) != sc:
            return None
        n_rows = min(rows_per_strip, h - k * rows_per_strip)
        want = n_rows * row_bytes
        if comp == 1:
            dec = strip[:want]
        elif comp == 5:
            dec = _tiff_lzw_decode(strip, want)
        else:
            dec = _tiff_packbits_decode(strip, want)
        if dec is None or len(dec) < want:
            return None
        dec = dec[:want]
        if pred == 2:  # horizontal differencing: undo per row, per sample
            a = np.frombuffer(dec, dtype=np.uint8).reshape(n_rows, w, spp)
            dec = np.cumsum(a, axis=1, dtype=np.uint8).tobytes()
        raw += dec
    if len(raw) < h * row_bytes:
        return None
    arr = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8).reshape(h, w, spp)
    # PhotometricInterpretation 0 = WhiteIsZero -> invert to the
    # BlackIsZero convention the rest of the pipeline uses
    if tags.get(262, [1])[0] == 0:
        arr = 255 - arr
    return arr[:, :, 0] if spp == 1 else arr


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder twin (EarlyChange, MSB-first)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # EarlyChange: widen one code early
        elif next_code >= 4094:
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        put(table[cur], width)
        # the decoder appends one more table entry for this final code
        # and (EarlyChange) may widen BEFORE reading EOI; mirror that
        # here or EOI desyncs whenever next_code lands exactly on a
        # width boundary (510/1022/2046) at end-of-data
        if next_code + 2 >= (1 << width) and width < 12:
            width += 1
    put(EOI, width)
    if nbits:
        put(0, 8 - nbits)
    return bytes(out)


def _tiff_packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while (
                j < n and j - i < 128
                and not (j + 1 < n and data[j] == data[j + 1])
            ):
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def encode_tiff(
    arr: np.ndarray,
    compression: int = 5,
    predictor: int = 2,
    rows_per_strip: int = 16,
    big_endian: bool = False,
) -> bytes:
    """Encoder twin: uint8 gray/RGB/RGBA -> a baseline TIFF 6.0 file
    (strips; compression 1=none, 5=LZW, 32773=PackBits; optional
    horizontal predictor with LZW). Lossless, so `_decode_tiff` hands
    the array back bit-exactly."""
    x = np.asarray(arr, dtype=np.uint8)
    if x.ndim == 2:
        x = x[:, :, None]
    h, w, spp = x.shape
    bo = ">" if big_endian else "<"
    if predictor == 2 and compression != 5:
        predictor = 1  # predictor is an LZW companion in practice
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = x[r0 : r0 + rows_per_strip]
        if predictor == 2:
            d = rows.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            raw = (d & 0xFF).astype(np.uint8).tobytes()
        else:
            raw = rows.tobytes()
        if compression == 5:
            strips.append(_tiff_lzw_encode(raw))
        elif compression == 32773:
            strips.append(_tiff_packbits_encode(raw))
        else:
            strips.append(raw)
    # layout: header(8) + IFD + values + strip data
    entries = []  # (tag, type, count, value_or_offset_placeholder)

    def tag(t, ttype, vals):
        entries.append((t, ttype, vals))

    tag(256, 3, [w])
    tag(257, 3, [h])
    tag(258, 3, [8] * spp)
    tag(259, 3, [compression])
    tag(262, 3, [1])  # BlackIsZero
    tag(273, 4, [0] * len(strips))  # patched below
    tag(277, 3, [spp])
    tag(278, 3, [min(rows_per_strip, h)])
    tag(279, 4, [len(s) for s in strips])
    if predictor == 2:
        tag(317, 3, [predictor])
    entries.sort()
    n_tags = len(entries)
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n_tags + 4
    # assign overflow-value offsets
    value_blobs = []
    voff = after_ifd
    type_size = {3: 2, 4: 4}
    packed = []
    for t, ttype, vals in entries:
        fmt = {3: "H", 4: "I"}[ttype]
        total = type_size[ttype] * len(vals)
        if total <= 4:
            packed.append((t, ttype, len(vals), None, vals))
        else:
            packed.append((t, ttype, len(vals), voff, vals))
            value_blobs.append((voff, fmt, vals))
            voff += total
    data_off = voff
    strip_offsets = []
    so = data_off
    for s in strips:
        strip_offsets.append(so)
        so += len(s)
    out = bytearray()
    out += (b"II*\x00" if not big_endian else b"MM\x00*")
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", n_tags)
    for t, ttype, count, off, vals in packed:
        if t == 273:
            vals = strip_offsets
        fmt = {3: "H", 4: "I"}[ttype]
        out += struct.pack(bo + "HHI", t, ttype, count)
        if off is None:
            v = struct.pack(bo + str(count) + fmt, *vals)
            out += v.ljust(4, b"\x00")
        else:
            out += struct.pack(bo + "I", off)
    out += struct.pack(bo + "I", 0)  # next-IFD = none
    for off, fmt, vals in value_blobs:
        if vals == [0] * len(strips):  # the 273 placeholder blob
            vals = strip_offsets
        out += struct.pack(bo + str(len(vals)) + fmt, *vals)
    for s in strips:
        out += s
    return bytes(out)


def decode_image_pixels(payload: bytes | None) -> np.ndarray | None:
    """Full REAL pixel decode: bytes -> uint8 array (h, w[, channels]).

    Supports BMP (24/32-bit BI_RGB), PPM/PGM binary, PNG (gray/RGB/
    RGBA/palette, 1-16-bit, Adam7), GIF87a/89a incl. interlace (pure-
    Python LZW; first frame of animations), baseline, progressive AND
    lossless JPEG (Huffman + dequant + IDCT + YCbCr in pure numpy;
    arithmetic JPEG stays behind the PIL gate), TIFF 6.0 strips
    (none/LZW-EarlyChange/PackBits, predictor, both byte orders), and
    lossless WebP (VP8L — `operators.webp`; lossy VP8 is
    arithmetic-coded and stays gated). Returns None for anything else
    — corrupt or exotic media is data, not an exception, at 100 TB.
    """
    if not payload:
        return None
    try:
        for dec in (
            _decode_bmp, _decode_png, _decode_netpbm, _decode_gif, _decode_jpeg,
            _decode_tiff,
        ):
            arr = dec(payload)
            if arr is not None:
                return arr
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from etly_spark.operators.webp import decode_webp_pixels

            return decode_webp_pixels(payload)
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
# Lossless JPEG (SOF3, T.81 Annex H): predictive DPCM + Huffman — the
# third JPEG process (after baseline SOF0/1 and progressive SOF2).
# Exactly reversible, so round-trips are bit-identical and the same
# oracle strategy as PNG/VP8L/FLAC applies. Medical/raw pipelines
# (DICOM, DNG) are the formats' real-world home.
# ---------------------------------------------------------------------------


_LL_PREDICT = {
    1: lambda ra, rb, rc: ra,
    2: lambda ra, rb, rc: rb,
    3: lambda ra, rb, rc: rc,
    4: lambda ra, rb, rc: ra + rb - rc,
    5: lambda ra, rb, rc: ra + ((rb - rc) >> 1),
    6: lambda ra, rb, rc: rb + ((ra - rc) >> 1),
    7: lambda ra, rb, rc: (ra + rb) >> 1,
}


def _jpeg_lossless_scan(
    precision: int,
    h: int,
    w: int,
    scan: list,
    huff: dict,
    restart: int,
    data: bytes,
    predictor: int,
    pt: int,
) -> np.ndarray | None:
    """Annex H scan decode: interleaved 1-sample MCUs, per-component
    DC-style Huffman categories (SSSS 0-16, 16 = +32768 with no extra
    bits), modulo-2^16 reconstruction. First scan line and the first
    line after every restart use predictor 1 (first sample: the
    2^(P-Pt-1) default); each line start uses predictor 2. Restart
    intervals must cover whole lines (the only layout real encoders
    emit; unaligned DRI returns None)."""
    if predictor not in _LL_PREDICT or not (2 <= precision <= 16) or pt >= precision:
        return None
    ncomp = len(scan)
    tabs = []
    for _cs, td, _ta in scan:
        tab = huff.get((0, td))
        if tab is None:
            return None
        tabs.append(tab)
    if restart and restart % w:
        return None
    planes = np.zeros((ncomp, h, w), dtype=np.int64)
    default = 1 << (precision - pt - 1)
    segments = _jpeg_restart_segments(data) if restart else [data]
    seg_rows = restart // w if restart else h
    pred_fn = _LL_PREDICT[predictor]
    row0 = 0
    for seg in segments:
        if row0 >= h:
            break
        br = _JpegBits(seg)
        top = min(row0 + seg_rows, h)
        for y in range(row0, top):
            for x in range(w):
                for c in range(ncomp):
                    s = _jpeg_huff_decode(br, tabs[c])
                    if s is None or s > 16:
                        return None
                    if s == 16:
                        diff = 32768
                    elif s:
                        raw = br.take(s)
                        if raw is None:
                            return None
                        diff = _jpeg_extend(raw, s)
                    else:
                        diff = 0
                    p = planes[c]
                    if y == row0:
                        px = default if x == 0 else int(p[y, x - 1])
                    elif x == 0:
                        px = int(p[y - 1, 0])
                    else:
                        px = pred_fn(int(p[y, x - 1]), int(p[y - 1, x]), int(p[y - 1, x - 1]))
                    p[y, x] = (px + diff) & 0xFFFF
        row0 = top
    if row0 < h:
        return None
    if pt:
        planes = planes << pt
    return planes


def decode_lossless_jpeg(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Full-precision lossless-JPEG decode: -> (samples, precision)
    with samples uint16 of shape (h, w) or (h, w, ncomp). The
    general `decode_image_pixels` path converts to uint8 for the
    feature pipeline; this entry point preserves every bit for
    round-trip verification."""
    out = _decode_jpeg_impl(payload, lossless_exact=True)
    if out is None or not isinstance(out, tuple):
        return None
    return out


def encode_lossless_jpeg(
    arr: np.ndarray,
    predictor: int = 4,
    precision: int | None = None,
    restart_rows: int = 0,
) -> bytes:
    """Encoder twin: gray or multi-component samples -> a spec-valid
    SOF3 stream with a per-image optimal Huffman table (Annex K.2
    builder shared with the progressive encoder). uint8 -> P=8,
    uint16 -> P=16 unless ``precision`` narrows it. ``restart_rows``
    inserts DRI/RSTn every N lines (whole-line intervals, as real
    encoders emit)."""
    x = np.asarray(arr)
    if x.ndim == 2:
        x = x[:, :, None]
    h, w, ncomp = x.shape
    if not (1 <= ncomp <= 4) or h == 0 or w == 0:
        raise ValueError("bad shape")
    if precision is None:
        precision = 8 if x.dtype == np.uint8 else 16
    if not (2 <= precision <= 16) or int(x.max()) >= (1 << precision):
        raise ValueError("samples exceed precision")
    if predictor not in _LL_PREDICT:
        raise ValueError("predictor 1-7")
    xi = x.astype(np.int64)
    default = 1 << (precision - 1)
    pred_fn = _LL_PREDICT[predictor]

    # pass 1: diffs + category frequencies; pass 2: emit. Restart
    # segments restart the prediction walk at their first line.
    def walk():
        seg_rows = restart_rows if restart_rows else h
        for row0 in range(0, h, seg_rows):
            top = min(row0 + seg_rows, h)
            for y in range(row0, top):
                for xx in range(w):
                    for c in range(ncomp):
                        p = xi[:, :, c]
                        if y == row0:
                            px = default if xx == 0 else int(p[y, xx - 1])
                        elif xx == 0:
                            px = int(p[y - 1, 0])
                        else:
                            px = pred_fn(
                                int(p[y, xx - 1]), int(p[y - 1, xx]), int(p[y - 1, xx - 1])
                            )
                        dd = (int(p[y, xx]) - px) & 0xFFFF
                        if dd == 32768:
                            yield y, 16, 0, row0
                        else:
                            signed = dd - 65536 if dd > 32768 else dd
                            s = abs(signed).bit_length()
                            raw = signed if signed >= 0 else signed + (1 << s) - 1
                            yield y, s, raw, row0

    freq: dict[int, int] = {}
    for _y, s, _raw, _r0 in walk():
        freq[s] = freq.get(s, 0) + 1
    bits, vals = _jpeg_optimal_table(freq)
    enc_tab = _jpeg_enc_huff(bits, vals)

    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_rows:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_rows * w)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, Ah/Al=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wr = _JpegBitWriter()
    cur_r0 = 0
    rst = 0
    for y, s, raw, r0 in walk():
        if r0 != cur_r0:
            wr.flush()
            out += wr.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            wr = _JpegBitWriter()
            cur_r0 = r0
        code, length = enc_tab[s]
        wr.put(code, length)
        if s and s != 16:
            wr.put(raw, s)
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


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


_MJPEG_DHT_CACHE: bytes | None = None


def _mjpeg_default_dht() -> bytes:
    """One DHT segment carrying the four T.81 Annex K tables — what an
    OpenDML-compliant decoder must supply when an MJPEG frame omits
    its Huffman tables (the classic MJPEG interop quirk)."""
    global _MJPEG_DHT_CACHE
    if _MJPEG_DHT_CACHE is None:
        body = bytearray()
        for tc_th, (bits, vals) in (
            (0x00, _JPEG_DC_LUMA),
            (0x01, _JPEG_DC_CHROMA),
            (0x10, _JPEG_AC_LUMA),
            (0x11, _JPEG_AC_CHROMA),
        ):
            body += bytes([tc_th]) + bytes(bits) + bytes(vals)
        _MJPEG_DHT_CACHE = b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + bytes(body)
    return _MJPEG_DHT_CACHE


def _decode_mjpeg_frame(frame: bytes) -> np.ndarray | None:
    """One MJPEG frame = one JPEG; frames with no DHT get the Annex K
    defaults spliced in before the first SOS (OpenDML F.2)."""
    if b"\xff\xc4" not in frame:
        sos = frame.find(b"\xff\xda")
        if sos < 0:
            return None
        frame = frame[:sos] + _mjpeg_default_dht() + frame[sos:]
    return _decode_jpeg(frame)


def decode_mjpeg_avi(
    payload: bytes | None, max_frames: int = 256
) -> tuple[float, np.ndarray] | None:
    """REAL compressed-video decode: Motion-JPEG in an AVI (RIFF)
    container -> (fps, luma frames as uint8 (n, h, w)) — the same
    contract as `decode_y4m`, but every frame goes through the actual
    baseline-JPEG entropy decoder. Walks RIFF/LIST structure: 'strh'
    gives fps (rate/scale, falling back to avih microsec-per-frame),
    'movi' holds the per-frame '..dc'/'..db' chunks. Frames that fail
    to decode are skipped (corrupt frames are data); None when
    nothing decodes. ``max_frames`` bounds memory per record."""
    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return None
    fps = 0.0
    usec_per_frame = 0
    frames: list[np.ndarray] = []

    def walk(buf: bytes, i: int, end: int) -> None:
        nonlocal fps, usec_per_frame
        while i + 8 <= end and len(frames) < max_frames:
            cid = buf[i : i + 4]
            (clen,) = struct.unpack_from("<I", buf, i + 4)
            body_start = i + 8
            body_end = min(body_start + clen, end)
            if cid == b"LIST" and clen >= 4:
                walk(buf, body_start + 4, body_end)
            elif cid == b"avih" and clen >= 4:
                (usec_per_frame,) = struct.unpack_from("<I", buf, body_start)
            elif cid == b"strh" and clen >= 28:
                if buf[body_start : body_start + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", buf, body_start + 20)
                    if scale and rate:
                        fps = rate / scale
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                arr = _decode_mjpeg_frame(buf[body_start:body_end])
                if arr is not None:
                    luma = arr if arr.ndim == 2 else arr.mean(axis=2).astype(np.uint8)
                    frames.append(luma)
            i = body_start + clen + (clen & 1)

    walk(payload, 12, min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0]))
    if not frames:
        return None
    if fps <= 0:
        fps = 1e6 / usec_per_frame if usec_per_frame else 25.0
    # heterogeneous frame dims (corrupt mid-stream header): keep the
    # dominant geometry only
    h, w = frames[0].shape
    stack = [f for f in frames if f.shape == (h, w)]
    return fps, np.stack(stack)


def encode_mjpeg_avi(
    frames: np.ndarray, fps: float = 25.0, quality: int = 90, strip_dht: bool = False,
    lossless: bool = False,
) -> bytes:
    """Encoder twin: (n, h, w[, 3]) uint8 frames -> a structurally
    valid AVI/MJPG stream (hdrl with avih + vids strl, movi with one
    00dc JPEG per frame). ``strip_dht`` removes each frame's DHT
    segment to produce the OpenDML tables-omitted form real capture
    hardware emits. ``lossless`` encodes frames as SOF3 lossless
    JPEGs instead of baseline — bit-exact round-trips, which lets a
    byte-arithmetic oracle gate the whole container+codec path (the
    mm_decode_frames 'avi' variant)."""
    frames = np.asarray(frames)
    n = frames.shape[0]
    h, w = frames.shape[1:3]
    chunks = []
    for k in range(n):
        jpg = (
            encode_lossless_jpeg(frames[k], predictor=4)
            if lossless
            else encode_baseline_jpeg(frames[k], quality=quality)
        )
        if strip_dht:
            out = bytearray()
            i = 2
            out += jpg[:2]
            while i + 4 <= len(jpg) and jpg[i] == 0xFF:
                marker = jpg[i + 1]
                if marker == 0xDA:
                    out += jpg[i:]
                    break
                (seglen,) = struct.unpack_from(">H", jpg, i + 2)
                if marker != 0xC4:
                    out += jpg[i : i + 2 + seglen]
                i += 2 + seglen
            jpg = bytes(out)
        chunks.append(jpg)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps), 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1000, int(fps * 1000), 0, n, 0, 0, 0, 0)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", c) for c in chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_video(
    payload: bytes | None, max_frames: int = 256
) -> tuple[float, np.ndarray] | None:
    """Magic-byte video dispatcher — the video twin of
    `decode_image_pixels`/`decode_audio`: YUV4MPEG2 -> `decode_y4m`,
    RIFF/AVI (MJPEG) -> `decode_mjpeg_avi`. H.26x/VP9 stay gated."""
    if not payload or len(payload) < 12:
        return None
    if payload.startswith(b"YUV4MPEG2"):
        return decode_y4m(payload, max_frames=max_frames)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return decode_mjpeg_avi(payload, max_frames=max_frames)
    return None


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


def _g711_ulaw_table() -> np.ndarray:
    """256-entry µ-law -> int16 expansion (ITU-T G.711): invert the
    code, split sign/exponent/mantissa, rebuild the biased magnitude."""
    codes = np.arange(256, dtype=np.int64)
    u = ~codes & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x7
    mant = u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _g711_alaw_table() -> np.ndarray:
    """256-entry A-law -> int16 expansion (ITU-T G.711): XOR 0x55
    toggle, then segment expansion (segment 0 is linear). NOTE the
    A-law sign convention is inverted vs µ-law: bit 7 SET means
    positive."""
    codes = np.arange(256, dtype=np.int64)
    a = codes ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 0x7
    mant = a & 0xF
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, mag, -mag).astype(np.int16)


_ULAW_TABLE = _g711_ulaw_table()
_ALAW_TABLE = _g711_alaw_table()

# IMA ADPCM tables (public IMA/DVI spec)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_nibbles(nibbles, predictor: int, index: int) -> list[int]:
    """Sequential IMA ADPCM nibble expansion (the published
    step-table recurrence); returns the decoded samples AFTER the
    header's seed sample."""
    out = []
    for nib in nibbles:
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        predictor = max(-32768, min(32767, predictor + diff))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nib & 7])))
        out.append(predictor)
    return out


def _decode_ima_adpcm(data: bytes, n_ch: int, block_align: int) -> np.ndarray | None:
    """WAV IMA ADPCM (format 0x11): per-block 4-byte channel headers
    (seed sample int16 + step index), then 4-byte nibble groups
    round-robin across channels (8 samples per group)."""
    if block_align < 4 * n_ch or n_ch < 1:
        return None
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    for boff in range(0, len(data), block_align):
        block = data[boff : boff + block_align]  # tail block may be short
        if len(block) < 4 * n_ch:
            break
        preds, idxs = [], []
        for c in range(n_ch):
            p, ix = struct.unpack_from("<hBx", block, 4 * c)
            if ix > 88:
                return None
            preds.append(p)
            idxs.append(ix)
            chans[c].append(p)  # header seed is the first output sample
        body = block[4 * n_ch :]
        ngroups = len(body) // (4 * n_ch)
        nibs_per_ch: list[list[int]] = [[] for _ in range(n_ch)]
        for g in range(ngroups):
            for c in range(n_ch):
                chunk = body[(g * n_ch + c) * 4 : (g * n_ch + c) * 4 + 4]
                for byte in chunk:
                    nibs_per_ch[c].append(byte & 0xF)
                    nibs_per_ch[c].append(byte >> 4)
        for c in range(n_ch):
            chans[c].extend(_ima_decode_nibbles(nibs_per_ch[c], preds[c], idxs[c]))
    n = min(len(ch) for ch in chans)
    if n == 0:
        return None
    out = np.empty((n, n_ch), dtype=np.float32)
    for c in range(n_ch):
        out[:, c] = np.asarray(chans[c][:n], dtype=np.float32) / 32768.0
    return out


def g711_encode(samples: np.ndarray, law: str) -> np.ndarray:
    """int16 -> G.711 code bytes (the published segment search),
    encoder twin for the expansion tables: encode(decode(c)) == c for
    every code is the tables' self-consistency test."""
    x = np.asarray(samples, dtype=np.int64)
    out = np.empty(x.shape, dtype=np.uint8)
    if law == "ulaw":
        for i, v in enumerate(x.ravel()):
            sign = 0x80 if v < 0 else 0
            v = min(abs(int(v)), 32635) + 0x84
            exp = v.bit_length() - 8
            mant = (v >> (exp + 3)) & 0xF
            out.ravel()[i] = ~(sign | (exp << 4) | mant) & 0xFF
    elif law == "alaw":
        for i, v in enumerate(x.ravel()):
            sign = 0x80 if v >= 0 else 0
            v = min(abs(int(v)), 32767)
            if v < 256:
                code = v >> 4
            else:
                exp = v.bit_length() - 8
                mant = (v >> (exp + 3)) & 0xF
                code = (exp << 4) | mant
            out.ravel()[i] = (sign | code) ^ 0x55
    else:
        raise ValueError(law)
    return out


def ima_adpcm_encode_wav(
    samples: np.ndarray, rate: int, samples_per_block: int = 505
) -> bytes:
    """Encoder twin: int16 (n, ch) -> a complete IMA-ADPCM WAV file
    (format 0x11) with proper block headers, for round-tripping the
    decoder against independently-generated streams. Standard greedy
    nibble quantizer (mirror of the decode recurrence)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    spb = samples_per_block
    if (spb - 1) % 8:
        raise ValueError("samples_per_block must be 1 mod 8")
    block_align = 4 * nch + ((spb - 1) // 2) * nch
    blocks = bytearray()
    idx = [0] * nch
    for start in range(0, n, spb):
        blk = x[start : start + spb]
        if blk.shape[0] < spb:  # pad the tail block by repeating the last sample
            pad = np.repeat(blk[-1:], spb - blk.shape[0], axis=0)
            blk = np.vstack([blk, pad])
        nibs: list[list[int]] = []
        for c in range(nch):
            pred = int(blk[0, c])
            blocks += struct.pack("<hBx", pred, idx[c])
            ch_nibs = []
            for s in blk[1:, c]:
                step = int(_IMA_STEPS[idx[c]])
                diff = int(s) - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                # reconstruct exactly as the decoder will
                d = step >> 3
                if nib & 1:
                    d += step >> 2
                if nib & 2:
                    d += step >> 1
                if nib & 4:
                    d += step
                if nib & 8:
                    d = -d
                pred = max(-32768, min(32767, pred + d))
                idx[c] = max(0, min(88, idx[c] + int(_IMA_INDEX_ADJ[nib & 7])))
                ch_nibs.append(nib)
            nibs.append(ch_nibs)
        # pack: 4-byte groups (8 nibbles) round-robin across channels
        for g in range((spb - 1) // 8):
            for c in range(nch):
                grp = nibs[c][g * 8 : g * 8 + 8]
                for k in range(0, 8, 2):
                    blocks.append(grp[k] | (grp[k + 1] << 4))
    fmt = struct.pack(
        "<HHIIHHH", 0x11, nch, rate, rate * block_align // spb, block_align, 4, 2
    ) + struct.pack("<H", spb)
    hdr = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    hdr += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    return b"RIFF" + struct.pack("<I", 4 + len(hdr) - 4) + hdr


def ms_adpcm_encode_wav(
    samples: np.ndarray, rate: int, samples_per_block: int = 500, predictor: int = 0
) -> bytes:
    """Encoder twin for MS ADPCM (format 2): greedy nibble quantizer
    mirroring the decode recurrence exactly, fixed coefficient pair.
    For round-tripping the decoder against independently-built
    streams."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    spb = samples_per_block
    if spb < 2 or (spb - 2) % 2:
        raise ValueError("samples_per_block must be even and >= 2")
    c1, c2 = _MS_COEFS[predictor]
    block_align = 7 * nch + ((spb - 2) * nch) // 2
    blocks = bytearray()
    for start in range(0, n, spb):
        blk = x[start : start + spb]
        if blk.shape[0] < spb:
            blk = np.vstack([blk, np.repeat(blk[-1:], spb - blk.shape[0], axis=0)])
        states = []
        hdr_pred = bytes([predictor] * nch)
        hdr_delta = b""
        hdr_s1 = b""
        hdr_s2 = b""
        for c in range(nch):
            s2, s1 = int(blk[0, c]), int(blk[1, c])
            delta = max(16, int(np.abs(np.diff(blk[:16, c])).mean() or 16) >> 2)
            states.append([s1, s2, delta, c1, c2])
            hdr_delta += struct.pack("<h", delta)
            hdr_s1 += struct.pack("<h", s1)
            hdr_s2 += struct.pack("<h", s2)
        blocks += hdr_pred + hdr_delta + hdr_s1 + hdr_s2
        nibs: list[int] = []
        for i in range(2, spb):
            for c in range(nch):
                st = states[c]
                pred = (st[0] * st[3] + st[1] * st[4]) >> 8
                d = st[2] or 16
                nib = max(-8, min(7, int(round((int(blk[i, c]) - pred) / d))))
                nib &= 0xF
                _ms_adpcm_expand(nib, st)
                nibs.append(nib)
        for k in range(0, len(nibs), 2):
            blocks.append((nibs[k] << 4) | nibs[k + 1])
    fmt = struct.pack(
        "<HHIIHHH", 2, nch, rate, rate * block_align // spb, block_align, 4,
        4 + 4 * len(_MS_COEFS),
    )
    fmt += struct.pack("<HH", spb, len(_MS_COEFS))
    for a, b in _MS_COEFS:
        fmt += struct.pack("<hh", a, b)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# MS ADPCM (WAV format 2) tables — the published coefficient pairs
# and delta-adaptation steps from the Microsoft WAVE spec
_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230]


def _ms_adpcm_expand(nib: int, state: list) -> int:
    """One MS-ADPCM nibble: state = [sample1, sample2, delta, c1, c2]."""
    s1, s2, delta, c1, c2 = state
    signed = nib - 16 if nib >= 8 else nib
    pred = (s1 * c1 + s2 * c2) >> 8
    new = max(-32768, min(32767, pred + signed * delta))
    state[1] = s1
    state[0] = new
    state[2] = max(16, (_MS_ADAPT[nib] * delta) >> 8)
    return new


def _decode_ms_adpcm(data: bytes, n_ch: int, block_align: int) -> np.ndarray | None:
    """WAV MS ADPCM (format 2): per-block header (predictor index,
    initial delta, two seed samples per channel), then 4-bit codes,
    channels alternating per nibble."""
    hdr = 7 * n_ch
    if block_align < hdr or n_ch < 1:
        return None
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    for boff in range(0, len(data), block_align):
        block = data[boff : boff + block_align]
        if len(block) < hdr:
            break
        states = []
        for c in range(n_ch):
            pidx = block[c]
            if pidx >= len(_MS_COEFS):
                return None
            c1, c2 = _MS_COEFS[pidx]
            (delta,) = struct.unpack_from("<h", block, n_ch + 2 * c)
            (s1,) = struct.unpack_from("<h", block, 3 * n_ch + 2 * c)
            (s2,) = struct.unpack_from("<h", block, 5 * n_ch + 2 * c)
            states.append([s1, s2, max(16, delta), c1, c2])
            chans[c].append(s2)  # the two seeds are the block's first samples
            chans[c].append(s1)
        ch = 0
        for byte in block[hdr:]:
            chans[ch].append(_ms_adpcm_expand(byte >> 4, states[ch]))
            ch = (ch + 1) % n_ch
            chans[ch].append(_ms_adpcm_expand(byte & 0xF, states[ch]))
            ch = (ch + 1) % n_ch
    n = min(len(c) for c in chans)
    if n == 0:
        return None
    out = np.empty((n, n_ch), dtype=np.float32)
    for c in range(n_ch):
        out[:, c] = np.asarray(chans[c][:n], dtype=np.float32) / 32768.0
    return out


def decode_wav(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """REAL WAV decode: RIFF chunk walk -> (sample_rate, float32 samples
    in [-1, 1], shape (n_samples, n_channels)). Formats: PCM 8-bit
    unsigned / 16 / 24 / 32-bit signed LE (1), MS ADPCM (2), IEEE
    float32 (3), G.711 A-law (6) and µ-law (7), IMA ADPCM (0x11), and
    WAVE_FORMAT_EXTENSIBLE (0xFFFE — effective format taken from the
    SubFormat GUID). None for anything else."""
    if not payload or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, fmt, fmt_body, data = 12, None, b"", None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, n_ch, rate, _byte_rate, block_align, bits = fmt
    if audio_fmt == 0xFFFE and len(fmt_body) >= 26:
        # EXTENSIBLE: first two GUID bytes are the effective format
        (audio_fmt,) = struct.unpack_from("<H", fmt_body, 24)
    if n_ch < 1 or rate <= 0:
        return None
    if audio_fmt == 1 and bits in (8, 16, 24, 32):
        width = bits // 8
        n = len(data) // (width * n_ch)
        if bits == 8:
            samples = (
                np.frombuffer(data, dtype=np.uint8, count=n * n_ch).astype(np.float32)
                - 128.0
            ) / 128.0
        elif bits == 16:
            samples = (
                np.frombuffer(data, dtype="<i2", count=n * n_ch).astype(np.float32)
                / 32768.0
            )
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8, count=n * n_ch * 3).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            samples = v.astype(np.float32) / float(1 << 23)
        else:
            samples = (
                np.frombuffer(data, dtype="<i4", count=n * n_ch).astype(np.float32)
                / float(1 << 31)
            )
    elif audio_fmt == 3 and bits == 32:
        n = len(data) // (4 * n_ch)
        samples = np.frombuffer(data, dtype="<f4", count=n * n_ch).astype(np.float32)
    elif audio_fmt in (6, 7) and bits == 8:
        n = len(data) // n_ch
        table = _ALAW_TABLE if audio_fmt == 6 else _ULAW_TABLE
        codes = np.frombuffer(data, dtype=np.uint8, count=n * n_ch)
        samples = table[codes].astype(np.float32) / 32768.0
    elif audio_fmt == 0x11 and bits == 4:
        out = _decode_ima_adpcm(data, n_ch, block_align)
        if out is None:
            return None
        return rate, out
    elif audio_fmt == 2 and bits == 4:
        out = _decode_ms_adpcm(data, n_ch, block_align)
        if out is None:
            return None
        return rate, out
    else:
        return None
    n = samples.shape[0] // n_ch
    if n == 0:
        return None
    return rate, samples[: n * n_ch].reshape(n, n_ch)


def _float80_be(b: bytes) -> float:
    """IEEE 754 80-bit extended (big-endian) -> float — the AIFF COMM
    chunk's sample-rate encoding (sign, 15-bit exponent, explicit
    64-bit mantissa)."""
    if len(b) != 10:
        return 0.0
    (se,) = struct.unpack(">H", b[:2])
    mant = int.from_bytes(b[2:], "big")
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    exp = (se & 0x7FFF) - 16383 - 63
    if not (-126 <= exp <= 63):
        return 0.0  # corrupt/absurd exponent (sample rates are < 2^32)
    val = mant * 2.0 ** exp
    return -val if se & 0x8000 else val


def decode_aiff(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """AIFF (FORM/AIFF) decode: COMM chunk (channels, frames, sample
    size, 80-bit-extended sample rate) + SSND big-endian PCM
    8/16/24/32-bit. The big-endian sibling of `decode_wav`."""
    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"FORM"
        or payload[8:12] != b"AIFF"
    ):
        return None
    i, comm, ssnd = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack_from(">I", payload, i + 4)
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"COMM" and len(body) >= 18:
            n_ch, n_frames, bits = struct.unpack_from(">HIH", body, 0)
            rate = int(round(_float80_be(body[8:18])))
            comm = (n_ch, n_frames, bits, rate)
        elif cid == b"SSND" and len(body) >= 8:
            off, _block = struct.unpack_from(">II", body, 0)
            ssnd = body[8 + off :]
        i += 8 + clen + (clen & 1)
    if comm is None or ssnd is None:
        return None
    n_ch, _n_frames, bits, rate = comm
    if n_ch < 1 or rate <= 0 or bits not in (8, 16, 24, 32):
        return None
    width = bits // 8
    n = len(ssnd) // (width * n_ch)
    if n == 0:
        return None
    if bits == 8:  # AIFF 8-bit is SIGNED (unlike WAV)
        samples = np.frombuffer(ssnd, dtype=np.int8, count=n * n_ch).astype(np.float32) / 128.0
    elif bits == 16:
        samples = np.frombuffer(ssnd, dtype=">i2", count=n * n_ch).astype(np.float32) / 32768.0
    elif bits == 24:
        b = np.frombuffer(ssnd, dtype=np.uint8, count=n * n_ch * 3).reshape(-1, 3)
        v = (
            (b[:, 0].astype(np.int32) << 16)
            | (b[:, 1].astype(np.int32) << 8)
            | b[:, 2].astype(np.int32)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        samples = v.astype(np.float32) / float(1 << 23)
    else:
        samples = np.frombuffer(ssnd, dtype=">i4", count=n * n_ch).astype(np.float32) / float(
            1 << 31
        )
    return rate, samples.reshape(n, n_ch)


def decode_au(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """Sun AU (.snd) decode: fixed big-endian header, encodings 1
    (µ-law), 2/3/4/5 (8/16/24/32-bit linear BE), 6 (float32 BE), 27
    (A-law)."""
    if not payload or len(payload) < 24 or payload[:4] != b".snd":
        return None
    off, dsize, enc, rate, n_ch = struct.unpack_from(">IIIII", payload, 4)
    if off < 24 or n_ch < 1 or rate <= 0:
        return None
    data = payload[off : off + dsize if dsize != 0xFFFFFFFF else len(payload)]
    if enc == 1 or enc == 27:
        table = _ULAW_TABLE if enc == 1 else _ALAW_TABLE
        n = len(data) // n_ch
        codes = np.frombuffer(data, dtype=np.uint8, count=n * n_ch)
        samples = table[codes].astype(np.float32) / 32768.0
    elif enc == 2:
        n = len(data) // n_ch
        samples = np.frombuffer(data, dtype=np.int8, count=n * n_ch).astype(np.float32) / 128.0
    elif enc == 3:
        n = len(data) // (2 * n_ch)
        samples = np.frombuffer(data, dtype=">i2", count=n * n_ch).astype(np.float32) / 32768.0
    elif enc == 4:
        n = len(data) // (3 * n_ch)
        b = np.frombuffer(data, dtype=np.uint8, count=n * n_ch * 3).reshape(-1, 3)
        v = (
            (b[:, 0].astype(np.int32) << 16)
            | (b[:, 1].astype(np.int32) << 8)
            | b[:, 2].astype(np.int32)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        samples = v.astype(np.float32) / float(1 << 23)
    elif enc == 5:
        n = len(data) // (4 * n_ch)
        samples = np.frombuffer(data, dtype=">i4", count=n * n_ch).astype(np.float32) / float(
            1 << 31
        )
    elif enc == 6:
        n = len(data) // (4 * n_ch)
        samples = np.frombuffer(data, dtype=">f4", count=n * n_ch).astype(np.float32)
    else:
        return None
    if n == 0:
        return None
    return rate, samples[: n * n_ch].reshape(n, n_ch)


def decode_audio(payload: bytes | None) -> tuple[int, np.ndarray] | None:
    """Magic-byte audio dispatcher — the audio twin of
    `decode_image_pixels`: RIFF/WAVE -> `decode_wav` (all PCM/G.711/
    ADPCM families), FORM/AIFF -> `decode_aiff`, .snd -> `decode_au`,
    fLaC -> `operators.flac.decode_flac` (samples scaled to float32
    [-1, 1] by 2^(bps-1)). None for anything else (MP3/OGG stay gated
    — lossy psychoacoustic decode has no byte-arithmetic oracle and
    no reference decoder in this container)."""
    if not payload or len(payload) < 4:
        return None
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:4] == b"FORM":
        return decode_aiff(payload)
    if payload[:4] == b".snd":
        return decode_au(payload)
    if payload[:4] == b"fLaC":
        from etly_spark.operators.flac import decode_flac

        out = decode_flac(payload)
        if out is None:
            return None
        rate, samples, bps = out
        return rate, samples.astype(np.float32) / float(1 << (bps - 1))
    return None


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
