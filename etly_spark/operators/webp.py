"""WebP lossless (VP8L) codec in pure Python/numpy — no codec library.

The reference moves media as opaque bytes (transfer_object_service.go:
89-109); the training-data pipeline face of this repo decodes for real
where a container's coding needs no entropy-arithmetic engine. VP8L
(the WebP *lossless* bitstream) is Huffman + LZ77 + four reversible
transforms — the same public-knowledge class as the PNG/GIF/JPEG
decoders in `operators.codecs`:

- LSB-first bit reading (DEFLATE-style), canonical prefix codes with
  the 19-symbol code-length code (repeat ops 16/17/18), "simple" 1-2
  symbol codes;
- per-group 5-code entropy images (green+length+cache / red / blue /
  alpha / distance), optional meta-Huffman image, optional color
  cache (multiplier 0x1e35a7bd);
- LZ77 backward references with the 120-entry 2D distance map;
- inverse transforms: PREDICTOR (14 modes), COLOR (signed 3.5 fixed-
  point cross-channel), SUBTRACT_GREEN, COLOR_INDEXING (palette with
  sub-byte pixel bundling).

An `encode_lossless_webp` twin (literal/LZ77/cache/palette/
subtract-green) builds interoperable in-sandbox fixtures — VP8L is
lossless, so every round-trip test is bit-exact. External validation:
the ALPH chunk of CPython's test `python.webp` is a real
libwebp-encoded VP8L stream; `tests/test_webp.py` decodes it and
checks the recovered alpha plane (an independent encoder implementing
the same public spec).

Lossy WebP ('VP8 ' chunks) is boolean-arithmetic-coded — that class
stays behind the PIL gate in `operators.multimodal.decode_real`.

Spark face: these decoders run inside `operators.multimodal`'s
Arrow-batched mapInPandas — a pure map, no shuffle; codec parallelism
is executor parallelism at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Bit I/O — LSB-first within bytes (DEFLATE convention), unlike JPEG's
# MSB-first reader in operators.codecs
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def take(self, k: int) -> int | None:
        if k == 0:
            return 0
        while self.n < k:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        out = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return out


class _BitsW:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, k: int) -> None:
        self.acc |= (value & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, length: int) -> None:
        """Emit a canonical Huffman code MSB-first (the decoder walks
        the code tree one stream bit at a time)."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Canonical prefix codes
# ---------------------------------------------------------------------------


def _canon_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (shortest lengths first,
    symbol order within a length) — the DEFLATE/VP8L rule."""
    out: dict[int, tuple[int, int]] = {}
    pairs = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        out[sym] = (code, ln)
        code += 1
        prev_len = ln
    return out


class _Huff:
    """Decode table: either a single 0-bit symbol or a {(len, code):
    sym} map walked bit-by-bit."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        codes = _canon_codes(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}
        self.max_len = max(l for _, l in nz)
        # completeness check: a truncated/corrupt code must not decode
        if sum(1 << (self.max_len - l) for _, l in nz) != 1 << self.max_len:
            raise ValueError("incomplete huffman code")

    def decode(self, br: _Bits) -> int | None:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            bit = br.take(1)
            if bit is None:
                return None
            code = (code << 1) | bit
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        return None


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_huff(br: _Bits, alphabet: int) -> _Huff | None:
    simple = br.take(1)
    if simple is None:
        return None
    if simple:
        nsym = br.take(1)
        if nsym is None:
            return None
        nsym += 1
        wide = br.take(1)
        if wide is None:
            return None
        s0 = br.take(8 if wide else 1)
        if s0 is None or s0 >= alphabet:
            return None
        lengths = [0] * alphabet
        lengths[s0] = 1
        if nsym == 2:
            s1 = br.take(8)
            if s1 is None or s1 >= alphabet or s1 == s0:
                return None
            lengths[s1] = 1
        try:
            return _Huff(lengths)
        except ValueError:
            return None
    num_cl = br.take(4)
    if num_cl is None:
        return None
    num_cl += 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        v = br.take(3)
        if v is None:
            return None
        cl_lengths[_CL_ORDER[i]] = v
    try:
        cl = _Huff(cl_lengths)
    except ValueError:
        return None
    use_max = br.take(1)
    if use_max is None:
        return None
    if use_max:
        nbits = br.take(3)
        if nbits is None:
            return None
        max_symbol = br.take(2 + 2 * nbits)
        if max_symbol is None:
            return None
        max_symbol += 2
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = cl.decode(br)
        if sym is None:
            return None
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        else:
            if sym == 16:
                extra = br.take(2)
                rep, val = (3 + extra, prev) if extra is not None else (None, 0)
            elif sym == 17:
                extra = br.take(3)
                rep, val = (3 + extra, 0) if extra is not None else (None, 0)
            else:
                extra = br.take(7)
                rep, val = (11 + extra, 0) if extra is not None else (None, 0)
            if rep is None or i + rep > alphabet:
                return None
            if val:
                for j in range(rep):
                    lengths[i + j] = val
            i += rep
    try:
        return _Huff(lengths)
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# LZ77 prefix values and the 2D distance map
# ---------------------------------------------------------------------------


def _prefix_val(br: _Bits, prefix: int) -> int | None:
    """Prefix-coded value (lengths and distance codes share this)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    bits = br.take(extra)
    if bits is None:
        return None
    return offset + bits + 1


def _prefix_sym(value: int) -> tuple[int, int, int]:
    """(prefix, extra_bits_count, extra_bits_value) — encode twin of
    `_prefix_val`."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    rest = v - (1 << nbits)
    half = rest >> (nbits - 1)  # 0 or 1: which half of the octave
    extra = nbits - 1
    prefix = 2 * nbits + half
    return prefix, extra, rest & ((1 << extra) - 1)


def _build_dist_map() -> list[tuple[int, int]]:
    """The 120 closest causal (x, y) offsets — y in 0..7, x in -7..8,
    ordered by x^2+y^2 then |x| then sign (the spec's distance_map)."""
    cands = [
        (x, y)
        for y in range(0, 8)
        for x in range(-7, 9)
        if (y > 0 or x > 0)
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cands


_DIST_MAP = _build_dist_map()
assert len(_DIST_MAP) == 120


def _map_dist(code: int, w: int) -> int:
    if code > 120:
        return code - 120
    x, y = _DIST_MAP[code - 1]
    return max(1, y * w + x)


# ---------------------------------------------------------------------------
# Entropy-coded image reading
# ---------------------------------------------------------------------------


def _sub_size(n: int, bits: int) -> int:
    return (n + (1 << bits) - 1) >> bits


_HASH_MUL = 0x1E35A7BD


def _read_pixels(br: _Bits, w: int, h: int, allow_meta: bool) -> list[int] | None:
    """One entropy-coded image: color-cache header, optional
    meta-Huffman (main image only), per-group 5 codes, then the
    literal / backward-reference / cache-reference pixel stream."""
    use_cache = br.take(1)
    if use_cache is None:
        return None
    cache_bits = 0
    if use_cache:
        cache_bits = br.take(4)
        if cache_bits is None or not 1 <= cache_bits <= 11:
            return None
    hbits = 0
    meta = None
    meta_w = 0
    ngroups = 1
    if allow_meta:
        has_meta = br.take(1)
        if has_meta is None:
            return None
        if has_meta:
            hbits = br.take(3)
            if hbits is None:
                return None
            hbits += 2
            meta_w = _sub_size(w, hbits)
            mpix = _read_pixels(br, meta_w, _sub_size(h, hbits), False)
            if mpix is None:
                return None
            meta = [(p >> 8) & 0xFFFF for p in mpix]
            ngroups = max(meta) + 1
    cache_size = (1 << cache_bits) if use_cache else 0
    groups = []
    for _ in range(ngroups):
        g5 = [
            _read_huff(br, 256 + 24 + cache_size),
            _read_huff(br, 256),
            _read_huff(br, 256),
            _read_huff(br, 256),
            _read_huff(br, 40),
        ]
        if any(c is None for c in g5):
            return None
        groups.append(g5)
    cache = [0] * cache_size
    n = w * h
    out = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            g = meta[(pos // w >> hbits) * meta_w + ((pos % w) >> hbits)]
            if g >= ngroups:
                return None
        else:
            g = 0
        gc, rc, bc, ac, dc = groups[g]
        s = gc.decode(br)
        if s is None:
            return None
        if s < 256:
            r = rc.decode(br)
            b = bc.decode(br)
            a = ac.decode(br)
            if r is None or b is None or a is None:
                return None
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache_size:
                cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:
            length = _prefix_val(br, s - 256)
            dsym = dc.decode(br)
            if length is None or dsym is None:
                return None
            dcode = _prefix_val(br, dsym)
            if dcode is None:
                return None
            dist = _map_dist(dcode, w)
            if dist > pos or pos + length > n:
                return None
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:
            idx = s - 280
            if idx >= cache_size:
                return None
            out[pos] = cache[idx]
            pos += 1
    return out


# ---------------------------------------------------------------------------
# Inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (c >> sh) & 0xFF
        d = a - b
        # C-style truncation toward zero, as libwebp's (a - b) / 2
        v = a + (abs(d) // 2 if d >= 0 else -(abs(d) // 2))
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _select(top: int, left: int, topleft: int) -> int:
    pa_minus_pb = 0
    for sh in (24, 16, 8, 0):
        t = (top >> sh) & 0xFF
        l = (left >> sh) & 0xFF
        tl = (topleft >> sh) & 0xFF
        pa_minus_pb += abs(l - tl) - abs(t - tl)
    return top if pa_minus_pb <= 0 else left


def _add_px(a: int, b: int) -> int:
    """Per-channel modular add of two ARGB words."""
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _inv_predictor(pix: list[int], w: int, h: int, bits: int, timg: list[int]) -> list[int] | None:
    tw = _sub_size(w, bits)
    out = pix  # in place: residual -> pixel
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = out[i - 1]  # left
        elif x == 0:
            pred = out[i - w]  # top
        else:
            mode = (timg[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
            L = out[i - 1]
            T = out[i - w]
            TL = out[i - w - 1]
            TR = out[i - w + 1]  # for x == w-1 this is row start (causal)
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2(_avg2(L, TR), T)
            elif mode == 6:
                pred = _avg2(L, TL)
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(TL, T)
            elif mode == 9:
                pred = _avg2(T, TR)
            elif mode == 10:
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:
                pred = _select(T, L, TL)
            elif mode == 12:
                pred = _clamp_add_sub_full(L, T, TL)
            elif mode == 13:
                pred = _clamp_add_sub_half(_avg2(L, T), TL)
            else:
                return None
        out[i] = _add_px(out[i], pred)
    return out


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color(pix: list[int], w: int, h: int, bits: int, timg: list[int]) -> list[int]:
    tw = _sub_size(w, bits)
    for i in range(w * h):
        x, y = i % w, i // w
        t = timg[(y >> bits) * tw + (x >> bits)]
        g2r = _s8((t >> 16) & 0xFF)
        g2b = _s8((t >> 8) & 0xFF)
        r2b = _s8(t & 0xFF)
        px = pix[i]
        a = px >> 24
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        gs = _s8(g)
        r = (r + ((g2r * gs) >> 5)) & 0xFF
        b = (b + ((g2b * gs) >> 5) + ((r2b * _s8(r)) >> 5)) & 0xFF
        pix[i] = (a << 24) | (r << 16) | (g << 8) | b
    return pix


def _inv_subtract_green(pix: list[int], w: int, h: int) -> list[int]:
    for i in range(w * h):
        px = pix[i]
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pix[i] = (px & 0xFF00FF00) | (r << 16) | b
    return pix


def _inv_palette(
    pix: list[int], packed_w: int, h: int, full_w: int, wbits: int, palette: list[int]
) -> list[int] | None:
    psize = len(palette)
    out = [0] * (full_w * h)
    if wbits == 0:
        for i in range(full_w * h):
            idx = (pix[i] >> 8) & 0xFF
            if idx >= psize:
                return None
            out[i] = palette[idx]
        return out
    ppb = 1 << wbits  # pixels per green byte
    bpp = 8 >> wbits  # bits per pixel
    mask = (1 << bpp) - 1
    for y in range(h):
        for x in range(full_w):
            bundle = (pix[y * packed_w + (x >> wbits)] >> 8) & 0xFF
            idx = (bundle >> (bpp * (x & (ppb - 1)))) & mask
            if idx >= psize:
                return None
            out[y * full_w + x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# VP8L stream decode
# ---------------------------------------------------------------------------


def decode_vp8l_stream(
    data: bytes, *, headerless_size: tuple[int, int] | None = None
) -> tuple[np.ndarray, bool] | None:
    """Decode a VP8L bitstream to an (h, w, 4) RGBA uint8 array plus the
    header's alpha-used hint. ``headerless_size`` decodes an implicit-
    dimension stream (the ALPH-chunk form, no signature/size header)."""
    br = _Bits(data)
    if headerless_size is None:
        if br.take(8) != 0x2F:
            return None
        w = br.take(14)
        h = br.take(14)
        alpha_used = br.take(1)
        version = br.take(3)
        if w is None or h is None or version != 0:
            return None
        w += 1
        h += 1
    else:
        w, h = headerless_size
        alpha_used = 1
    # transforms (at most one of each of the 4 types)
    transforms = []  # (type, params) in read order
    xsize = w
    for _ in range(5):
        more = br.take(1)
        if more is None:
            return None
        if not more:
            break
        ttype = br.take(2)
        if ttype is None or any(t[0] == ttype for t in transforms):
            return None
        if ttype == 2:  # subtract green
            transforms.append((2, None))
        elif ttype in (0, 1):  # predictor / color
            bits = br.take(3)
            if bits is None:
                return None
            bits += 2
            timg = _read_pixels(br, _sub_size(xsize, bits), _sub_size(h, bits), False)
            if timg is None:
                return None
            transforms.append((ttype, (bits, timg)))
        else:  # color indexing
            psize = br.take(8)
            if psize is None:
                return None
            psize += 1
            praw = _read_pixels(br, psize, 1, False)
            if praw is None:
                return None
            palette = []
            prev = 0
            for p in praw:  # palette entries are per-channel deltas
                prev = _add_px(prev, p)
                palette.append(prev)
            wbits = 3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
            transforms.append((3, (wbits, palette, xsize)))
            xsize = _sub_size(xsize, wbits)
    else:
        return None  # >4 claimed transforms: corrupt
    pix = _read_pixels(br, xsize, h, True)
    if pix is None:
        return None
    # apply inverses in reverse read order
    cur_w = xsize
    for ttype, params in reversed(transforms):
        if ttype == 3:
            wbits, palette, full_w = params
            pix = _inv_palette(pix, cur_w, h, full_w, wbits, palette)
            cur_w = full_w
        elif ttype == 2:
            pix = _inv_subtract_green(pix, cur_w, h)
        elif ttype == 1:
            pix = _inv_color(pix, cur_w, h, *params)
        else:
            pix = _inv_predictor(pix, cur_w, h, *params)
        if pix is None:
            return None
    if cur_w != w:
        return None
    arr = np.array(pix, dtype=np.uint32).reshape(h, w)
    rgba = np.stack(
        [
            (arr >> 16) & 0xFF,
            (arr >> 8) & 0xFF,
            arr & 0xFF,
            (arr >> 24) & 0xFF,
        ],
        axis=-1,
    ).astype(np.uint8)
    return rgba, bool(alpha_used)


def _riff_chunks(payload: bytes) -> list[tuple[bytes, bytes]] | None:
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    chunks = []
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if len(body) != sz:
            return None
        chunks.append((tag, body))
        pos += 8 + sz + (sz & 1)
    return chunks


def decode_webp_pixels(payload: bytes) -> np.ndarray | None:
    """Decode a WebP container: VP8L (lossless) chunks decode for real
    with the from-scratch codec below; lossy 'VP8 ' decodes via the
    platform libwebp when present (operators/libwebp — the reference
    implementation; RFC 6386's boolean-arithmetic probability tables
    are never reimplemented from memory), else None (the honest gate).
    Returns (h, w, 3) when the stream marks alpha unused, else
    (h, w, 4)."""
    chunks = _riff_chunks(payload)
    if not chunks:
        return None
    for tag, body in chunks:
        if tag == b"VP8L":
            got = decode_vp8l_stream(body)
            if got is None:
                return None
            rgba, alpha_used = got
            return rgba if alpha_used else rgba[:, :, :3].copy()
    if any(tag == b"VP8 " for tag, _ in chunks):
        from etly_spark.operators import libwebp

        if libwebp.available():
            rgba = libwebp.decode_rgba(payload)
            if rgba is not None:
                # lossy VP8 has no alpha of its own; a VP8X/ALPH
                # container would carry it — keep 4 channels only when
                # any alpha byte is not 255
                if (rgba[:, :, 3] != 255).any():
                    return rgba
                return rgba[:, :, :3].copy()
    return None  # lossy VP8 without libwebp / VP8X-only: gated


def parse_webp_header(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from any WebP flavor's header — metadata
    never needs entropy decode (VP8X dims, VP8L 14-bit dims, or the
    lossy VP8 frame header)."""
    chunks = _riff_chunks(payload)
    if not chunks:
        return None
    for tag, body in chunks:
        if tag == b"VP8X" and len(body) >= 10:
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
            return ("webp", w, h)
        if tag == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            bits = int.from_bytes(body[1:5], "little")
            return ("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        if tag == b"VP8 " and len(body) >= 10:
            # lossy key frame: start code 9d 01 2a then 14-bit dims
            if body[3:6] == b"\x9d\x01\x2a":
                w = int.from_bytes(body[6:8], "little") & 0x3FFF
                h = int.from_bytes(body[8:10], "little") & 0x3FFF
                return ("webp", w, h)
    return None


# ---------------------------------------------------------------------------
# ALPH chunk (alpha plane of lossy WebP): real VP8L entropy coding with
# implicit dims — decoded here both as the external validation target
# and to recover alpha for lossy files without decoding VP8 luma
# ---------------------------------------------------------------------------


def decode_alpha_chunk(body: bytes, w: int, h: int) -> np.ndarray | None:
    """ALPH chunk -> (h, w) uint8 alpha plane. Compression method 0 is
    raw; method 1 is a headerless VP8L stream whose green channel is
    the (optionally filtered) alpha value."""
    if not body:
        return None
    head = body[0]
    method = head & 3
    filt = (head >> 2) & 3
    if method == 0:
        if len(body) < 1 + w * h:
            return None
        plane = np.frombuffer(body[1 : 1 + w * h], dtype=np.uint8).reshape(h, w).copy()
    elif method == 1:
        got = decode_vp8l_stream(body[1:], headerless_size=(w, h))
        if got is None:
            return None
        plane = got[0][:, :, 1].copy()  # green carries alpha
    else:
        return None
    if filt == 0:
        return plane
    p = plane.astype(np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0
            elif filt == 1:  # horizontal
                pred = p[y, x - 1] if x > 0 else p[y - 1, x]
            elif filt == 2:  # vertical
                pred = p[y - 1, x] if y > 0 else p[y, x - 1]
            else:  # gradient
                if y == 0:
                    pred = p[y, x - 1]
                elif x == 0:
                    pred = p[y - 1, x]
                else:
                    g = int(p[y, x - 1]) + int(p[y - 1, x]) - int(p[y - 1, x - 1])
                    pred = 0 if g < 0 else 255 if g > 255 else g
            p[y, x] = (p[y, x] + pred) & 0xFF
    return p.astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder twin — interoperable VP8L (lossless, so round-trips are
# bit-exact). Supports literals, LZ77 backward references, the color
# cache, SUBTRACT_GREEN, and COLOR_INDEXING; enough surface to exercise
# every decode path above and to serve as the lossless member of the
# sink-side codec family.
# ---------------------------------------------------------------------------


def _huff_lengths(freq: dict[int, int], alphabet: int, limit: int) -> list[int]:
    """Optimal length-limited code lengths (Huffman + the same
    fold-down as codecs._jpeg_optimal_table, without JPEG's reserved
    codepoint — VP8L has no all-ones restriction)."""
    nz = [(f, s) for s, f in freq.items() if f > 0]
    lengths = [0] * alphabet
    if not nz:
        return lengths
    if len(nz) == 1:
        lengths[nz[0][1]] = 1
        return lengths
    import heapq

    heap = [(f, i, (s,)) for i, (f, s) in enumerate(nz)]
    heapq.heapify(heap)
    uid = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, s1 + s2))
        uid += 1
    # fold codes longer than `limit` down (preserves Kraft completeness)
    bits = [0] * (max(lengths) + 2)
    for ln in lengths:
        if ln:
            bits[ln] += 1
    if len(bits) - 2 > limit:
        for length in range(len(bits) - 1, limit, -1):
            while bits[length] > 0:
                j = length - 2
                while bits[j] == 0:
                    j -= 1
                bits[length] -= 2
                bits[length - 1] += 1
                bits[j + 1] += 2
                bits[j] -= 1
        # reassign: most frequent symbols get the shortest lengths
        order = sorted(nz, reverse=True)  # by freq desc
        new_lens = []
        for ln in range(1, limit + 1):
            new_lens += [ln] * bits[ln]
        lengths = [0] * alphabet
        for (f, s), ln in zip(order, sorted(new_lens)):
            lengths[s] = ln
    return lengths


def _emit_huff(bw: _BitsW, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit one Huffman code header (simple or code-length-coded) and
    return the symbol->(code, length) map for the data pass."""
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(nz) <= 2 and all(s < 256 for s in nz):
        bw.put(1, 1)  # simple
        bw.put(len(nz) - 1, 1)
        s0 = nz[0]
        if s0 <= 1:
            bw.put(0, 1)
            bw.put(s0, 1)
        else:
            bw.put(1, 1)
            bw.put(s0, 8)
        if len(nz) == 2:
            bw.put(nz[1], 8)
        if len(nz) == 1:
            return {nz[0]: (0, 0)}
        return {s: c for s, c in _canon_codes(
            [1 if s in nz else 0 for s in range(max(nz) + 1)]).items()}
    bw.put(0, 1)  # normal: code-length-coded lengths
    # RLE the lengths into code-length symbols
    seq: list[tuple[int, int, int]] = []  # (cl_sym, extra_val, extra_bits)
    i = 0
    prev = 8
    n = len(lengths)
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                rep = min(left, 138)
                seq.append((18, rep - 11, 7))
                left -= rep
            while left >= 3:
                rep = min(left, 6)
                seq.append((17, rep - 3, 3))
                left -= rep
            seq += [(0, 0, 0)] * left
        else:
            left = run
            seq.append((ln, 0, 0))
            left -= 1
            if ln == prev or True:
                pass
            prev_l = ln
            while left >= 3:
                rep = min(left, 6)
                seq.append((16, rep - 3, 2))
                left -= rep
            seq += [(prev_l, 0, 0)] * left
            prev = ln
        i += run
    clfreq: dict[int, int] = {}
    for s, _, _ in seq:
        clfreq[s] = clfreq.get(s, 0) + 1
    cl_lengths = _huff_lengths(clfreq, 19, 7)
    if sum(1 for l in cl_lengths if l) == 1:
        # a single-symbol CL code decodes with 0 bits; make it 2-symbol
        # so both encoders and strict decoders agree on completeness
        other = next(s for s in range(19) if cl_lengths[s] == 0)
        cl_lengths[other] = 1
        cl_lengths[[s for s, l in enumerate(cl_lengths) if l and s != other][0]] = 1
    bw.put(15, 4)  # num_code_lengths = 19
    for s in _CL_ORDER:
        bw.put(cl_lengths[s], 3)
    bw.put(0, 1)  # no max-symbol shortcut
    cl_codes = _canon_codes(cl_lengths)
    single_cl = sum(1 for l in cl_lengths if l) == 1
    for s, extra, ebits in seq:
        if not single_cl:
            code, ln = cl_codes[s]
            bw.put_code(code, ln)
        if ebits:
            bw.put(extra, ebits)
    return _canon_codes(lengths)


def _hash_px(px: int, cache_bits: int) -> int:
    return ((px * _HASH_MUL) & 0xFFFFFFFF) >> (32 - cache_bits)


def _tokenize(pix: list[int], w: int, use_lz77: bool, cache_bits: int):
    """Greedy token stream: ('lit', px) / ('cache', idx) /
    ('copy', length, dist). Runs at distance 1 and w are the encoder's
    LZ77 repertoire — enough to exercise the decoder's copy paths."""
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(pix)
    pos = 0
    while pos < n:
        if use_lz77 and pos >= 1:
            best_len = 0
            best_d = 0
            for d in (1, w):
                if d == 0 or d > pos:
                    continue
                ln = 0
                while pos + ln < n and ln < 4096 and pix[pos + ln - d] == pix[pos + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_d = ln, d
            if best_len >= 3:
                tokens.append(("copy", best_len, best_d))
                if cache is not None:
                    for k in range(best_len):
                        px = pix[pos + k]
                        cache[_hash_px(px, cache_bits)] = px
                pos += best_len
                continue
        px = pix[pos]
        if cache is not None and cache[_hash_px(px, cache_bits)] == px:
            tokens.append(("cache", _hash_px(px, cache_bits)))
        else:
            tokens.append(("lit", px))
            if cache is not None:
                cache[_hash_px(px, cache_bits)] = px
        pos += 1
    return tokens


def _dist_to_code(d: int, w: int) -> int:
    """Prefer the 2D map codes (shorter prefixes) where applicable."""
    for idx, (x, y) in enumerate(_DIST_MAP):
        if max(1, y * w + x) == d:
            return idx + 1
    return d + 120


def _emit_pixel_stream(bw: _BitsW, pix: list[int], w: int, *,
                       use_lz77: bool, cache_bits: int,
                       allow_meta: bool = False) -> None:
    """Cache header (+ the no-meta-Huffman bit when this is the main
    image) + 5 codes + token data: the encoder half of `_read_pixels`
    for a single-group image. Stream order matters: cache header FIRST,
    then the meta bit — mirroring the reader."""
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    if allow_meta:
        bw.put(0, 1)  # single group: no meta-Huffman image
    tokens = _tokenize(pix, w, use_lz77, cache_bits)
    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            gfreq[(px >> 8) & 0xFF] = gfreq.get((px >> 8) & 0xFF, 0) + 1
            rfreq[(px >> 16) & 0xFF] = rfreq.get((px >> 16) & 0xFF, 0) + 1
            bfreq[px & 0xFF] = bfreq.get(px & 0xFF, 0) + 1
            afreq[px >> 24] = afreq.get(px >> 24, 0) + 1
        elif t[0] == "cache":
            s = 280 + t[1]
            gfreq[s] = gfreq.get(s, 0) + 1
        else:
            lp, _, _ = _prefix_sym(t[1])
            gfreq[256 + lp] = gfreq.get(256 + lp, 0) + 1
            dp, _, _ = _prefix_sym(_dist_to_code(t[2], w))
            dfreq[dp] = dfreq.get(dp, 0) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    # an unused code still needs one symbol — a zero-length table is
    # (correctly) rejected by strict readers, including ours
    gcodes = _emit_huff(bw, _huff_lengths(gfreq or {0: 1}, 256 + 24 + cache_size, 15))
    rcodes = _emit_huff(bw, _huff_lengths(rfreq or {0: 1}, 256, 15))
    bcodes = _emit_huff(bw, _huff_lengths(bfreq or {0: 1}, 256, 15))
    acodes = _emit_huff(bw, _huff_lengths(afreq or {0: 1}, 256, 15))
    dcodes = _emit_huff(bw, _huff_lengths(dfreq or {0: 1}, 40, 15))
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            bw.put_code(*gcodes[(px >> 8) & 0xFF])
            bw.put_code(*rcodes[(px >> 16) & 0xFF])
            bw.put_code(*bcodes[px & 0xFF])
            bw.put_code(*acodes[px >> 24])
        elif t[0] == "cache":
            bw.put_code(*gcodes[280 + t[1]])
        else:
            lp, lbits, lval = _prefix_sym(t[1])
            bw.put_code(*gcodes[256 + lp])
            if lbits:
                bw.put(lval, lbits)
            dcode = _dist_to_code(t[2], w)
            dp, dbits, dval = _prefix_sym(dcode)
            bw.put_code(*dcodes[dp])
            if dbits:
                bw.put(dval, dbits)


def encode_lossless_webp(
    arr: np.ndarray,
    *,
    subtract_green: bool = False,
    use_lz77: bool = True,
    cache_bits: int = 0,
    use_palette: bool = False,
) -> bytes:
    """Encode a uint8 raster — (h, w) gray, (h, w, 3) RGB, or (h, w, 4)
    RGBA — as a lossless WebP (RIFF + VP8L). Standard bitstream
    features only; decodable by any WebP decoder, and bit-exact on
    round-trip (the format is lossless)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("expected (h, w[, 3|4]) uint8 array")
    h, w = arr.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("dims out of VP8L range")
    has_alpha = arr.shape[2] == 4
    a = arr[:, :, 3].astype(np.uint32) if has_alpha else np.full((h, w), 255, np.uint32)
    pix_arr = (
        (a << 24)
        | (arr[:, :, 0].astype(np.uint32) << 16)
        | (arr[:, :, 1].astype(np.uint32) << 8)
        | arr[:, :, 2].astype(np.uint32)
    )
    pix = [int(p) for p in pix_arr.reshape(-1)]

    bw = _BitsW()
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1 if has_alpha else 0, 1)
    bw.put(0, 3)  # version

    if use_palette and subtract_green:
        raise ValueError("palette and subtract_green are mutually exclusive here")

    if use_palette:
        uniq = sorted(set(pix))
        if len(uniq) > 256:
            raise ValueError("more than 256 distinct pixels for palette mode")
        index = {p: i for i, p in enumerate(uniq)}
        psize = len(uniq)
        bw.put(1, 1)
        bw.put(3, 2)  # COLOR_INDEXING
        bw.put(psize - 1, 8)
        # palette entries stored as per-channel deltas
        deltas = []
        prev = 0
        for p in uniq:
            deltas.append(
                ((((p >> 24) - (prev >> 24)) & 0xFF) << 24)
                | (((((p >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((p >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8)
                | (((p & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            prev = p
        _emit_pixel_stream(bw, deltas, psize, use_lz77=False, cache_bits=0)
        wbits = 3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
        if wbits:
            bpp = 8 >> wbits
            ppb = 1 << wbits
            packed_w = _sub_size(w, wbits)
            packed = []
            for y in range(h):
                for bx in range(packed_w):
                    bundle = 0
                    for k in range(ppb):
                        x = bx * ppb + k
                        if x < w:
                            bundle |= index[pix[y * w + x]] << (bpp * k)
                    packed.append((0xFF << 24) | (bundle << 8))
            pix = packed
            w_enc = packed_w
        else:
            pix = [(0xFF << 24) | (index[p] << 8) for p in pix]
            w_enc = w
    else:
        w_enc = w
        if subtract_green:
            bw.put(1, 1)
            bw.put(2, 2)  # SUBTRACT_GREEN
            out = []
            for p in pix:
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) - g) & 0xFF
                b = ((p & 0xFF) - g) & 0xFF
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            pix = out
    bw.put(0, 1)  # end of transforms
    _emit_pixel_stream(
        bw, pix, w_enc, use_lz77=use_lz77, cache_bits=cache_bits, allow_meta=True
    )
    vp8l = bw.flush()

    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"  # RIFF even-size padding
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
