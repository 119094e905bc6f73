"""Pure-Python LZ4 codec: block format + frame format (v1), plus the
xxHash32 checksum the frame format carries.

Why it exists: large training corpora ship as ``*.jsonl.lz4`` (the lz4
CLI's frame format), the sandbox has no ``lz4`` package, and Hadoop's
``Lz4Codec`` reads/writes Hadoop's OWN block framing — not the
interoperable frame format — so ``spark.read.text`` cannot ingest real
lz4 files. This module is the decode half of the Python-side ingest
path (sources/storage.py routes unsupported-extension objects through a
binaryFile + mapInPandas reader) and the encode twin exists so tests
and the catalog round-trip gate never depend on fixtures.

Honesty note (the spec-table rule from OPERATORS.md): LZ4 is a FULLY
STRUCTURAL format — token nibbles, LSIC length extension, little-endian
offsets, and five xxh32 prime constants. There is no empirical Huffman/
probability table to mis-remember, so unlike H.26x/zstd-FSE this codec
is safe to implement from the published spec and validate with
spec-derived vectors (tests/test_lz4.py hand-assembles blocks straight
from the format description) plus the xxh32 known-answer vector.

Scale framing: decode is bytearray-at-a-time Python — ~10-40 MB/s per
core, the documented no-native-libs tradeoff shared with every codec in
operators/. It runs inside executor-side mapInPandas stages, so corpus
throughput scales with total cores; nothing here touches the driver.

Reference parity: the reference ingests gzip only
(transfer_service.go:718-737 decode path); lz4/snappy ingest is part of
this repo's SURVEY §2.3 training-data extension scope.
"""

from __future__ import annotations

import struct

__all__ = [
    "xxh32",
    "compress_block",
    "decompress_block",
    "compress_frame",
    "decompress_frame",
]

_MAGIC = 0x184D2204
# frame descriptor FLG bits
_FLG_VERSION = 0b01 << 6
_FLG_B_INDEP = 1 << 5
_FLG_B_CHECKSUM = 1 << 4
_FLG_C_SIZE = 1 << 3
_FLG_C_CHECKSUM = 1 << 2
_FLG_DICT_ID = 1 << 0
# BD block-max-size codes (frame spec table)
_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (known-answer: xxh32(b"") == 0x02CC5D05).

    Sequential by construction (lane state chains), so it is plain
    Python — fine for the KB..MB objects the ingest path checksums;
    frames WE write carry checksums too (nothing is skipped to hide the
    cost)."""
    n = len(data)
    i = 0
    if n >= 16:
        a1 = (seed + _P1 + _P2) & _M32
        a2 = (seed + _P2) & _M32
        a3 = seed & _M32
        a4 = (seed - _P1) & _M32
        lanes = struct.unpack_from(f"<{(n // 16) * 4}I", data)
        for j in range(0, len(lanes), 4):
            a1 = (_rotl((a1 + lanes[j] * _P2) & _M32, 13) * _P1) & _M32
            a2 = (_rotl((a2 + lanes[j + 1] * _P2) & _M32, 13) * _P1) & _M32
            a3 = (_rotl((a3 + lanes[j + 2] * _P2) & _M32, 13) * _P1) & _M32
            a4 = (_rotl((a4 + lanes[j + 3] * _P2) & _M32, 13) * _P1) & _M32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M32
        i = (n // 16) * 16
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (u,) = struct.unpack_from("<I", data, i)
        h = (_rotl((h + u * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------- block


def decompress_block(
    src: bytes,
    out: bytearray | None = None,
    max_bytes: int = 1 << 28,
) -> bytearray | None:
    """LZ4 block → appended to ``out`` (callers pass the running buffer
    so block-LINKED frames get their cross-block match window for
    free). None on any malformation — corrupt objects are data at
    100 TB scale, never exceptions (fault-isolation contract,
    pipeline.py E1). ``max_bytes`` caps total output growth so a
    hostile block cannot balloon memory (LSIC lengths are unbounded
    integers in the format)."""
    if out is None:
        out = bytearray()
    base = len(out)
    i, end = 0, len(src)
    while True:
        if i >= end:
            return None  # a block must end after a literal run
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while i < end and src[i] == 255:
                lit += 255
                i += 1
            if i >= end:
                return None
            lit += src[i]
            i += 1
        if i + lit > end or len(out) + lit - base > max_bytes:
            return None
        out += src[i : i + lit]
        i += lit
        if i == end:
            return out  # clean end: last sequence is literals-only
        if i + 2 > end:
            return None
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            return None
        mlen = token & 15
        if mlen == 15:
            while i < end and src[i] == 255:
                mlen += 255
                i += 1
            if i >= end:
                return None
            mlen += src[i]
            i += 1
        mlen += 4
        if len(out) + mlen - base > max_bytes:
            return None
        if offset >= mlen:
            start = len(out) - offset
            out += out[start : start + mlen]
        else:
            # overlapping match (RLE-style semantics): the copyable
            # window doubles every pass, so this is O(log mlen) slice
            # appends, not a per-byte loop
            start = len(out) - offset  # FIXED origin: the materialized
            # prefix of the periodic sequence doubles each pass
            while mlen > 0:
                take = min(len(out) - start, mlen)
                out += out[start : start + take]
                mlen -= take


def compress_block(src: bytes) -> bytes:
    """Greedy hash-chain-of-1 matcher (the classic lz4 'fast' shape).

    Emits spec-VALID streams: min match 4, offsets ≤ 65535, the last
    match starts ≥ 12 bytes before end, and the final 5+ bytes are
    literals — the constraints real decoders enforce."""
    n = len(src)
    if n == 0:
        return b"\x00"  # one empty-literal token
    out = bytearray()
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - 12  # no match may start past here (spec end rules)

    def emit(lit_start: int, lit_end: int, offset: int, mlen: int) -> None:
        lit = lit_end - lit_start
        ml = mlen - 4 if mlen else 0
        token = (min(lit, 15) << 4) | (min(ml, 15) if mlen else 0)
        out.append(token)
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[lit_start:lit_end])
        if mlen:
            out.extend(struct.pack("<H", offset))
            if ml >= 15:
                rem = ml - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    misses = 0
    while i <= limit:
        key = src[i : i + 4]
        h = (int.from_bytes(key, "little") * 2654435761) >> 16 & 0xFFFF
        cand = table.get(h)
        table[h] = i
        if cand is not None and i - cand <= 65535 and src[cand : cand + 4] == key:
            # chunked match extension: 64-byte slice compares until the
            # first differing chunk, then a byte scan inside it — long
            # matches cost O(len/64) compares, not a per-byte loop
            mlen = 4
            max_len = n - 5 - i  # final 5 bytes stay literals
            while mlen + 64 <= max_len and src[cand + mlen : cand + mlen + 64] == src[i + mlen : i + mlen + 64]:
                mlen += 64
            while mlen < max_len and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, i - cand, mlen)
            i += mlen
            anchor = i
            misses = 0
            continue
        # lz4 'acceleration': long runs with no match step further per
        # probe, so incompressible input is a skim, not a per-byte hash
        misses += 1
        i += 1 + (misses >> 6)
    emit(anchor, n, 0, 0)  # trailing literals
    return bytes(out)


# ---------------------------------------------------------------- frame


def compress_frame(
    data: bytes,
    block_max: int = 1 << 20,
    content_checksum: bool = True,
    block_checksum: bool = False,
    store_size: bool = True,
) -> bytes:
    """LZ4 frame (magic 0x184D2204), independent blocks. Incompressible
    blocks are stored raw with the high bit set, exactly as the frame
    spec requires, so encoded size never exceeds input + headers."""
    bd_code = next(c for c, s in sorted(_BD_SIZES.items()) if s >= min(block_max, 1 << 22))
    flg = _FLG_VERSION | _FLG_B_INDEP
    if block_checksum:
        flg |= _FLG_B_CHECKSUM
    if content_checksum:
        flg |= _FLG_C_CHECKSUM
    if store_size:
        flg |= _FLG_C_SIZE
    bd = bd_code << 4
    desc = bytes([flg, bd]) + (struct.pack("<Q", len(data)) if store_size else b"")
    out = bytearray(struct.pack("<I", _MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    bmax = _BD_SIZES[bd_code]
    for pos in range(0, len(data), bmax):
        chunk = data[pos : pos + bmax]
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            body = comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            body = chunk
        out += body
        if block_checksum:
            out += struct.pack("<I", xxh32(body))
    out += b"\x00\x00\x00\x00"  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decompress_frame(src: bytes, max_bytes: int = 1 << 30) -> bytes | None:
    """Full frame decode: independent AND linked blocks, optional block/
    content checksums (always verified when present), skippable frames
    (magic 0x184D2A50-5F), multi-frame concatenation (the lz4 CLI
    appends frames like gzip members). None on malformation, bad
    checksum, preset-dictionary frames (undecodable without the dict),
    or output larger than ``max_bytes``."""
    out = bytearray()
    i, end = 0, len(src)
    saw_frame = False
    while i < end:
        if i + 4 > end:
            return None
        (magic,) = struct.unpack_from("<I", src, i)
        i += 4
        if 0x184D2A50 <= magic <= 0x184D2A5F:  # skippable frame
            if i + 4 > end:
                return None
            (sz,) = struct.unpack_from("<I", src, i)
            i += 4 + sz
            if i > end:
                return None
            continue
        if magic != _MAGIC:
            return None
        if i + 2 > end:
            return None
        flg, bd = src[i], src[i + 1]
        if (flg >> 6) != 0b01:
            return None  # unknown version
        desc_len = 2 + (8 if flg & _FLG_C_SIZE else 0) + (4 if flg & _FLG_DICT_ID else 0)
        if i + desc_len + 1 > end:
            return None
        desc = src[i : i + desc_len]
        hc = src[i + desc_len]
        if ((xxh32(bytes(desc)) >> 8) & 0xFF) != hc:
            return None
        if flg & _FLG_DICT_ID:
            return None  # preset dictionary: cannot decode honestly
        content_size = struct.unpack_from("<Q", src, i + 2)[0] if flg & _FLG_C_SIZE else None
        bmax = _BD_SIZES.get(bd >> 4)
        if bmax is None or (bd & 0x8F):
            return None  # reserved BD bits must be zero
        i += desc_len + 1
        frame_start = len(out)
        while True:
            if i + 4 > end:
                return None
            (bsize,) = struct.unpack_from("<I", src, i)
            i += 4
            if bsize == 0:
                break  # EndMark
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if bsize > bmax or i + bsize > end:
                return None
            body = src[i : i + bsize]
            i += bsize
            if flg & _FLG_B_CHECKSUM:
                if i + 4 > end or struct.unpack_from("<I", src, i)[0] != xxh32(body):
                    return None
                i += 4
            if stored:
                if len(out) + bsize > max_bytes:
                    return None
                out += body
            else:
                # pass the running buffer: linked frames (B.Indep=0)
                # legitimately reference the previous block's window;
                # budget = whatever max_bytes leaves for TOTAL output
                if decompress_block(body, out, max_bytes=max_bytes - len(out)) is None:
                    return None
        if flg & _FLG_C_CHECKSUM:
            if i + 4 > end:
                return None
            (cc,) = struct.unpack_from("<I", src, i)
            i += 4
            if cc != xxh32(bytes(out[frame_start:])):
                return None
        if content_size is not None and len(out) - frame_start != content_size:
            return None
        saw_frame = True
    return bytes(out) if saw_frame else None
