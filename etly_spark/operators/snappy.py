"""Pure-Python Snappy codec: raw block format + the framing format
(``.sz`` / ``application/x-snappy-framed``), plus masked CRC-32C.

Why it exists: snappy-framed ndjson is a common object-store corpus
encoding, the sandbox has no ``python-snappy``, and Hadoop's
SnappyCodec (a) needs native libs absent from pip pyspark and (b) is
hadoop-framed, not this format. Like operators/lz4.py this is the
decode half of the Python-side ingest route in sources/storage.py with
an encoder twin for fixture-free tests.

Honesty note (OPERATORS.md spec-table rule): Snappy is FULLY STRUCTURAL
— varint length, two-bit tag dispatch, little-endian offsets, and the
CRC-32C polynomial 0x1EDC6F41 with the documented mask rotation. No
empirical tables exist to mis-remember; the CRC anchors to the
published check value crc32c(b"123456789") == 0xE3069283
(tests/test_lz4.py::test_crc32c_check_value).

Reference parity: gzip-only ingest in the reference
(transfer_service.go:718-737); snappy/lz4 are SURVEY §2.3 extension
scope.
"""

from __future__ import annotations

import struct

__all__ = [
    "crc32c",
    "compress_raw",
    "decompress_raw",
    "compress_framed",
    "decompress_framed",
]

_CRC_TABLE: list[int] | None = None


def _crc_table() -> list[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C (Castagnoli), reflected, init/xorout 0xFFFFFFFF."""
    tbl = _crc_table()
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = tbl[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _mask_crc(crc: int) -> int:
    """The framing format's mask: rotate right 15, add a constant —
    defends against CRCs of CRCs in the stream."""
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _uvarint(src: bytes, i: int) -> tuple[int, int] | None:
    out = shift = 0
    while i < len(src):
        b = src[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 35:
            return None
    return None


# ------------------------------------------------------------ raw block


def decompress_raw(src: bytes, max_bytes: int = 1 << 28) -> bytes | None:
    """Raw snappy block → bytes, None on malformation. The declared
    uncompressed length is bounded by ``max_bytes`` BEFORE any
    allocation, so a hostile varint cannot balloon memory."""
    head = _uvarint(src, 0)
    if head is None:
        return None
    ulen, i = head
    if ulen > max_bytes:
        return None
    out = bytearray()
    end = len(src)
    while i < end:
        tag = src[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if i + nb > end:
                    return None
                ln = int.from_bytes(src[i : i + nb], "little")
                i += nb
            ln += 1
            if i + ln > end or len(out) + ln > ulen:
                return None
            out += src[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy, 3-bit len + 11-bit offset
            if i >= end:
                return None
            ln = 4 + ((tag >> 2) & 7)
            offset = ((tag >> 5) << 8) | src[i]
            i += 1
        elif kind == 2:  # copy, 16-bit LE offset
            if i + 2 > end:
                return None
            ln = (tag >> 2) + 1
            offset = src[i] | (src[i + 1] << 8)
            i += 2
        else:  # copy, 32-bit LE offset
            if i + 4 > end:
                return None
            ln = (tag >> 2) + 1
            (offset,) = struct.unpack_from("<I", src, i)
            i += 4
        if offset == 0 or offset > len(out) or len(out) + ln > ulen:
            return None
        if offset >= ln:
            start = len(out) - offset
            out += out[start : start + ln]
        else:  # overlapping: doubling-window periodic copy
            start = len(out) - offset
            rem = ln
            while rem > 0:
                take = min(len(out) - start, rem)
                out += out[start : start + take]
                rem -= take
    if len(out) != ulen:
        return None
    return bytes(out)


def compress_raw(src: bytes) -> bytes:
    """Greedy hash matcher emitting literals + copy-with-16-bit-offset
    ops (every real decoder accepts this op mix; copy ops are chunked
    to the 64-byte per-op maximum)."""
    n = len(src)
    out = bytearray()
    # uvarint uncompressed length
    v = n
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)

    def emit_literal(a: int, b: int) -> None:
        ln = b - a
        while ln > 0:
            take = min(ln, 1 << 16)  # 3-byte length form caps at 2^24; stay small
            if take <= 60:
                out.append((take - 1) << 2)
            elif take <= 256:
                out.append(60 << 2)
                out.append(take - 1)
            else:
                out.append(61 << 2)
                out.extend(struct.pack("<H", take - 1))
            out.extend(src[a : a + take])
            a += take
            ln -= take

    def emit_copy(offset: int, ln: int) -> None:
        while ln > 0:
            # never leave a tail shorter than the 4-byte op minimum
            take = min(ln, 64) if ln <= 64 or ln >= 68 else 60
            out.append(((take - 1) << 2) | 2)
            out.extend(struct.pack("<H", offset))
            ln -= take

    table: dict[int, int] = {}
    anchor = 0
    i = 0
    limit = n - 4
    misses = 0
    while i <= limit:
        key = src[i : i + 4]
        h = (int.from_bytes(key, "little") * 2654435761) >> 18 & 0x3FFF
        cand = table.get(h)
        table[h] = i
        if cand is not None and i - cand <= 65535 and src[cand : cand + 4] == key:
            mlen = 4
            max_len = n - i
            while mlen + 64 <= max_len and src[cand + mlen : cand + mlen + 64] == src[i + mlen : i + mlen + 64]:
                mlen += 64
            while mlen < max_len and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit_literal(anchor, i)
            emit_copy(i - cand, mlen)
            i += mlen
            anchor = i
            misses = 0
            continue
        misses += 1
        i += 1 + (misses >> 6)
    emit_literal(anchor, n)
    return bytes(out)


# --------------------------------------------------------------- framed

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
_MAX_CHUNK = 65536


def compress_framed(data: bytes) -> bytes:
    """Snappy framing format: stream identifier, then per-64KiB chunks
    compressed (type 0x00) or stored (0x01) — whichever is smaller —
    each with the masked CRC-32C of its UNCOMPRESSED bytes."""
    out = bytearray(_STREAM_ID)
    for pos in range(0, len(data), _MAX_CHUNK) or [0]:
        chunk = data[pos : pos + _MAX_CHUNK]
        crc = _mask_crc(crc32c(chunk))
        comp = compress_raw(chunk)
        if len(comp) < len(chunk):
            body, ctype = comp, 0x00
        else:
            body, ctype = chunk, 0x01
        out.append(ctype)
        out.extend(struct.pack("<I", len(body) + 4)[:3])
        out.extend(struct.pack("<I", crc))
        out.extend(body)
    return bytes(out)


def decompress_framed(src: bytes, max_bytes: int = 1 << 30) -> bytes | None:
    """Framed stream → bytes; None on malformation or any CRC mismatch.
    Skippable chunk types (0x80-0xFE) are skipped per spec; reserved
    unskippable types (0x02-0x7F) reject the stream."""
    if not src.startswith(_STREAM_ID):
        return None
    out = bytearray()
    i, end = len(_STREAM_ID), len(src)
    while i < end:
        if i + 4 > end:
            return None
        ctype = src[i]
        ln = src[i + 1] | (src[i + 2] << 8) | (src[i + 3] << 16)
        i += 4
        if i + ln > end:
            return None
        if ctype == 0xFF:  # repeated stream identifier (concatenation)
            if src[i : i + ln] != _STREAM_ID[4:]:
                return None
            i += ln
            continue
        if 0x80 <= ctype <= 0xFE:  # skippable padding/reserved
            i += ln
            continue
        if ctype not in (0x00, 0x01):
            return None  # reserved UNskippable
        if ln < 4:
            return None
        (crc,) = struct.unpack_from("<I", src, i)
        body = src[i + 4 : i + ln]
        i += ln
        if ctype == 0x00:
            chunk = decompress_raw(body, max_bytes=_MAX_CHUNK)
            if chunk is None:
                return None
        else:
            chunk = body
        if len(chunk) > _MAX_CHUNK or len(out) + len(chunk) > max_bytes:
            return None
        if _mask_crc(crc32c(chunk)) != crc:
            return None
        out += chunk
    return bytes(out)
