"""zstd (RFC 8878) ingest/egress via the platform's real libzstd,
ctypes-bound — no from-memory spec tables.

The repo's spec-table honesty rule (OPERATORS.md) gates blind
reimplementation of zstd's predefined FSE distributions: a
self-consistent-but-wrong table round-trips its own twin yet silently
mis-decodes real files. Binding the system library sidesteps the rule
entirely — libzstd ships with virtually every Linux distro (and Spark
itself bundles zstd-jni for parquet/shuffle), so the decode path is the
reference implementation, validated by construction. When no library
loads, ``available()`` is False and io/compress.py keeps the honest
refusal; nothing is guessed.

Decompression uses the streaming API (ZSTD_decompressStream) so
unknown-content-size frames (streaming writers), multi-frame
concatenations, and skippable frames all decode; truncated or
trailing-garbage inputs raise ValueError (fault isolation contract:
codec errors attribute to the file). Compression is one-shot
ZSTD_compress at level 3 (zstd's default). Frames concatenate by spec,
so the sink's per-part-member finalization applies (io/compress
CONCATENATABLE).

Reference parity: none (the reference decompresses gzip only,
transfer_service.go:718-737); SURVEY §2.3 training-data scope — real
crawl corpora increasingly ship ``.jsonl.zst``.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from ctypes import POINTER, Structure, byref, c_char_p, c_int, c_size_t, c_uint, c_void_p

__all__ = ["available", "decompress", "compress", "version"]

_LIB = None
_TRIED = False


class _Buf(Structure):
    # layout shared by ZSTD_inBuffer and ZSTD_outBuffer
    _fields_ = [("ptr", c_void_p), ("size", c_size_t), ("pos", c_size_t)]


def _configure(lib) -> None:
    lib.ZSTD_versionNumber.restype = c_uint
    lib.ZSTD_versionNumber.argtypes = []
    lib.ZSTD_isError.restype = c_uint
    lib.ZSTD_isError.argtypes = [c_size_t]
    lib.ZSTD_getErrorName.restype = c_char_p
    lib.ZSTD_getErrorName.argtypes = [c_size_t]
    lib.ZSTD_createDCtx.restype = c_void_p
    lib.ZSTD_createDCtx.argtypes = []
    lib.ZSTD_freeDCtx.restype = c_size_t
    lib.ZSTD_freeDCtx.argtypes = [c_void_p]
    lib.ZSTD_decompressStream.restype = c_size_t
    lib.ZSTD_decompressStream.argtypes = [c_void_p, POINTER(_Buf), POINTER(_Buf)]
    lib.ZSTD_compressBound.restype = c_size_t
    lib.ZSTD_compressBound.argtypes = [c_size_t]
    lib.ZSTD_compress.restype = c_size_t
    lib.ZSTD_compress.argtypes = [c_void_p, c_size_t, c_void_p, c_size_t, c_int]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("zstd")
    if found:
        names.append(found)
    names += ["libzstd.so.1", "libzstd.so", "libzstd.dylib", "libzstd.dll"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.ZSTD_versionNumber.restype = c_uint
            # streaming decompress API is stable from v1.4.0
            if lib.ZSTD_versionNumber() >= 10400:
                _configure(lib)
                _LIB = lib
                break
        except (OSError, AttributeError):
            continue
    return _LIB


def available() -> bool:
    """True when a usable libzstd loaded on THIS process (executors
    re-probe independently — the module loads per Python worker)."""
    return _load() is not None


def version() -> int | None:
    lib = _load()
    return int(lib.ZSTD_versionNumber()) if lib is not None else None


def _check(lib, code: int) -> int:
    if lib.ZSTD_isError(code):
        raise ValueError(
            "zstd: " + (lib.ZSTD_getErrorName(code) or b"?").decode("ascii", "replace")
        )
    return code


def decompress(data: bytes) -> bytes:
    """Decode one-or-more concatenated zstd frames (streaming API —
    unknown content sizes and skippable frames included). Raises
    ValueError on malformed/truncated input, NotImplementedError when
    no libzstd is present (the io/compress gate text)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "zstd ingest is gated: no libzstd on this host to bind "
            "(operators/zstd.py loads the system library; the RFC 8878 "
            "FSE tables are never reimplemented from memory). Install "
            "libzstd or recompress as .gz/.bz2/.xz/.lz4/.sz."
        )
    if not data:
        raise ValueError("zstd: empty input")
    dctx = lib.ZSTD_createDCtx()
    if not dctx:
        raise MemoryError("ZSTD_createDCtx failed")
    try:
        src = ctypes.create_string_buffer(data, len(data))
        inb = _Buf(ctypes.cast(src, c_void_p), len(data), 0)
        chunk = 1 << 17
        dst = ctypes.create_string_buffer(chunk)
        outb = _Buf(ctypes.cast(dst, c_void_p), chunk, 0)
        chunks: list[bytes] = []
        ret = 0
        while True:
            before = inb.pos
            outb.pos = 0
            ret = _check(lib, lib.ZSTD_decompressStream(dctx, byref(outb), byref(inb)))
            if outb.pos:
                chunks.append(dst.raw[: outb.pos])
            if inb.pos >= inb.size:
                # Input consumed, but ret > 0 with a FULL output buffer
                # means the decoder still holds flushable data for this
                # frame (the libzstd contract) — keep draining with the
                # empty input remainder; only a call that leaves output
                # space unused has truly flushed everything. A TRUNCATED
                # frame aligned on the buffer boundary cannot loop here:
                # the drain call flushes nothing (outb.pos == 0 < chunk),
                # falls through to break, and the ret != 0 check below
                # raises 'truncated frame' (pinned by
                # test_zstd_drain_boundary_truncation_message and
                # test_zstd_truncation_after_exact_boundary_complete_frame
                # — ADVICE r10/r11).
                if ret != 0 and outb.pos == chunk:
                    continue
                break
            if inb.pos == before and outb.pos == 0:
                raise ValueError("zstd: no progress (corrupt stream)")
        if ret != 0:
            raise ValueError("zstd: truncated frame (stream ends mid-frame)")
        return b"".join(chunks)
    finally:
        lib.ZSTD_freeDCtx(dctx)


def compress(data: bytes, level: int = 3) -> bytes:
    """One-shot zstd frame at ``level`` (3 = the zstd CLI default)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError("zstd egress is gated: no libzstd on this host")
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(int(bound))
    src = ctypes.create_string_buffer(data, len(data)) if data else None
    ret = _check(
        lib,
        lib.ZSTD_compress(
            ctypes.cast(dst, c_void_p),
            bound,
            ctypes.cast(src, c_void_p) if src is not None else None,
            len(data),
            level,
        ),
    )
    return dst.raw[:ret]
