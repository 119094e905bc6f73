"""Object-stream compression registry for the ingest/egress paths.

One table answers three questions for a storage URL:
  - is it compressed, and with what codec?
  - can the JVM line reader ingest it directly (Hadoop ships the
    codec), or must it take the Python binaryFile route?
  - how do its bytes decompress / compress in a Python executor task?

JVM-native: ``.gz`` / ``.bz2`` / ``.deflate`` — Hadoop codecs bundled
with pyspark handle these inside ``spark.read.text`` (bz2 even splits).

Python-route: ``.xz``/``.lzma`` (stdlib lzma; no Hadoop codec),
``.lz4`` (the interoperable lz4 FRAME format — Hadoop's Lz4Codec is a
different, hadoop-only framing, so JVM ingest of real lz4 files is
wrong even where the extension is claimed), ``.sz``/``.snappy``
(snappy framing format; Hadoop's SnappyCodec needs native libs pip
pyspark doesn't ship, and is hadoop-framed anyway).

``.zst``/``.zstd`` (r9): bound to the PLATFORM libzstd via ctypes
(operators/zstd.py) — the reference implementation, never a
from-memory FSE reimplementation (the spec-table honesty rule,
OPERATORS.md). On hosts without libzstd the codec stays gated and
ingest raises the honest refusal; executors probe per Python worker.

Reference parity: the reference decompresses gzip only
(transfer_service.go:718-737); the wider table is SURVEY §2.3
training-data scope (real corpora ship as .jsonl.{gz,xz,lz4,zst}).
"""

from __future__ import annotations

import bz2 as _bz2
import gzip as _gzip
import lzma as _lzma
import zlib as _zlib

_JVM_EXTS = (".gz", ".bz2", ".deflate")
_GATED_EXTS = (".zst", ".zstd")


def _lz4_decompress(data: bytes) -> bytes:
    from etly_spark.operators import lz4

    out = lz4.decompress_frame(data)
    if out is None:
        raise ValueError("malformed lz4 frame")
    return out


def _snappy_decompress(data: bytes) -> bytes:
    from etly_spark.operators import snappy

    out = snappy.decompress_framed(data)
    if out is None:
        raise ValueError("malformed snappy framed stream")
    return out


def _lz4_compress(data: bytes) -> bytes:
    from etly_spark.operators import lz4

    return lz4.compress_frame(data)


def _snappy_compress(data: bytes) -> bytes:
    from etly_spark.operators import snappy

    return snappy.compress_framed(data)


def _zstd_decompress(data: bytes) -> bytes:
    from etly_spark.operators import zstd

    return zstd.decompress(data)  # NotImplementedError when no libzstd


def _zstd_compress(data: bytes) -> bytes:
    from etly_spark.operators import zstd

    return zstd.compress(data)


# ext -> (decompress, compress) over whole-object bytes
_PY_CODECS = {
    ".gz": (_gzip.decompress, _gzip.compress),
    ".bz2": (_bz2.decompress, _bz2.compress),
    ".deflate": (_zlib.decompress, _zlib.compress),
    ".xz": (_lzma.decompress, _lzma.compress),
    ".lzma": (_lzma.decompress, _lzma.compress),
    ".lz4": (_lz4_decompress, _lz4_compress),
    ".sz": (_snappy_decompress, _snappy_compress),
    ".snappy": (_snappy_decompress, _snappy_compress),
    ".zst": (_zstd_decompress, _zstd_compress),
    ".zstd": (_zstd_decompress, _zstd_compress),
}

# sink `Target.Compression` name -> (extension, jvm codec option or None)
SINK_CODECS = {
    "gzip": (".gz", "gzip"),
    "bzip2": (".bz2", "bzip2"),
    "deflate": (".deflate", "deflate"),
    "xz": (".xz", None),
    "lz4": (".lz4", None),
    "snappy": (".sz", None),
    "zstd": (".zst", None),
}

# codecs whose streams concatenate by spec (gzip members, multi-stream
# bz2/xz, lz4 frames, snappy framed chunks, zstd frames). Raw zlib does
# NOT: a reader stops at the first stream's end-of-block, silently
# dropping everything after — so multi-part deflate rolls must be
# compressed as ONE stream over the whole roll, never per-part-then-
# concat.
CONCATENATABLE = frozenset({"gzip", "bzip2", "xz", "lz4", "snappy", "zstd"})


def codec_ext(url: str) -> str | None:
    """The recognized compression extension of ``url``, else None."""
    low = url.lower()
    for ext in _PY_CODECS:
        if low.endswith(ext):
            return ext
    return None


def is_gated(url: str) -> bool:
    """True when the url's codec cannot run on THIS host: zstd is gated
    only where no libzstd loads (operators/zstd.py binds the system
    library — the honesty rule forbids a from-memory FSE decoder)."""
    if not any(url.lower().endswith(e) for e in _GATED_EXTS):
        return False
    from etly_spark.operators import zstd

    return not zstd.available()


def jvm_line_readable(url: str) -> bool:
    """True when spark.read.text can ingest the object directly (plain
    or a Hadoop-bundled codec)."""
    ext = codec_ext(url)
    return ext is None or ext in _JVM_EXTS


def raise_if_gated(url: str) -> None:
    if is_gated(url):
        raise NotImplementedError(
            "zstd ingest is gated on this host: no libzstd to bind "
            "(operators/zstd.py loads the system library; the RFC 8878 "
            "FSE tables are never reimplemented from memory). Install "
            f"libzstd or recompress {url!r} as .gz/.bz2/.xz/.lz4/.sz."
        )


def decompress_object(data: bytes, url: str) -> bytes:
    """Whole-object decompression by extension; identity for plain
    objects. Raises on malformed input (fault isolation attributes the
    error to THIS file — probe_unreadable runs these same codecs)."""
    raise_if_gated(url)
    ext = codec_ext(url)
    if ext is None:
        return data
    return _PY_CODECS[ext][0](data)


def compress_object(data: bytes, compression: str) -> bytes:
    """Whole-object compression by sink codec name (SINK_CODECS key)."""
    ext, _ = SINK_CODECS[compression.lower()]
    return _PY_CODECS[ext][1](data)
