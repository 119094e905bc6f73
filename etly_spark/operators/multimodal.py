"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched pandas (mapInPandas).

The reference moves opaque bytes (gzipped ndjson blobs) without looking
inside them (transfer_object_service.go:89-109); here the binary column
is a first-class value with a decode stage. Image/audio libs are not in
this container, so the *codec* step is stubbed: `decode_real` raises
NotImplementedError unless PIL is importable, and the default pipeline
uses `decode_fake` — a deterministic byte-level featurizer — so the
Spark-side plumbing (schema, Arrow batch shape, partition-parallel
mapInPandas, no shuffle) is real and oracle-checkable end-to-end.

Scale: mapInPandas streams Arrow batches per input partition — no
shuffle, no driver collection; at 100 TB the decode stage is a pure
map with per-executor codec parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

try:  # real codec path — not available in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("byte_sum", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("resize_scale", DoubleType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal record: opaque binary payload + typed metadata.

    The payload here is the utf-8 text bytes (the container has no media
    fixtures); schema-wise it is exactly an image/audio blob column.
    """
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(F.col(text_col).cast("binary")).alias("n_bytes"),
            (F.lit(16) + F.col("doc_id") % 32).alias("height"),
            (F.lit(16) + F.octet_length(F.col(text_col).cast("binary")) % 64).alias("width"),
            (F.lit(1) + F.col("doc_id") % 8).alias("n_frames"),
        ),
    )


def decode_real(payload: bytes) -> dict:
    """Full pixel decode — requires PIL, absent here by design. Header
    metadata (format/dimensions) does NOT need PIL: `parse_image_header`
    below reads real bytes for BMP/PPM/PNG/GIF."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image codec not available in this container; use decode_fake "
            "for features or parse_image_header for real header metadata"
        )
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Pure-Python header parse → (format, width, height), or None if the
    bytes are not a recognized image.

    Real decode of real bytes, no codec library: these four container
    formats put dimensions at fixed/trivially-scanned offsets (BMP
    BITMAPINFOHEADER, PNG IHDR, GIF logical screen descriptor, PPM/PGM
    ASCII preamble). Rich formats (JPEG/WebP/video) stay behind the PIL
    gate in `decode_real`.
    """
    import struct

    if payload is None:
        return None
    if len(payload) >= 26 and payload[:2] == b"BM":
        # dispatch on the DIB header size @14: BITMAPCOREHEADER (12)
        # carries uint16 dims, BITMAPINFOHEADER and its v4/v5 extensions
        # (>=40) carry int32 dims (height may be negative = top-down)
        (dib,) = struct.unpack_from("<I", payload, 14)
        if dib == 12:
            w, h = struct.unpack_from("<HH", payload, 18)
            return ("bmp", int(w), int(h))
        if dib >= 40:
            w, h = struct.unpack_from("<ii", payload, 18)
            return ("bmp", int(w), abs(int(h)))
        return None  # unknown DIB variant: don't emit garbage dims
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is always the first chunk: uint32 width @16, height @20 (BE)
        w, h = struct.unpack_from(">II", payload, 16)
        return ("png", int(w), int(h))
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        # logical screen descriptor: uint16 width @6, height @8 (LE)
        w, h = struct.unpack_from("<HH", payload, 6)
        return ("gif", int(w), int(h))
    if len(payload) >= 2 and payload[:1] == b"P" and payload[1:2] in b"123456":
        # Netpbm (PPM/PGM/PBM): ASCII "P6 <w> <h> <maxval>" with
        # whitespace/comments between tokens
        tokens: list[int] = []
        i = 2
        while len(tokens) < 2 and i < min(len(payload), 4096):
            c = payload[i : i + 1]
            if c == b"#":  # comment to end of line
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
        if len(tokens) == 2:
            return ("ppm", tokens[0], tokens[1])
    return None


IMAGE_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def decode_image_headers(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL header decode: (doc_id, payload) → format/dims.

    Same plumbing contract as `decode_features` (pure map, pruned input,
    one Arrow batch resident); unrecognized payloads yield nulls rather
    than failing the batch — corrupt media is data, not an exception,
    at 100 TB.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            parsed = [parse_image_header(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "format": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int64"
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int64"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, IMAGE_HEADER_SCHEMA)


def _decode_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic fake decode of one Arrow batch (vectorized numpy)."""
    import numpy as np
    import pandas as pd

    payloads = pdf["payload"]
    byte_len = payloads.map(len).astype("int64")
    byte_sum = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())).astype(
        "int64"
    )
    # RAW doubles — rounding happens Spark-side with F.round (HALF_UP,
    # matching SQL round). numpy's .round is half-to-EVEN: on an exact
    # 6-dp half-boundary (one row per ~10^5 at sf1.0 hit 92.6640625)
    # the two rules disagree and the cross-engine hash gate fails.
    mean_byte = byte_sum / byte_len.clip(lower=1)
    width = (16 + byte_len % 64).astype("int64")
    height = (16 + pdf["doc_id"] % 32).astype("int64")
    resize_scale = 32.0 / np.maximum(width, height)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "byte_len": byte_len,
            "byte_sum": byte_sum,
            "mean_byte": mean_byte,
            "width": width,
            "height": height,
            "n_frames": (1 + pdf["doc_id"] % 8).astype("int64"),
            "resize_scale": resize_scale,
        }
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract: (doc_id, payload) → features.

    Pure map over partitions — Catalyst prunes input columns to the two
    used, and the pandas iterator keeps peak memory to one Arrow batch.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return df.select("doc_id", "payload").mapInPandas(run, DECODED_SCHEMA)
