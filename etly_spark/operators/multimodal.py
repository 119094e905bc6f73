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
    """Real image decode — requires PIL, absent here by design."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image codec not available in this container; use decode_fake"
        )
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def _decode_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic fake decode of one Arrow batch (vectorized numpy)."""
    import numpy as np
    import pandas as pd

    payloads = pdf["payload"]
    byte_len = payloads.map(len).astype("int64")
    byte_sum = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())).astype(
        "int64"
    )
    mean_byte = (byte_sum / byte_len.clip(lower=1)).round(6)
    width = (16 + byte_len % 64).astype("int64")
    height = (16 + pdf["doc_id"] % 32).astype("int64")
    resize_scale = (32.0 / np.maximum(width, height)).round(6)
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
