"""DataFrame-level sketch builders — the bulk (codegen'd) forms behind
the per-row column expressions in ``functions.hashing``.

``minhash_signatures`` is the canonical sketch-index builder: one row
per document, consumed by batch LSH (queries/dedup.py), incremental
ingest (queries.dedup.lsh_incremental_pairs), and the streaming
index maintainer
(streaming/dedup.py). Keeping it here means every consumer computes
bit-identical signatures — the property that lets a batch-built index
serve streamed batches and vice versa.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_signatures(
    d: DataFrame, id_col: str = "doc_id", text_col: str = "text", perms: int = 8
) -> DataFrame:
    """(id, sig[perms]) minhash sketch per document.

    Explode-shingle formulation (higher-order-function lambdas run
    interpreted in Spark): shingling is explode(sequence) + a codegen'd
    substring, the permutation hashes a flat codegen'd projection
    (tabulation: permutation j of shingle s = a + j*b where (a, b) are
    56-bit halves of ONE md5(s)), and ONE hash aggregate builds the
    signature (min per permutation — duplicates can't change a min, so
    no distinct needed). The shuffle carries one row per doc. Works on
    any static DataFrame, including a foreachBatch micro-batch.
    """
    ex = d.select(
        id_col,
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - 4, F.lit(1)))
        ).alias("i"),
        text_col,
    ).select(id_col, F.substring(text_col, F.col("i"), 5).alias("s"))
    digest = F.md5(F.col("s").cast("binary"))
    p = ex.select(
        id_col,
        F.conv(F.substring(digest, 1, 14), 16, 10).cast("bigint").alias("a"),
        F.conv(F.substring(digest, 17, 14), 16, 10).cast("bigint").alias("b"),
    )
    return p.groupBy(id_col).agg(
        F.array(*[F.min(F.col("a") + j * F.col("b")) for j in range(perms)]).alias("sig"),
    )
