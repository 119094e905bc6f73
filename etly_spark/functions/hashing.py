"""Deterministic, engine-portable hash/sketch column expressions.

Parity strategy: md5 hex is the shared deterministic hash (identical
output in Spark and DuckDB for identical input bytes), so every sketch
built from it — minhash signatures, LSH band keys, simhash bits,
hyperplane signs — hash-matches the SQL oracle bit-for-bit. FNV-1 (the
reference's file bucketing hash, util.go:131-139) lives in
etly_spark.templates as driver-side Python; these are the data-plane
equivalents.

Order-sensitivity note: dot products use array lambdas
(zip_with + aggregate), NOT groupBy sums — array folds evaluate
left-to-right in both engines, so float results are bit-identical, while
shuffle-order partial aggregation is not.

All pure Column expressions: whole-stage codegen, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def char_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-char shingles (SQL twin: list_distinct of substr windows)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
            lambda i: F.substring(c, i, k),
        )
    )


def minhash_signature(shingles: Column, k: int = 8) -> Column:
    """k-permutation MinHash: permutation j = md5(j || ':' || shingle);
    the signature element is the lexicographic min hex digest.

    Scale: O(|shingles|·k) md5 calls per row, all JVM-side; at 100 TB this
    is embarrassingly parallel with no shuffle.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(
            F.transform(
                shingles,
                lambda s: F.md5(F.concat(j.cast("string"), F.lit(":"), s).cast("binary")),
            )
        ),
    )


def lsh_bands(signature: Column, bands: int = 4, rows: int = 2) -> Column:
    """Band the signature: band b key = md5 of its `rows` concatenated
    sig elements. Docs sharing any (band, key) become join candidates —
    the shuffle key that replaces the cross join."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat_ws(
                ",",
                *[
                    F.element_at(signature, (b * rows + r + 1).cast("int"))
                    if hasattr(b, "cast")
                    else F.element_at(signature, b * rows + r + 1)
                    for r in range(rows)
                ],
            ).cast("binary")
        ),
    )


def token_hash32(tok: Column) -> Column:
    """32-bit integer hash of a token: first 8 md5 hex chars, base-16.
    conv() keeps it in [0, 2^32) — portable via the same digits in SQL."""
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 8), 16, 10).cast("bigint")


def simhash32(tokens_col: Column) -> Column:
    """32-bit SimHash over a token array.

    For each bit b: sum over tokens of (+1 if bit set else -1); result bit
    is 1 when the (integer, order-independent) sum is positive.
    """
    hashes = F.transform(tokens_col, token_hash32)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc
        + F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("bigint"),
                lambda s, h: s + F.shiftright(h, b.cast("int")).bitwiseAND(F.lit(1)) * 2 - 1,
            )
            > 0,
            F.shiftleft(F.lit(1).cast("bigint"), b.cast("int")),
        ).otherwise(F.lit(0).cast("bigint")),
    )


def dot_product(a: Column, b: Column) -> Column:
    """Deterministic double dot product via array fold (see module note)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
