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
    """Distinct k-char shingles (SQL twin: list_distinct of substr windows).

    Note: higher-order-function lambdas evaluate interpreted in Spark —
    fine for per-row use, but bulk sketch builds should use the
    explode(sequence) + codegen'd substring formulation instead (see
    queries.dedup.dedup_minhash_lsh)."""
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

    Per-row convenience form (interpreted lambdas). The bulk path is the
    tabulation variant in queries.dedup.dedup_minhash_lsh: ONE md5 per
    shingle, permutations as a+j*b integer arithmetic, built via explode
    + hash aggregate — fully codegen'd, shuffle carries one row per doc.
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


def lsh_bands(signature: Column, bands: int = 2, rows: int = 4) -> Column:
    """Band the signature into `bands` structs (band_idx, band_key): key =
    md5 of the band's `rows` comma-joined sig elements, carried as the
    16-byte BINARY digest (r15, guide §2.3 narrower types): band keys
    are only ever compared for equality, and unhex(md5_hex) is a
    bijection, so buckets are bit-identical while the staged band
    table and the band self-join's shuffled key shrink from a 32-char
    string to 16 bytes. Docs sharing any (band_idx, band_key) become
    join candidates — the shuffle key that replaces the O(n²) cross
    join. Unrolled Python-side (band count is a small constant), so
    the whole thing is one codegen'd expression."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.unhex(
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at(signature, b * rows + r + 1)
                                for r in range(rows)
                            ],
                        ).cast("binary")
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )


def token_hash(tok: Column, hex_chars: int = 8) -> Column:
    """Integer hash of a token: first `hex_chars` md5 hex chars, base-16.
    conv() keeps it non-negative — portable via the same digits in SQL
    (`CAST('0x' || substr(md5(t),1,n) AS BIGINT)`)."""
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, hex_chars), 16, 10).cast("bigint")


def simhash48(tokens_col: Column) -> Column:
    """48-bit SimHash over a token array (bits 0..47 of a BIGINT — stays
    clear of the sign bit in both engines).

    For each bit b: sum over tokens of (+1 if bit set else -1); result bit
    is 1 when the (integer, order-independent) sum is positive. The bit
    loop is unrolled Python-side into one codegen'd expression; the only
    per-row cost is |tokens|·48 integer ops after a single md5 per token —
    embarrassingly parallel, no shuffle.
    """
    hashes = F.transform(tokens_col, lambda t: token_hash(t, 12))
    bit_terms = [
        F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("bigint"),
                lambda s, h: s + (h.bitwiseAND(F.lit(1 << b)) != 0).cast("bigint") * 2 - 1,
            )
            > 0,
            F.lit(1 << b).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for b in range(48)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def simhash_bands16(sim: Column, bands: int = 3) -> Column:
    """Split a 48-bit simhash into `bands` 16-bit band keys as structs
    (band_idx, band_key); candidate pairs share at least one band."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(sim, b * 16).bitwiseAND(F.lit(65535)).alias("band_key"),
            )
            for b in range(bands)
        ]
    )


def hamming48(a: Column, b: Column) -> Column:
    """Hamming distance between two 48-bit simhashes."""
    return F.bit_count(a.bitwiseXOR(b))


def dot_product(a: Column, b: Column) -> Column:
    """Deterministic double dot product via array fold (see module note).

    Parity twin only: Spark interprets HOF lambdas element-by-element,
    so the hot scoring paths use the vectorized numpy kernels in
    ``functions.vector`` instead (5-10x faster, same bits after the
    catalog's 6-dp rounding — gate-verified)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
