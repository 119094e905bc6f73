"""Deduplication queries over documents/embeddings (north-star surface;
the reference has no dedup — closest is file-grain skip, SURVEY M1).

Scale design: every near-dup strategy is candidate-generation via a
*blocking key* (LSH band / simhash band / fingerprint prefix / sign
bucket) + exact verification on candidates only. The only shuffles are
(a) the band-key self-join and (b) the pair dedup — both keyed on
high-cardinality hashes, skew-free. No O(n²) cross joins anywhere, so
the plan survives 100 TB: candidates grow with true-duplicate density,
not with corpus size squared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etly_spark.functions import hashing as H
from etly_spark.functions import text as T
from etly_spark.io.tables import load_table
from etly_spark.queries.catalog import query

_SQL_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"


@query(
    "dedup_exact",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS n_distinct_norm,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups_removed
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="Exact dedup: hash-groupBy on md5(text) (raw + normalized), "
    "per-source survivor accounting. One partial-aggregated shuffle.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(H.md5_hex(F.col("text"))).alias("n_distinct"),
            F.countDistinct(H.md5_hex(T.normalize_text("text"))).alias("n_distinct_norm"),
            (F.count(F.lit(1)) - F.countDistinct(H.md5_hex(F.col("text")))).alias(
                "n_dups_removed"
            ),
        )
        .orderBy("source")
    )


# MinHash parameters (shared by the Spark builder and the SQL oracle):
# 5-char shingles, 8 permutations, 2 bands x 4 rows => candidate P ≈ 1-(1-j^4)^2.
_MH_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(length(text)-4,1)),
                       i -> substr(text, i, 5))) AS sg
  FROM documents
), mh AS (
  SELECT doc_id, sg,
         list_transform(generate_series(0,7),
             j -> list_min(list_transform(sg, s -> md5(CAST(j AS VARCHAR) || ':' || s)))) AS sig
  FROM sh
), bands AS (
  SELECT doc_id, sg, b,
         md5(sig[b*4+1] || ',' || sig[b*4+2] || ',' || sig[b*4+3] || ',' || sig[b*4+4]) AS band_key
  FROM mh, generate_series(0,1) t(b)
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         any_value(a.sg) AS sga, any_value(b.sg) AS sgb
  FROM bands a JOIN bands b ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       len(list_intersect(sga, sgb))::DOUBLE
         / len(list_distinct(list_concat(sga, sgb))) AS jaccard
FROM cand
WHERE len(list_intersect(sga, sgb))::DOUBLE
        / len(list_distinct(list_concat(sga, sgb))) >= 0.5
ORDER BY doc_a, doc_b
"""


@query(
    "dedup_minhash_lsh",
    oracle=_MH_SQL,
    doc="MinHash+LSH near-dup: shingle → 8-perm minhash → 2x4 band keys → "
    "band self-join → exact shingle-jaccard verify >= 0.5. The band join "
    "is the scale trick: shuffle keyed on band hash, pairs ~ true dups.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.array_distinct(H.char_shingles(F.col("text"), 5)).alias("sg")
    )
    sig = sh.select("doc_id", "sg", H.minhash_signature(F.col("sg"), 8).alias("sig"))
    bands = sig.select(
        "doc_id", "sg", F.explode(H.lsh_bands(F.col("sig"), bands=2, rows=4)).alias("bk")
    ).select("doc_id", "sg", F.col("bk.band").alias("b"), F.col("bk.band_key").alias("band_key"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.first("a.sg").alias("sga"), F.first("b.sg").alias("sgb"))
    )
    jac = F.size(F.array_intersect("sga", "sgb")) / F.size(F.array_union("sga", "sgb"))
    return (
        cand.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


_SH_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), h AS (
  SELECT doc_id, list_transform(t, s -> CAST('0x' || substr(md5(s),1,12) AS BIGINT)) AS hs
  FROM tok
), sim AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(0,47), b ->
            CASE WHEN list_sum(list_transform(hs, x -> ((x >> b) & 1) * 2 - 1)) > 0
                 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS s
  FROM h
), bands AS (
  SELECT doc_id, s, b, (s >> (b*16)) & 65535 AS band_key
  FROM sim, generate_series(0,2) t(b)
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         any_value(a.s) AS sa, any_value(b.s) AS sb
  FROM bands a JOIN bands b ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= 3
ORDER BY doc_a, doc_b
"""


@query(
    "dedup_simhash",
    oracle=_SH_SQL,
    doc="SimHash near-dup: 48-bit token simhash, 3x16-bit band blocking, "
    "hamming <= 3 verify. Band join replaces all-pairs hamming scan.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sim = d.select("doc_id", H.simhash48(T.tokens("text")).alias("s"))
    bands = sim.select(
        "doc_id", "s", F.explode(H.simhash_bands16(F.col("s"), 3)).alias("bk")
    ).select("doc_id", "s", F.col("bk.band").alias("b"), F.col("bk.band_key").alias("band_key"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.first("a.s").alias("sa"), F.first("b.s").alias("sb"))
    )
    return (
        cand.select("doc_a", "doc_b", H.hamming48(F.col("sa"), F.col("sb")).alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_a", "doc_b")
    )


_NG_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKS} AS t,
         md5(substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16)) AS blk
  FROM documents
), ng AS (
  SELECT doc_id, blk,
         list_distinct(list_transform(generate_series(1, greatest(len(t)-1,1)),
                       i -> t[i] || ' ' || t[i+1])) AS g
  FROM tok
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.g, b.g))::DOUBLE
           / len(list_distinct(list_concat(a.g, b.g))) AS jaccard
  FROM ng a JOIN ng b ON a.blk = b.blk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM pairs
WHERE jaccard >= 0.3
ORDER BY doc_a, doc_b
"""


@query(
    "dedup_ngram_jaccard",
    oracle=_NG_SQL,
    doc="Word-bigram jaccard near-dup, blocked on the normalized 16-char "
    "prefix fingerprint (sorted-neighborhood-style candidate key).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = T.tokens("text")
    bigrams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1))),
            lambda i: F.concat(F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)),
        )
    )
    blk = F.md5(F.substring(T.normalize_text("text"), 1, 16).cast("binary"))
    ng = d.select("doc_id", bigrams.alias("g"), blk.alias("blk"))
    a = ng.alias("a")
    b = ng.alias("b")
    jac = F.size(F.array_intersect("a.g", "b.g")) / F.size(F.array_union("a.g", "b.g"))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.3)
        .orderBy("doc_a", "doc_b")
    )


# Sign-bucket blocking on the first 6 embedding components (mean-zero
# data → ~64 balanced buckets), then exact cosine on candidates. The
# float comparisons (x > 0) and the left-fold dot product are
# bit-deterministic in both engines.
_EC_SQL = """
WITH s AS (
  SELECT vec_id, embedding,
         (CASE WHEN embedding[1] > 0 THEN 32 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 16 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 8 ELSE 0 END
        + CASE WHEN embedding[4] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[5] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[6] > 0 THEN 1 ELSE 0 END) AS bucket
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_reduce(list_transform(generate_series(1, len(a.embedding)),
             i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x,y) -> x+y)
         / (sqrt(list_reduce(list_transform(generate_series(1, len(a.embedding)),
               i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE), (x,y) -> x+y))
          * sqrt(list_reduce(list_transform(generate_series(1, len(b.embedding)),
               i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), (x,y) -> x+y)))
           AS cos_sim
  FROM s a JOIN s b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos_sim, 6) AS cos_sim
FROM pairs WHERE cos_sim >= 0.4
ORDER BY vec_a, vec_b
"""


@query(
    "dedup_embedding_cosine",
    oracle=_EC_SQL,
    doc="Embedding-cosine near-dup: sign-bucket blocking (6 components → "
    "64 buckets) + exact cosine >= 0.4 on within-bucket pairs only.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    bucket = sum(
        F.when(F.element_at("embedding", i + 1) > 0, F.lit(1 << (5 - i))).otherwise(F.lit(0))
        for i in range(6)
    )
    s = e.select("vec_id", "embedding", bucket.alias("bucket"))
    a = s.alias("a")
    b = s.alias("b")
    cos = H.cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= 0.4)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )
