"""Scale stress for the dedup/LSH path: synthesize an N-times corpus
from sf0.1 (per-copy consonant-rotation keeps dup DENSITY constant while
corpus size grows — copies are NOT near-dups of each other), then
measure what the 100 TB design claims:

- band-bucket distribution: the hot-bucket cap (64) must bound the
  band self-join's quadratic term no matter how large the corpus gets;
- candidate pairs must grow ~linearly with corpus size (dup density),
  not quadratically;
- wall-clock for the full minhash→LSH→verify and clustering queries.

Usage: python tools/stress_dedup.py [copies] [workdir]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.functions import hashing as H  # noqa: E402
from etly_spark.queries import REGISTRY  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
CAP = 64  # mirrored in the dedup_minhash_lsh oracle

# 10 deterministic consonant/vowel rotations — each copy's shingles are
# almost entirely different from every other copy's, so the only
# near-dup pairs are the ones sf0.1 already had, once per copy.
_ALPHA = "etaoinshrdlcumwfgypbvk"


def _rotation(i: int) -> str:
    return _ALPHA[i:] + _ALPHA[:i]


def build_corpus(spark, copies: int, out_dir: str) -> int:
    d = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n = d.count()
    parts = []
    for i in range(copies):
        parts.append(
            d.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                F.translate(F.col("text"), _ALPHA, _rotation(i)).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return n * copies


def bucket_stats(spark, sf_dir: str) -> dict:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ex = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.greatest(F.length("text") - 4, F.lit(1)))).alias("i"),
        "text",
    ).select("doc_id", F.substring("text", F.col("i"), 5).alias("s"))
    dig = F.md5(F.col("s").cast("binary"))
    perms = ex.select(
        "doc_id",
        F.conv(F.substring(dig, 1, 14), 16, 10).cast("bigint").alias("a"),
        F.conv(F.substring(dig, 17, 14), 16, 10).cast("bigint").alias("b"),
    )
    sig = perms.groupBy("doc_id").agg(
        F.array(*[F.min(F.col("a") + j * F.col("b")) for j in range(8)]).alias("sig")
    )
    bands = sig.select(
        "doc_id", F.explode(H.lsh_bands(F.col("sig"), bands=2, rows=4)).alias("bk")
    ).select(F.col("bk.band").alias("b"), F.col("bk.band_key").alias("band_key"))
    dist = bands.groupBy("b", "band_key").count()
    row = dist.agg(
        F.max("count").alias("max_bucket"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(
            F.when(F.col("count") <= CAP, F.col("count") * (F.col("count") - 1) / 2).otherwise(0)
        ).alias("capped_pairs"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("uncapped_pairs"),
    ).collect()[0]
    return {k: float(v) for k, v in row.asDict().items()}


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/etly_stress_sf1"
    spark = get_spark("dedup-stress")

    t0 = time.monotonic()
    n_docs = build_corpus(spark, copies, work)
    t_build = time.monotonic() - t0

    stats = bucket_stats(spark, work)

    t0 = time.monotonic()
    pairs = REGISTRY["dedup_minhash_lsh"].spark(spark, work)
    n_pairs = pairs.count()
    t_lsh = time.monotonic() - t0

    t0 = time.monotonic()
    clusters = REGISTRY["dedup_clusters"].spark(spark, work)
    n_clusters = clusters.count()
    t_clusters = time.monotonic() - t0

    base_pairs = REGISTRY["dedup_minhash_lsh"].spark(spark, BASE).count()

    out = {
        "copies": copies,
        "n_docs": n_docs,
        "bucket": stats,
        "cap": CAP,
        "n_verified_pairs": n_pairs,
        "base_verified_pairs_sf0.1": base_pairs,
        "pairs_growth_vs_linear": round(n_pairs / max(base_pairs * copies, 1), 3),
        "sec_minhash_lsh": round(t_lsh, 2),
        "sec_clusters": round(t_clusters, 2),
        "sec_build_corpus": round(t_build, 2),
        "quadratic_work_avoided": round(
            stats["uncapped_pairs"] / max(stats["capped_pairs"], 1), 1
        ),
        "n_clusters": n_clusters,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
