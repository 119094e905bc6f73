"""Synthesize an N-times corpus (~sf1.0 from sf0.1) for full-catalog
scale stress, FK-consistent across all ten tables.

Each copy shifts every entity key by i*10_000_000 — the SAME offset for a
key wherever it appears, so intra-copy joins (orders.o_custkey →
customer.c_custkey, lineitem.l_orderkey → orders.o_orderkey, ...) stay
valid and cross-copy joins never match. region/nation keep one copy
(TPC-H fixes them; nationkey/regionkey are never shifted, so FKs into
them hold from every copy).

Duplicate-density control (the point of a dedup-stress corpus): copies
must not be near-dups of each other, or pair counts grow quadratically
by construction rather than by data. documents rotates its text through
a consonant substitution per copy (different shingles); embeddings
circularly shifts its 64 dims per copy (cosine between a vector and its
rotation is ~random). events keeps timestamps, so time-window density
grows N× — what a real N× traffic scale-up does.

DENSITY GUARANTEE HOLDS TO ~20 COPIES ONLY: the consonant rotation is
periodic in the consonant-set size, so distant copies collide (the 30×
run measured candidate pairs growing 34× for 3× docs once copies
wrapped — see STRESS.md). Use ≤ 20 copies for density-constant dedup
stress; beyond that the corpus deliberately measures rising density.

Usage: python tools/build_scaled_corpus.py [copies] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.io.tables import TABLES, load_table  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
OFFSET = 10_000_000
_ALPHA = "etaoinshrdlcumwfgypbvk"

KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = {"region", "nation"}


def _copy_of(df, table: str, i: int):
    p = df
    for k in KEY_SHIFTS[table]:
        p = p.withColumn(k, F.col(k) + F.lit(i * OFFSET))
    if table == "documents" and i:
        p = p.withColumn("text", F.translate("text", _ALPHA, _ALPHA[i:] + _ALPHA[:i]))
    if table == "embeddings" and i:
        # circular dim shift: de-correlates copies without changing norms
        p = p.withColumn(
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), i + 1, 64 - i),
                F.slice(F.col("embedding"), 1, i),
            ),
        )
    return p


def build(spark, copies: int, out_dir: str) -> dict:
    counts = {}
    for t in TABLES:
        df = load_table(spark, BASE, t)
        if t in SINGLE_COPY:
            out = df
        else:
            out = _copy_of(df, t, 0)
            for i in range(1, copies):
                out = out.unionByName(_copy_of(df, t, i))
        n_parts = 1 if t in SINGLE_COPY else 32
        dest = os.path.join(out_dir, f"{t}.parquet")
        out.repartition(n_parts).write.mode("overwrite").parquet(dest)
        counts[t] = spark.read.parquet(dest).count()
    return counts


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/etly_sf1.0_scaled"
    spark = get_spark("build-scaled-corpus")
    t0 = time.monotonic()
    counts = build(spark, copies, out_dir)
    print(
        json.dumps(
            {
                "copies": copies,
                "out_dir": out_dir,
                "sec_build": round(time.monotonic() - t0, 1),
                "rows": counts,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
