"""sim_ann_methods at scaled corpora (r15 — closes the r14 verdict's
ETLY_ANN_PERSIST_TOPK item).

The knob is RETIRED: since r15 every method's Q*k output is
materialized to per-invocation parquet during construction, so each
scorer subtree executes exactly once regardless of corpus size — the
persist-vs-recompute dilemma the knob toggled no longer exists (the
materialized output is Q*k rows on the stage FS: no InMemoryRelation
barrier, no second corpus scan per consumer). This probe measures the
materialized implementation at scaled corpora to pin the claim with
numbers instead of the old knob's reasoning.

Method: scale ONLY the embeddings table (sim_ann_methods' sole input)
by unioning shifted copies (vec_id + i*10_000_000, dims circularly
rotated by i — the build_scaled_corpus embedding rule, so cross-copy
cosines are ~random), then time the full catalog row after one untimed
warmup run (stage artifacts build once; every timed run re-runs every
scorer and rewrites the per-invocation materialization). min-of-2.

Usage: python tools/stress_persist_ab.py [copies ...]   (default: 10 150)
Writes one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/etly_persist_ab"


def build_scaled_embeddings(spark, copies: int) -> str:
    out = os.path.join(ROOT, f"x{copies}")
    dest = os.path.join(out, "embeddings.parquet")
    if os.path.exists(dest):
        return out
    os.makedirs(out, exist_ok=True)
    base = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    parts = []
    for i in range(copies):
        rot = i % 64
        emb = (
            F.col("embedding")
            if rot == 0
            else F.concat(
                F.slice("embedding", rot + 1, 64 - rot),
                F.slice("embedding", 1, rot),
            )
        )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                emb.alias("embedding"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    tmp = dest + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, dest)
    return out


def run_once(spark, sf_dir: str) -> float:
    spark.catalog.clearCache()
    from etly_spark.queries import REGISTRY

    t0 = time.monotonic()
    REGISTRY["sim_ann_methods"].spark(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    return round(time.monotonic() - t0, 2)


def main() -> int:
    copies_list = [int(a) for a in sys.argv[1:]] or [10, 150]
    spark = get_spark("stress-persist-ab")
    for copies in copies_list:
        sf_dir = build_scaled_embeddings(spark, copies)
        run_once(spark, sf_dir)  # untimed: builds shared stages
        walls = [run_once(spark, sf_dir) for _ in range(2)]
        print(
            json.dumps(
                {
                    "copies": copies,
                    "n_vectors": copies * 20_000,
                    "materialized_s": min(walls),
                    "walls": walls,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    rc = main()
    shutil.rmtree(ROOT, ignore_errors=True)
    sys.exit(rc)
