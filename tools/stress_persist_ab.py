"""ETLY_ANN_PERSIST_TOPK crossover A/B (r14 — verdict item 5).

The knob (queries/similarity.sim_ann_methods) flips the per-method
top-k outputs from RECOMPUTE (each lazy plan re-runs its corpus
scorer for its second consumer — the recall join) to OUTPUT-PERSIST
(Q*k rows cached, InMemoryRelation barriers inserted). The r8 A/B
measured recompute winning at sf0.1 AND at 10x, and the knob's
flip-at-huge-corpus default rested on an argument, not a number —
this probe measures the actual crossover.

Method: scale ONLY the embeddings table (sim_ann_methods' sole
input) by unioning shifted copies (vec_id + i*10_000_000, dims
circularly rotated by i — the build_scaled_corpus embedding rule, so
cross-copy cosines are ~random), then run the full catalog row under
each knob setting, interleaved 0/1/0/1 after one untimed warmup
(stage artifacts build once and are shared by both settings — they
are identical work either way). min-of-2 per setting.

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


def run_once(spark, sf_dir: str, persist: bool) -> float:
    os.environ["ETLY_ANN_PERSIST_TOPK"] = "1" if persist else "0"
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
        run_once(spark, sf_dir, False)  # untimed: builds shared stages
        walls = {"recompute": [], "persist": []}
        for _ in range(2):
            walls["recompute"].append(run_once(spark, sf_dir, False))
            walls["persist"].append(run_once(spark, sf_dir, True))
        print(
            json.dumps(
                {
                    "copies": copies,
                    "n_vectors": copies * 20_000,
                    "recompute_s": min(walls["recompute"]),
                    "persist_s": min(walls["persist"]),
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
