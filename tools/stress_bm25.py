"""Incremental-BM25 maintenance stress (r13): fold a corpus in as N
epochs and measure the claims the 100 TB design makes — per-epoch fold
wall FLAT as the index grows (O(shard), never O(index)), probe wall
~flat (a pushed term-IN read of the postings, not a corpus scan),
deletes via tombstones cheap, compaction preserving probe rows while
collapsing the loose partitions.

Usage: python tools/stress_bm25.py [epochs] [src_dir]
Writes one JSON line to stdout. Default src is the 10x scaled corpus
(tools/build_scaled_corpus.py) if present, else sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.io.tables import load_table  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def main() -> int:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    default_src = (
        "/tmp/etly_sf1.0_scaled"
        if os.path.isdir("/tmp/etly_sf1.0_scaled")
        else "/root/testdata/sf0.1"
    )
    src = sys.argv[2] if len(sys.argv) > 2 else default_src
    spark = get_spark("stress-bm25")

    from etly_spark.operators.bm25 import (
        compact_bm25_index,
        fold_bm25_epoch,
        fold_bm25_tombstones,
        probe_bm25_index,
    )

    d = load_table(spark, src, "documents").select("doc_id", "text")
    n_docs = d.count()
    idx = tempfile.mkdtemp(prefix="bm25_stress_")
    out = {"src": src, "n_docs": n_docs, "epochs": epochs}

    folds = []
    for e in range(epochs):
        t0 = time.monotonic()
        fold_bm25_epoch(d.where(F.col("doc_id") % epochs == e), idx, e)
        folds.append(round(time.monotonic() - t0, 2))
    out["fold_s"] = folds
    out["fold_first4_avg"] = round(sum(folds[:4]) / 4, 2)
    out["fold_last4_avg"] = round(sum(folds[-4:]) / 4, 2)

    # corpus-derived query terms, the catalog's rule
    top15 = (
        d.select(F.explode(F.split(F.lower("text"), r"\W+")).alias("t"))
        .where(F.length("t") > 0)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("t"))
        .limit(15)
        .collect()
    )
    qterms = [top15[i]["t"] for i in (4, 9, 14) if i < len(top15)]

    t0 = time.monotonic()
    pre = probe_bm25_index(spark, idx, qterms)
    out["probe_rows"] = pre.count()
    out["probe_s"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    fold_bm25_tombstones(
        d.where(F.col("doc_id") % 10 == 7).select("doc_id"), idx, epochs
    )
    out["tombstone_fold_s"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    post_del = probe_bm25_index(spark, idx, qterms)
    out["probe_after_delete_rows"] = post_del.count()
    out["probe_after_delete_s"] = round(time.monotonic() - t0, 2)

    rows_before = sorted(map(tuple, post_del.collect()))
    loose_before = len(os.listdir(os.path.join(idx, "postings")))
    t0 = time.monotonic()
    compact_bm25_index(idx, threshold=4)
    out["compact_s"] = round(time.monotonic() - t0, 2)
    rows_after = sorted(
        map(tuple, probe_bm25_index(spark, idx, qterms).collect())
    )
    out["compact_identical"] = rows_before == rows_after
    out["postings_dirs"] = [
        loose_before,
        len(os.listdir(os.path.join(idx, "postings"))),
    ]
    out["index_bytes"] = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dd, ff in os.walk(idx)
        for f in ff
    )

    from etly_spark.operators.bm25 import purge_bm25_tombstones

    t0 = time.monotonic()
    pst = purge_bm25_tombstones(spark, idx)
    out["purge_s"] = round(time.monotonic() - t0, 2)
    out["purge"] = pst
    rows_purged = sorted(
        map(tuple, probe_bm25_index(spark, idx, qterms).collect())
    )
    out["purge_identical"] = rows_purged == rows_after
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
