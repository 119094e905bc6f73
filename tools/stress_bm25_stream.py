"""Streaming BM25-index longevity (r13): the stress_ann_stream
methodology applied to the text retrieval index
(streaming/ann.start_bm25_index).

N micro-batches of document CDC rows (adds plus a rolling delete feed
retracting part of the previous shard) drive the ONE foreachBatch
writer at maxFilesPerTrigger=1. Measured:

- per-trigger wall across all epochs (each fold tokenizes ONLY its
  batch — the curve must stay flat as postings/doclen/stats/tombstone
  partitions accumulate);
- drain -> compact_bm25_index: loose epochs fold into never-rewritten
  term-sorted segments, probe rows identical;
- RESUME on the same checkpoint with one more shard: only the new
  epoch appears;
- purge_bm25_tombstones: dead rows dropped, tombstone side-table gone,
  probe identical;
- correctness at the end: the probed index equals the batch fold of
  (all adds minus all deletes) — BM25 statistics are linear, so the
  streamed index IS the batch result.

Usage: python tools/stress_bm25_stream.py [n_epochs] [docs_per_shard] [del_rate]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etly_spark.session import get_spark  # noqa: E402

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu",
]


def text(i: int) -> str:
    picks = [WORDS[(i * 7 + k * 3) % len(WORDS)] for k in range(6 + i % 5)]
    return " ".join(picks) + f" doc{i % 13}"


def main() -> int:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    del_rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
    spark = get_spark("stress-bm25-stream")

    from etly_spark.operators.bm25 import (
        compact_bm25_index,
        fold_bm25_epoch,
        fold_bm25_tombstones,
        probe_bm25_index,
        purge_bm25_tombstones,
    )
    from etly_spark.streaming.ann import start_bm25_index

    work = tempfile.mkdtemp(prefix="bm25stream_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    idx = os.path.join(work, "idx")
    ckpt = os.path.join(work, "ckpt")
    schema = "doc_id long, text string, op string"
    deleted: list[int] = []

    def write_shard(e: int) -> None:
        lines = [
            json.dumps({"doc_id": i, "text": text(i), "op": "add"})
            for i in range(e * per, (e + 1) * per)
        ]
        if e > 0:
            for i in range(
                (e - 1) * per, (e - 1) * per + max(1, int(per * del_rate))
            ):
                lines.append(
                    json.dumps({"doc_id": i, "text": text(i), "op": "del"})
                )
                deleted.append(i)
        with open(os.path.join(src, f"s{e:04d}.json"), "w") as fh:
            fh.write("\n".join(lines) + "\n")

    for e in range(n_epochs):
        write_shard(e)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    )
    t0 = time.monotonic()
    q = start_bm25_index(stream, idx, ckpt)
    q.awaitTermination(3600)
    total_stream_s = round(time.monotonic() - t0, 2)
    walls = [
        round(p["durationMs"]["triggerExecution"] / 1000.0, 2)
        for p in q.recentProgress
        if p.get("numInputRows", 0) > 0
    ]

    qterms = ["alpha", "doc3", "kappa"]
    probe0 = sorted(map(tuple, probe_bm25_index(spark, idx, qterms).collect()))

    loose_before = sum(
        1
        for d in os.listdir(os.path.join(idx, "postings"))
        if d.startswith("epoch=") and not d.startswith("epoch=_")
    )
    compact_bm25_index(idx, threshold=8)
    probe1 = sorted(map(tuple, probe_bm25_index(spark, idx, qterms).collect()))
    loose_after = sum(
        1
        for d in os.listdir(os.path.join(idx, "postings"))
        if d.startswith("epoch=") and not d.startswith("epoch=_")
    )

    # resume: one more shard on the same checkpoint
    write_shard(n_epochs)
    q2 = start_bm25_index(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src),
        idx,
        ckpt,
    )
    q2.awaitTermination(300)

    probe_pre = sorted(
        map(tuple, probe_bm25_index(spark, idx, qterms).collect())
    )
    st = purge_bm25_tombstones(spark, idx)
    probe2 = sorted(map(tuple, probe_bm25_index(spark, idx, qterms).collect()))

    # batch twin over everything the stream saw
    bidx = os.path.join(work, "bidx")
    all_ids = range(0, (n_epochs + 1) * per)
    rows = [(i, text(i)) for i in all_ids]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fold_bm25_epoch(d, bidx, 0)
    fold_bm25_tombstones(
        spark.createDataFrame([(i,) for i in sorted(set(deleted))], "doc_id long"),
        bidx,
        1,
    )
    batch = sorted(map(tuple, probe_bm25_index(spark, bidx, qterms).collect()))

    out = {
        "n_epochs": n_epochs,
        "docs_per_shard": per,
        "del_rate": del_rate,
        "total_stream_s": total_stream_s,
        "wall_first8_avg": round(sum(walls[:8]) / max(1, len(walls[:8])), 2),
        "wall_last8_avg": round(sum(walls[-8:]) / max(1, len(walls[-8:])), 2),
        "wall_max": max(walls) if walls else None,
        "loose_dirs": [loose_before, loose_after],
        "compact_identical": probe0 == probe1,
        "purge": st,
        "purge_identical": probe2 == probe_pre,
        "streamed_equals_batch": probe2 == batch,
        "probe_rows": len(probe2),
        "n_deleted": len(set(deleted)),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
