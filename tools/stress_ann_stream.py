"""Streaming ANN-index longevity (r11): the chain-longevity methodology
(tools/stress_stream.py) applied to the incremental IVF fold
(streaming/ann.start_ivf_index).

N micro-batches of embedding CDC rows (adds plus a rolling ~2% delete
feed retracting earlier vectors) drive the ONE foreachBatch writer at
maxFilesPerTrigger=1. Measured:

- per-trigger wall across all epochs (the fold reads ONLY its batch —
  the curve must stay flat as postings/tombstone partitions
  accumulate);
- drain -> compact_ivf_postings: loose epoch dirs fold into
  never-rewritten segments on BOTH sides (postings + tombstones);
- RESUME on the same checkpoint with one more shard: only the new
  epoch appears, pre-compaction epochs stay inside the segment;
- correctness at the end: the probed index equals a one-shot batch
  assignment of (all adds minus all deletes) under the streamed frozen
  quantizer, and no tombstoned id appears as a neighbor.

r12: a third arg sets the DELETE RATE (fraction of the previous shard
retracted each epoch — default 0.02; run 0.2+ for the churny-index
regime), and after the resume the TOMBSTONE PURGE rung
(purge_ivf_tombstones) runs: the probe must answer identically before
and after, bytes-on-disk must shrink by the dead fraction, and the
tombstone side-table must be gone.

Usage: python tools/stress_ann_stream.py [n_epochs] [rows_per_shard] [del_rate]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.session import get_spark  # noqa: E402


def vec(i: int) -> list:
    return [float((i * 37 + j * 11) % 19 - 9) for j in range(16)]


def main() -> int:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    del_rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02
    spark = get_spark("stress-ann-stream")

    from etly_spark.functions import vector as V
    from etly_spark.queries.similarity import (
        _probe_ivf_index,
        compact_ivf_postings,
    )
    from etly_spark.streaming.ann import start_ivf_index

    work = tempfile.mkdtemp(prefix="annstream_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    idx = os.path.join(work, "idx")
    ckpt = os.path.join(work, "ckpt")
    schema = "vec_id long, embedding array<double>, op string"

    deleted: list[int] = []

    def write_shard(e: int) -> None:
        lines = [
            json.dumps({"vec_id": i, "embedding": vec(i), "op": "add"})
            for i in range(e * per, (e + 1) * per)
        ]
        if e > 0:  # retract del_rate of the PREVIOUS shard (takedowns)
            for i in range((e - 1) * per, (e - 1) * per + max(1, int(per * del_rate))):
                lines.append(json.dumps({"vec_id": i, "embedding": vec(i), "op": "del"}))
                deleted.append(i)
        with open(os.path.join(src, f"s{e:04d}.json"), "w") as fh:
            fh.write("\n".join(lines) + "\n")

    for e in range(n_epochs):
        write_shard(e)

    # one trigger per shard; per-trigger wall from the engine's own
    # progress events (recentProgress retains the last 100 — above any
    # n_epochs this probe runs)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    )
    t0 = time.monotonic()
    q = start_ivf_index(stream, idx, ckpt)
    q.awaitTermination(3600)
    total_stream_s = round(time.monotonic() - t0, 2)
    walls = [
        round(p["durationMs"]["triggerExecution"] / 1000.0, 2)
        for p in q.recentProgress
        if p.get("numInputRows", 0) > 0
    ]

    # drain -> compact both sides -> resume with one more shard
    loose_before = sum(
        1 for d in os.listdir(os.path.join(idx, "postings")) if d.startswith("epoch=")
    )
    compact_ivf_postings(idx, threshold=8)

    def count_parts(sub: str) -> tuple[int, int]:
        names = [d for d in os.listdir(os.path.join(idx, sub)) if d.startswith("epoch=")]
        seg = sum(1 for d in names if d.startswith("epoch=_compacted-"))
        return len(names) - seg, seg

    post_loose, post_seg = count_parts("postings")
    tomb_loose, tomb_seg = count_parts("tombstones")

    write_shard(n_epochs)
    q = start_ivf_index(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src),
        idx,
        ckpt,
    )
    q.awaitTermination(300)
    resumed_loose, _ = count_parts("postings")

    # r13 (verdict item 5): the LIVE loop maintained the drift sidecar
    # fold by fold — replay it into the max-share curve the operator
    # watches, before the purge below resets it. Uniform load is
    # 1/nlist; the one-shot alert marks the first epoch the share
    # crossed the 4/nlist split trigger.
    drift = None
    sc_path = os.path.join(idx, "drift_stats.json")
    if os.path.isfile(sc_path):
        with open(sc_path) as f:
            state = json.load(f)
        cum: dict = dict(state["epochs"].get("_base", {}))
        curve = []
        for eid in sorted((k for k in state["epochs"] if k != "_base"), key=int):
            for c, n in state["epochs"][eid].items():
                cum[c] = cum.get(c, 0) + n
            curve.append(round(max(cum.values()) / sum(cum.values()), 4))
        drift = {"max_share_curve": curve, "alert": state["alert"]}

    # end-state equality: probe == one-shot assign(adds - deletes)
    all_ids = spark.range((n_epochs + 1) * per).select(F.col("id").alias("vec_id"))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: ((F.col("vec_id") * 37 + j * 11) % 19 - 9).cast("double"),
    )
    live = all_ids.filter(~F.col("vec_id").isin(deleted)).select(
        "vec_id", emb.alias("embedding")
    )
    live = live.select(
        "vec_id", "embedding", V.l2_norm_pd(F.col("embedding")).alias("nrm")
    )
    cent_pdf = V._staged_pdf(os.path.join(idx, "quantizer"))
    want = sorted(
        (r["vec_id"], r["cent_id"])
        for r in V.assign_nearest(live, cent_pdf).select("vec_id", "cent_id").collect()
    )
    tomb = spark.read.parquet(os.path.join(idx, "tombstones")).select("vec_id")
    got = sorted(
        (r["vec_id"], r["cent_id"])
        for r in spark.read.parquet(os.path.join(idx, "postings"))
        .join(F.broadcast(tomb), "vec_id", "left_anti")
        .select("vec_id", "cent_id")
        .collect()
    )
    neighbors = {
        r["neighbor_id"]
        for r in _probe_ivf_index(spark, idx, qwhere="vec_id % 997 = 0").collect()
    }

    # tombstone PURGE (r12, verdict item 3): on the drained stream,
    # rewrite live postings, drop dead rows + the tombstone side-table;
    # the probe must answer byte-identically
    from etly_spark.queries.similarity import purge_ivf_tombstones

    probe_rows_before = sorted(
        map(tuple, _probe_ivf_index(spark, idx, qwhere="vec_id % 997 = 0").collect())
    )
    t0 = time.monotonic()
    purge_stats = purge_ivf_tombstones(spark, idx)
    purge_s = round(time.monotonic() - t0, 2)
    probe_rows_after = sorted(
        map(tuple, _probe_ivf_index(spark, idx, qwhere="vec_id % 997 = 0").collect())
    )

    half = len(walls) // 2
    out = {
        "epochs": len(walls),
        "stream_total_s": total_stream_s,
        "rows_per_shard": per,
        "del_rate": del_rate,
        "deleted": len(deleted),
        "purge": {
            "s": purge_s,
            "purged_rows": purge_stats["purged_rows"],
            "live_rows": purge_stats["live_rows"],
            "bytes_before": purge_stats["bytes_before"],
            "bytes_after": purge_stats["bytes_after"],
            "probe_identical": probe_rows_before == probe_rows_after,
            "tombstones_gone": not os.path.isdir(os.path.join(idx, "tombstones")),
        },
        "wall_p50_first_half": round(sorted(walls[:half])[half // 2], 2) if half else None,
        # guard like the sibling fields (ADVICE r11): a stream with no
        # progress rows must print its JSON line, not IndexError
        "wall_p50_second_half": (
            round(sorted(walls[half:])[len(walls[half:]) // 2], 2) if walls[half:] else None
        ),
        "wall_last": walls[-1] if walls else None,
        "loose_before_compact": loose_before,
        "postings_after_compact": [post_loose, post_seg],
        "tombstones_after_compact": [tomb_loose, tomb_seg],
        "loose_after_resume": resumed_loose,
        "end_state_equal": got == want,
        "tombstoned_neighbor_leak": bool(set(deleted) & neighbors),
        "drift": drift,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
