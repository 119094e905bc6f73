"""Streaming-chain longevity (r11, verdict item 4): the composed
crawl→corpus chain's per-trigger work is "O(batch) by construction",
but the dedup probe joins an index that grows every epoch, and
compaction is only legal on a drained stream. This drives the claim
end-to-end:

1. synthesize EPOCHS warc shards (constant per-shard volume: fresh
   lines + global boilerplate + lines repeating from the previous
   shard) and run the ONE checkpointed query at maxFilesPerTrigger=1,
   recording every trigger's wall from the query progress feed;
2. drain -> compact_signature_index (loose epoch dirs fold into a
   never-rewritten segment);
3. RESUME the same checkpoint with fresh shards that repeat
   pre-compaction lines, and prove the probe still excludes the
   compacted history (the resumed docs keep only their fresh lines).

Usage: python tools/stress_stream.py [epochs] [workdir]
Writes one JSON line: first/median/last trigger walls, the wall slope
(linear fit per epoch, ms), index dir counts before/after compaction,
and the resume-exclusion booleans.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from etly_spark.operators.warc import encode_warc  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402
from etly_spark.streaming.chain import (  # noqa: E402
    read_corpus,
    start_crawl_corpus_stream,
)
from etly_spark.streaming.dedup import compact_signature_index  # noqa: E402

BOILER = [
    f"all rights reserved contact us terms privacy policy section {b}"
    for b in range(20)
]
DOCS_PER_SHARD = 30
LINES_PER_DOC = 20


def _resp(uri: str, lines: list[str]) -> tuple[dict, bytes]:
    body = (
        "<html><body>"
        + "".join(f"<p>{ln}</p>" for ln in lines)
        + "</body></html>"
    ).encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:ls-{abs(hash(uri)) % 10**10}>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": uri,
            "Content-Type": "application/http; msgtype=response",
        },
        http,
    )


def fresh_line(shard: int, doc: int, i: int) -> str:
    return (
        f"shard {shard} document {doc} original paragraph {i} with plenty "
        f"of distinct running words token{shard * 7919 + doc * 131 + i}"
    )


def write_shard(crawl_dir: str, shard: int) -> None:
    recs = []
    for doc in range(DOCS_PER_SHARD):
        lines = []
        for i in range(LINES_PER_DOC):
            if i % 4 == 0:
                lines.append(BOILER[(shard + doc + i) % len(BOILER)])
            elif i % 4 == 1 and shard > 0:
                # repeats the PREVIOUS shard's fresh content
                lines.append(fresh_line(shard - 1, doc, i + 2))
            else:
                lines.append(fresh_line(shard, doc, i))
        recs.append(_resp(f"https://host{doc % 7}.example.com/s{shard}/d{doc}", lines))
    path = os.path.join(crawl_dir, f"shard-{shard:05d}.warc.gz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(encode_warc(recs, per_record_gzip=True))
    os.rename(tmp, path)


def trigger_walls(q) -> list[tuple[int, float]]:
    out = []
    for p in q.recentProgress:
        if p is None:
            continue
        d = p.get("durationMs", {}) or {}
        w = d.get("triggerExecution")
        if w is not None and p.get("numInputRows", 0) > 0:
            out.append((int(p["batchId"]), float(w)))
    return sorted(out)


def main() -> int:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/etly_stream_longevity"
    shutil.rmtree(work, ignore_errors=True)
    crawl = os.path.join(work, "crawl")
    os.makedirs(crawl)
    dirs = dict(
        docs_dir=os.path.join(work, "docs"),
        index_dir=os.path.join(work, "lidx"),
        state_dir=os.path.join(work, "state"),
    )
    ckpt = os.path.join(work, "ckpt")
    spark = get_spark("stress-stream")

    for s in range(epochs):
        write_shard(crawl, s)
    t0 = time.monotonic()
    q = start_crawl_corpus_stream(
        spark, crawl, checkpoint=ckpt, max_files_per_trigger=1, **dirs
    )
    q.awaitTermination()
    walls = trigger_walls(q)
    drain_s = time.monotonic() - t0

    # linear fit of wall vs epoch, excluding the first two triggers
    # (JVM/codegen warm-up dominates them): the growth signal in
    # ms/epoch as the probe's index input grows
    n = len(walls)
    ys = [w[1] for w in walls]
    fit = walls[2:] if n > 6 else walls
    xs_f = [w[0] for w in fit]
    ys_f = [w[1] for w in fit]
    mx, my = sum(xs_f) / len(fit), sum(ys_f) / len(fit)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs_f, ys_f)) / max(
        sum((x - mx) ** 2 for x in xs_f), 1e-9
    )

    loose_before = sum(
        1 for d in os.listdir(dirs["index_dir"]) if d.startswith("epoch=")
        and "_compacted" not in d
    )
    compact_signature_index(
        dirs["index_dir"], threshold=max(4, min(16, epochs // 2))
    )
    entries_after = [
        d for d in os.listdir(dirs["index_dir"]) if d.startswith("epoch=")
    ]
    loose_after = sum(1 for d in entries_after if "_compacted" not in d)
    segments = sum(1 for d in entries_after if "_compacted" in d)

    # ---- resume: 2 more shards; shard `epochs` repeats shard
    # epochs-1's fresh lines (pre-compaction history) + boiler; its
    # only new content is its own fresh lines
    for s in (epochs, epochs + 1):
        write_shard(crawl, s)
    q2 = start_crawl_corpus_stream(
        spark, crawl, checkpoint=ckpt, max_files_per_trigger=1, **dirs
    )
    q2.awaitTermination()

    docs = {
        r.uri: r.text
        for r in read_corpus(spark, dirs["docs_dir"]).collect()
        if f"/s{epochs}/" in r.uri
    }
    # shard `epochs` carries fresh_line(epochs-1, doc, 3) at i=1 —
    # first seen in (pre-compaction) epoch epochs-1, so it must be
    # excluded by the probe reading the compacted segment
    probe_excludes_compacted = all(
        fresh_line(epochs - 1, doc, 3)
        not in docs[f"https://host{doc % 7}.example.com/s{epochs}/d{doc}"]
        for doc in range(3)
    ) and not any(b in " ".join(docs.values()) for b in BOILER)
    fresh_kept = all(
        fresh_line(epochs, doc, 2) in docs[f"https://host{doc % 7}.example.com/s{epochs}/d{doc}"]
        for doc in range(3)
    )

    print(
        json.dumps(
            {
                "epochs": epochs,
                "docs_per_shard": DOCS_PER_SHARD,
                "drain_s": round(drain_s, 1),
                "walls_ms": {
                    "first": ys[0],
                    "p50": sorted(ys)[n // 2],
                    "last": ys[-1],
                    "max": max(ys),
                },
                "wall_slope_ms_per_epoch": round(slope, 2),
                "index_dirs": {
                    "loose_before": loose_before,
                    "loose_after": loose_after,
                    "segments": segments,
                },
                "resume": {
                    "probe_excludes_compacted": probe_excludes_compacted,
                    "fresh_kept": fresh_kept,
                },
            }
        )
    )
    return 0 if (probe_excludes_compacted and fresh_kept and segments >= 1) else 1


if __name__ == "__main__":
    sys.exit(main())
