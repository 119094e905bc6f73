"""Continuous-ingest dedup: a streamed signature index must be
bit-identical to the batch-built sketch, and the incremental band-probe
must work against it unchanged (streaming/dedup.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etly_spark.operators.sketch import minhash_signatures
from etly_spark.queries.catalog import release_cache
from etly_spark.queries.dedup import lsh_incremental_pairs
from etly_spark.streaming.dedup import read_signature_index, start_signature_index

SCHEMA = "doc_id long, text string"


def _write_batch(src_dir, name, docs):
    (src_dir / name).write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in docs) + "\n"
    )


def test_streamed_index_matches_batch_and_serves_probes(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    base = [
        (i, f"the quick brown fox number {i} jumps over the lazy dog while "
             f"document {i} rambles about topic {i * 37 % 11} at length")
        for i in range(1, 9)
    ]
    _write_batch(src, "b1.json", base)
    _write_batch(
        src,
        "b2.json",
        [(100 + i, f"batch two text {i} with entirely different words like "
                   f"zephyr quartz {i} and nothing shared") for i in range(1, 9)],
    )
    # batch 3: 201 = EXACT dup of doc 1 (guaranteed band match + jaccard
    # 1.0), 202 = fresh text — the incoming crawl increment
    _write_batch(src, "b3.json", [(201, base[0][1]), (202, "completely novel text "
                                  "that matches nothing else in the corpus at all")])

    # one file per micro-batch: three epochs fold into the index
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = start_signature_index(stream, str(tmp_path / "idx"), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    idx_sigs = read_signature_index(spark, str(tmp_path / "idx"))
    all_docs = spark.read.schema(SCHEMA).json(str(src))
    batch_sigs = minhash_signatures(all_docs)

    got = sorted((r.doc_id, tuple(r.sig)) for r in idx_sigs.collect())
    want = sorted((r.doc_id, tuple(r.sig)) for r in batch_sigs.collect())
    assert got == want and len(got) == 18  # streamed == batch, bit-identical

    # the band-probe of the new batch runs unchanged against the
    # streamed index, and agrees with the same probe on batch sigs
    is_new = F.col("doc_id") >= 200
    via_index = sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in lsh_incremental_pairs(all_docs, idx_sigs, is_new).collect()
    )
    via_batch = sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in lsh_incremental_pairs(all_docs, batch_sigs, is_new).collect()
    )
    release_cache()
    assert via_index == via_batch
    assert (1, 201, 1.0) in via_index  # the exact dup vs history is caught
    assert all(a >= 200 or b >= 200 for a, b, _ in via_index)  # only new-involving


def test_index_compaction_preserves_signatures(spark, tmp_path):
    """After a drain, epoch partitions fold into a segment; the index
    reads back identically and further ingest appends new epochs."""
    from etly_spark.streaming.dedup import compact_signature_index

    src = tmp_path / "in"
    src.mkdir()
    for b in range(4):
        _write_batch(
            src, f"b{b}.json",
            [(b * 10 + i, f"text for doc {b * 10 + i} with enough characters") for i in range(3)],
        )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    idx_dir = str(tmp_path / "idx")
    start_signature_index(stream, idx_dir, str(tmp_path / "ck")).awaitTermination(120)
    before = sorted(
        (r.doc_id, tuple(r.sig)) for r in read_signature_index(spark, idx_dir).collect()
    )
    compact_signature_index(idx_dir, threshold=2)
    import os

    names = sorted(os.listdir(idx_dir))
    assert any("_compacted-" in n for n in names)
    assert len([n for n in names if n.startswith("epoch=") and "_compacted-" not in n]) <= 2
    after = sorted(
        (r.doc_id, tuple(r.sig)) for r in read_signature_index(spark, idx_dir).collect()
    )
    assert after == before  # byte-identical content, fewer directories
    # continued ingest appends new epochs next to the segment
    _write_batch(src, "b9.json", [(99, "a brand new late-arriving document text")])
    stream2 = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    start_signature_index(stream2, idx_dir, str(tmp_path / "ck")).awaitTermination(120)
    final = read_signature_index(spark, idx_dir)
    assert final.count() == 13 and final.filter("doc_id = 99").count() == 1


def test_streamed_index_is_idempotent_on_epoch_replay(spark, tmp_path):
    """A replayed micro-batch (crash between parquet write and
    checkpoint commit) overwrites its own epoch dir — no duplicate
    signatures ever reach readers."""
    from etly_spark.streaming.dedup import start_signature_index as ssi

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "only.json", [(7, "some document text that is long enough")])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    ssi(stream, str(tmp_path / "idx"), str(tmp_path / "ckpt")).awaitTermination(60)
    # simulate the replay: run the SAME epoch's fold again by streaming
    # with a fresh checkpoint into the same index dir (epoch ids restart
    # at 0 — the overwrite lands on the same epoch=0 directory)
    stream2 = spark.readStream.schema(SCHEMA).json(str(src))
    ssi(stream2, str(tmp_path / "idx"), str(tmp_path / "ckpt2")).awaitTermination(60)
    idx = read_signature_index(spark, str(tmp_path / "idx"))
    assert idx.count() == 1  # overwritten, not duplicated


def test_streamed_line_index_and_incremental_line_dedup(spark, tmp_path):
    """C4 line dedup, continuous form: micro-batches fold a
    first-occurrence line-hash index; an arriving batch drops every
    line the index already holds plus in-batch repeats, reassembling
    order-preserving."""
    from etly_spark.streaming.dedup import (
        dedup_lines_incremental,
        read_line_index,
        start_line_index,
    )

    src = tmp_path / "in"
    src.mkdir()
    boiler = "all rights reserved contact us"
    _write_batch(src, "b1.json", [(1, f"intro one\n{boiler}"), (2, "body two")])
    _write_batch(src, "b2.json", [(3, f"{boiler}\nfresh three")])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = start_line_index(stream, str(tmp_path / "lidx"), str(tmp_path / "lckpt"))
    q.awaitTermination(120)

    idx = read_line_index(spark, str(tmp_path / "lidx"))
    # distinct lines across both epochs; the boiler line keeps its
    # EARLIEST occurrence (doc 1, not doc 3)
    rows = {r.line_h: r.first_ord for r in idx.collect()}
    assert len(rows) == 4  # intro/boiler/body/fresh
    import hashlib
    bh = hashlib.md5(boiler.encode()).hexdigest()
    assert rows[bh] == 1 * 1000000 + 1

    # the arriving increment: one already-seen line, one in-batch
    # repeated line, one genuinely new line
    inc = spark.createDataFrame(
        [(10, f"{boiler}\nnovel alpha"), (11, "novel alpha\nnovel beta")],
        SCHEMA,
    )
    got = {r.doc_id: r.text for r in dedup_lines_incremental(inc, idx).collect()}
    assert got[10] == "novel alpha"            # boiler dropped (index hit)
    assert got[11] == "novel beta"             # alpha lost to doc 10's copy
    release_cache()


def test_incremental_line_dedup_null_and_all_removed_semantics(spark):
    """Null-semantics pins (r10): a null text column passes through as
    null (never coerced to ''), while a doc whose EVERY line is an
    index hit rebuilds to '' — the two cases the final coalesce must
    keep distinct."""
    from pyspark.sql import functions as F

    from etly_spark.streaming.dedup import dedup_lines_incremental

    idx = spark.createDataFrame(
        [("x", 1)], "line_h string, first_ord long"
    ).withColumn("line_h", F.md5(F.lit("seen line").cast("binary")))
    inc = spark.createDataFrame(
        [(20, "seen line"), (21, None), (22, "seen line\nkept line")],
        SCHEMA,
    )
    got = {r.doc_id: r.text for r in dedup_lines_incremental(inc, idx).collect()}
    assert got[20] == ""          # all lines removed -> empty, not null
    assert got[21] is None        # null text preserved, not ''
    assert got[22] == "kept line"
    release_cache()
