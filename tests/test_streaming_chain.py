"""Composed continuous-crawl chain (streaming/chain.py, r10): warc
stream -> wet -> line dedup vs the accumulated index -> docs sink +
line-index fold + per-host rollup state, all in ONE checkpointed
query — plus the exactly-once replay proof (re-invoking an epoch's
fold, as Spark does on retry, changes NOTHING)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etly_spark.operators import incremental_agg as IA
from etly_spark.operators.warc import encode_warc
from etly_spark.streaming.chain import (
    ROLLUP_SPEC,
    fold_epoch,
    read_corpus,
    start_crawl_corpus_stream,
)

BOILER = ("all rights reserved contact us terms privacy policy "
          "copyright twenty twenty six example news network")


def _resp(uri: str, text: str) -> tuple[dict, bytes]:
    body = f"<html><body><p>{text.replace(chr(10), '</p><p>')}</p></body></html>".encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:ch-{abs(hash(uri)) % 10**8}>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": uri,
            "Content-Type": "application/http; msgtype=response",
        },
        http,
    )


def _dirs(tmp_path):
    return dict(
        docs_dir=str(tmp_path / "docs"),
        index_dir=str(tmp_path / "lidx"),
        state_dir=str(tmp_path / "state"),
    )


def test_chain_dedups_across_epochs_and_rolls_up(spark, tmp_path):
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    # shard 1 (epoch 0): doc A owns the boilerplate line; doc B unique
    (crawl / "s1.warc.gz").write_bytes(
        encode_warc(
            [
                _resp("https://a.example.com/1", "intro paragraph one with plenty of meaningful words to survive "
                      "main text extraction\n" + BOILER),
                _resp("https://b.example.com/2", "body paragraph two also carries enough distinct words to be kept whole"),
            ],
            per_record_gzip=True,
        )
    )
    # shard 2 (epoch 1): repeats the boiler line + a fresh line
    (crawl / "s2.warc.gz").write_bytes(
        encode_warc(
            [_resp("https://a.example.com/3", BOILER + "\nfresh paragraph three with plenty of new words nobody wrote before")],
            per_record_gzip=True,
        )
    )
    d = _dirs(tmp_path)
    q = start_crawl_corpus_stream(
        spark,
        str(crawl),
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        **d,
    )
    q.awaitTermination(120)

    docs = {r.uri: r.text for r in read_corpus(spark, d["docs_dir"]).collect()}
    # html extraction joins <p> blocks as lines; the index-accumulated
    # boiler line is dropped from the LATER epoch's doc only
    assert BOILER in docs["https://a.example.com/1"]
    assert "intro paragraph one" in docs["https://a.example.com/1"]
    assert BOILER not in docs["https://a.example.com/3"]
    assert "fresh paragraph three" in docs["https://a.example.com/3"]
    assert docs["https://b.example.com/2"] == "body paragraph two also carries enough distinct words to be kept whole"

    _, merges = IA.rollup_plan(ROLLUP_SPEC)
    state = {
        r.host: (r.n_docs, r.kept_chars)
        for r in IA.read(spark, d["state_dir"], keys=["host"], merges=merges).collect()
    }
    assert state["a.example.com"][0] == 2
    assert state["b.example.com"][0] == 2 - 1
    # kept_chars counts POST-dedup text (doc 3 lost the boiler line)
    assert state["a.example.com"][1] == len(docs["https://a.example.com/1"]) + len(
        docs["https://a.example.com/3"]
    )

    # ---- exactly-once replay: re-invoke the LAST epoch's fold with
    # the same (batch, epoch_id), exactly what Spark does on a retry
    from etly_spark.sources.storage import warc_records

    bin_df = (
        spark.read.format("binaryFile")
        .load(str(crawl / "s2.warc.gz"))
        .select("path", "modificationTime", "length", "content")
    )
    before = {
        "docs": sorted(docs.items()),
        "state": sorted(state.items()),
        "idx": sorted(
            (r.line_h, r.first_ord)
            for r in spark.read.parquet(d["index_dir"]).drop("epoch").collect()
        ),
    }
    fold_epoch(warc_records(bin_df, main=True), 1, **d)
    docs2 = {r.uri: r.text for r in read_corpus(spark, d["docs_dir"]).collect()}
    state2 = {
        r.host: (r.n_docs, r.kept_chars)
        for r in IA.read(spark, d["state_dir"], keys=["host"], merges=merges).collect()
    }
    idx2 = sorted(
        (r.line_h, r.first_ord)
        for r in spark.read.parquet(d["index_dir"]).drop("epoch").collect()
    )
    assert sorted(docs2.items()) == before["docs"]
    assert sorted(state2.items()) == before["state"]
    assert idx2 == before["idx"]
    # and the replayed doc is STILL deduped (it did not probe its own
    # epoch's index contribution and resurrect the boiler line drop)
    assert BOILER not in docs2["https://a.example.com/3"]


def test_index_probe_survives_compaction(spark, tmp_path):
    """read_line_index_before after compact_signature_index: the
    compacted segment makes the epoch partition a STRING — the probe
    must keep ALL segment rows (they predate any live epoch) while
    still excluding the current epoch's own loose dir."""
    import hashlib

    from etly_spark.streaming.chain import read_line_index_before
    from etly_spark.streaming.dedup import compact_signature_index

    idx = tmp_path / "lidx"

    def _write(epoch, line, ord_):
        h = hashlib.md5(line.encode()).hexdigest()
        spark.createDataFrame(
            [(h, ord_)], "line_h string, first_ord long"
        ).coalesce(1).write.mode("overwrite").parquet(str(idx / f"epoch={epoch}"))

    for e in range(4):
        _write(e, f"old line {e}", 1000 + e)
    compact_signature_index(str(idx), threshold=2)  # folds 0..3 into a segment
    assert any("_compacted" in d for d in __import__("os").listdir(idx))
    _write(7, "loose line seven", 7007)
    _write(8, "current epoch eight", 8008)

    got = {r.first_ord for r in read_line_index_before(spark, str(idx), 8).collect()}
    assert got == {1000, 1001, 1002, 1003, 7007}  # segment + epoch 7, NOT 8


def test_chain_drain_compact_resume(spark, tmp_path):
    """r11 (verdict item 4): drain -> compact the line index -> RESUME
    the same checkpoint. The unit test above covers the probe's
    compacted-partition filter; this covers the full chain end-to-end:
    a post-compaction epoch's doc repeating pre-compaction lines is
    deduped against the SEGMENT (its loose epoch dirs are gone), fresh
    lines survive, and the epoch's own index contribution carries only
    the new lines (the r11 anti-join contract)."""
    from etly_spark.streaming.dedup import compact_signature_index

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    d = _dirs(tmp_path)
    ckpt = str(tmp_path / "ckpt")

    def shard(i: int, texts: list[str]) -> None:
        (crawl / f"s{i:03d}.warc.gz").write_bytes(
            encode_warc(
                [
                    _resp(f"https://h{j}.example.com/s{i}/d{j}", t)
                    for j, t in enumerate(texts)
                ],
                per_record_gzip=True,
            )
        )

    old_lines = [
        f"epoch {i} owns this original paragraph with plenty of words {i * 17}"
        for i in range(6)
    ]
    for i in range(6):
        shard(i, [old_lines[i] + "\n" + BOILER])
    q = start_crawl_corpus_stream(
        spark, str(crawl), checkpoint=ckpt, max_files_per_trigger=1, **d
    )
    q.awaitTermination(180)

    compact_signature_index(d["index_dir"], threshold=3)
    import os

    entries = os.listdir(d["index_dir"])
    assert any("_compacted" in e for e in entries)
    assert not any(
        e.startswith("epoch=") and "_compacted" not in e for e in entries
    ), "loose epoch dirs must fold into the segment"

    # resume: one doc made of two PRE-COMPACTION lines + one fresh line
    fresh = "a genuinely new paragraph appearing only after the compaction"
    shard(6, [old_lines[2] + "\n" + BOILER + "\n" + fresh])
    q2 = start_crawl_corpus_stream(
        spark, str(crawl), checkpoint=ckpt, max_files_per_trigger=1, **d
    )
    q2.awaitTermination(180)

    docs = {r.uri: r.text for r in read_corpus(spark, d["docs_dir"]).collect()}
    resumed = docs["https://h0.example.com/s6/d0"]
    assert old_lines[2] not in resumed  # excluded via the SEGMENT
    assert BOILER not in resumed
    assert fresh in resumed
    # the resumed epoch's index contribution = its genuinely-new lines
    # only (anti-join vs the compacted history)
    import hashlib

    epoch_dirs = [
        e for e in os.listdir(d["index_dir"])
        if e.startswith("epoch=") and "_compacted" not in e
    ]
    assert len(epoch_dirs) == 1  # only the post-compaction epoch
    contrib = {
        r.line_h
        for r in spark.read.parquet(
            os.path.join(d["index_dir"], epoch_dirs[0])
        ).collect()
    }
    assert hashlib.md5(fresh.encode()).hexdigest() in contrib
    assert hashlib.md5(old_lines[2].encode()).hexdigest() not in contrib
    assert hashlib.md5(BOILER.encode()).hexdigest() not in contrib
