"""Streaming-mode tests: incremental exactly-once transfer, event-time
windows with watermark, streaming dedupe, custom stateful operator."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etly_spark import registry
from etly_spark.config import Source, Target, Transfer
from etly_spark.meta import Meta
from etly_spark.streaming import (
    StreamingTransferService,
    session_agg,
    stateful_running_totals,
    streaming_dedupe,
    tumbling_agg,
)

if "stream.Log" not in registry.schemas:
    registry.schemas.register(
        "stream.Log",
        StructType(
            [
                StructField("Id", LongType()),
                StructField("Name", StringType()),
                StructField("Type", StringType()),
            ]
        ),
    )

    @registry.transformers.register("stream.LogToKV")
    def log_to_kv(df):
        return [
            F.col("Id").alias("Key"),
            F.concat_ws("/", F.col("Name"), F.col("Type")).alias("Value"),
        ]


def _await(query, timeout=120):
    query.awaitTermination(timeout)


def _transfer(tmp_path) -> Transfer:
    return Transfer(
        name="stream-smoke",
        source=Source(name=str(tmp_path / "in"), data_type="stream.Log"),
        target=Target(name=str(tmp_path / "out" / "batch-$batchCount.log")),
        transformer="stream.LogToKV",
        base_dir=str(tmp_path),
    )


def test_streaming_transfer_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "f1.log").write_text(
        '{"Id":1,"Name":"a","Type":"x"}\n{"werwe:\n{"Id":2,"Name":"b","Type":"y"}\n'
    )
    t = _transfer(tmp_path)
    svc = StreamingTransferService(spark)

    q = svc.start(t, available_now=True)
    _await(q)
    out1 = sorted(p.name for p in (tmp_path / "out").glob("*.log"))
    assert out1 == ["batch-0.log"]
    lines = (tmp_path / "out" / "batch-0.log").read_text().strip().splitlines()
    assert len(lines) == 2
    assert {json.loads(ln)["Key"] for ln in lines} == {1, 2}

    meta = Meta.load(str(src / ".etly_meta.json"))
    assert len(meta.processed) == 1
    om = next(iter(meta.processed.values()))
    assert om.record_processed == 2 and om.record_errors == 1
    assert meta.errors and "werwe" in str(meta.errors[0])

    # second file arrives; only IT is processed (checkpoint skip of f1)
    (src / "f2.log").write_text('{"Id":3,"Name":"c","Type":"z"}\n')
    q = svc.start(t, available_now=True)
    _await(q)
    out2 = sorted(p.name for p in (tmp_path / "out").glob("*.log"))
    assert out2 == ["batch-0.log", "batch-1.log"]
    lines2 = (tmp_path / "out" / "batch-1.log").read_text().strip().splitlines()
    assert [json.loads(ln)["Key"] for ln in lines2] == [3]
    meta = Meta.load(str(src / ".etly_meta.json"))
    assert len(meta.processed) == 2

    # no new files → re-run is a no-op (no batch-2 output)
    q = svc.start(t, available_now=True)
    _await(q)
    assert sorted(p.name for p in (tmp_path / "out").glob("*.log")) == out2


def test_streaming_crash_after_write_recovers_exactly_once(spark, tmp_path, monkeypatch):
    """Kill mid-batch AFTER the routed sink write but BEFORE meta.save()
    — the worst crash point: side effects landed, checkpoint commit did
    not. On restart the checkpoint replays the batch; the run must end
    with no duplicate output records and a consistent ledger (reference
    semantics: meta skip, transfer_service.go:503-505; here carried by
    the commit log + idempotent finalization)."""
    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "f1.log").write_text(
        '{"Id":1,"Name":"a","Type":"x"}\n{"Id":2,"Name":"b","Type":"y"}\n'
    )
    t = _transfer(tmp_path)
    svc = StreamingTransferService(spark)

    real_save = Meta.save
    crashed = {"n": 0}

    def crash_once(self):
        if crashed["n"] == 0:
            crashed["n"] += 1
            raise RuntimeError("injected crash between sink write and meta.save")
        return real_save(self)

    monkeypatch.setattr(Meta, "save", crash_once)
    q = svc.start(t, available_now=True)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
        q.stop()
        raise RuntimeError(str(q.exception() or "query did not fail"))

    # the crash landed after the write: output exists, ledger does not
    assert (tmp_path / "out" / "batch-0.log").exists()
    assert crashed["n"] == 1
    assert not (src / ".etly_meta.json").exists()

    # restart with the SAME checkpoint: the uncommitted batch replays
    q = svc.start(t, available_now=True)
    _await(q)

    lines = (tmp_path / "out" / "batch-0.log").read_text().strip().splitlines()
    assert sorted(json.loads(ln)["Key"] for ln in lines) == [1, 2]  # no dups
    assert sorted(p.name for p in (tmp_path / "out").glob("batch-*")) == [
        "batch-0.log"
    ]
    meta = Meta.load(str(src / ".etly_meta.json"))
    assert len(meta.processed) == 1
    om = next(iter(meta.processed.values()))
    assert om.record_processed == 2 and om.record_errors == 0

    # and the stream is drained: a third start processes nothing new
    q = svc.start(t, available_now=True)
    _await(q)
    meta = Meta.load(str(src / ".etly_meta.json"))
    assert len(meta.processed) == 1


def test_replay_clears_stale_roll_siblings(spark, tmp_path):
    """A crashed attempt may leave more `key.N` roll siblings than the
    replay plans; finalization must clear the stale tail or the replay
    silently double-counts (`batch-0.log` fresh + `batch-0.log.1`
    stale)."""
    from etly_spark.pipeline import TransferService

    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    out.mkdir()
    (src / "f1.log").write_text('{"Id":1,"Name":"a","Type":"x"}\n')
    # stale siblings from a hypothetical crashed attempt
    (out / "batch-0.log.1").write_text('{"Key":99,"Value":"stale"}\n')
    (out / "batch-0.log.2").write_text('{"Key":98,"Value":"stale"}\n')
    t = _transfer(tmp_path)
    result = TransferService(spark).run(t)
    assert result.status == "DONE"
    assert sorted(p.name for p in out.glob("batch-0*")) == ["batch-0.log"]
    lines = (out / "batch-0.log").read_text().strip().splitlines()
    assert [json.loads(ln)["Key"] for ln in lines] == [1]


def _event_stream(spark, tmp_path, rows_per_file: list[list[tuple]]):
    src = tmp_path / "ev"
    src.mkdir()
    import os

    base = time.time() - 3600
    for i, rows in enumerate(rows_per_file):
        p = src / f"ev{i}.json"
        p.write_text(
            "".join(
                json.dumps({"user": u, "ts": ts, "v": v}) + "\n" for (u, ts, v) in rows
            )
        )
        # FileStreamSource orders batches by modification time; same-ms
        # writes would make micro-batch order nondeterministic.
        os.utime(p, (base + i, base + i))
    schema = "user STRING, ts TIMESTAMP, v LONG"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )


def test_tumbling_window_with_watermark(spark, tmp_path):
    stream = _event_stream(
        spark,
        tmp_path,
        [
            [
                ("u1", "2024-01-01 00:05:00", 1),
                ("u1", "2024-01-01 00:55:00", 2),
                ("u2", "2024-01-01 01:10:00", 3),
            ]
        ],
    )
    agg = tumbling_agg(
        stream, "ts", "1 hour", ["user"], [F.sum("v").alias("total")], watermark="10 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    rows = {
        (r["user"], r["win"]["start"].isoformat(), r["total"])
        for r in spark.sql("SELECT * FROM tumbling_t").collect()
    }
    assert rows == {
        ("u1", "2024-01-01T00:00:00", 3),
        ("u2", "2024-01-01T01:00:00", 3),
    }


def test_session_window(spark, tmp_path):
    stream = _event_stream(
        spark,
        tmp_path,
        [
            [
                ("u1", "2024-01-01 00:00:00", 1),
                ("u1", "2024-01-01 00:10:00", 1),  # same session (gap 30m)
                ("u1", "2024-01-01 02:00:00", 1),  # new session
            ]
        ],
    )
    agg = session_agg(
        stream, "ts", "30 minutes", ["user"], [F.count(F.lit(1)).alias("n")],
        watermark="1 minute",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("session_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    ns = sorted(r["n"] for r in spark.sql("SELECT * FROM session_t").collect())
    assert ns == [1, 2]


def _two_streams(spark, tmp_path, imps, clicks):
    import os

    base = time.time() - 3600
    schema = "user STRING, ts TIMESTAMP, v LONG"
    out = []
    for sub, rows in (("imps", imps), ("clicks", clicks)):
        src = tmp_path / sub
        src.mkdir()
        p = src / "b0.json"
        p.write_text(
            "".join(json.dumps({"user": u, "ts": ts, "v": v}) + "\n" for (u, ts, v) in rows)
        )
        os.utime(p, (base, base))
        out.append(spark.readStream.schema(schema).json(str(src)))
    return out


def test_stream_stream_interval_join(spark, tmp_path):
    from etly_spark.streaming import interval_join

    imps = [
        ("u1", "2024-01-01 00:00:00", 1),
        ("u2", "2024-01-01 00:00:00", 2),
        ("u3", "2024-01-01 00:30:00", 3),
    ]
    clicks = [
        ("u1", "2024-01-01 00:10:00", 101),  # within 30 min -> match
        ("u2", "2024-01-01 00:50:00", 102),  # outside horizon -> no match
        ("u3", "2024-01-01 00:29:00", 103),  # before the impression -> no match
    ]
    left, right = _two_streams(spark, tmp_path, imps, clicks)
    joined = interval_join(
        left,
        right,
        keys=["user"],
        left_ts="ts",
        right_ts="ts",
        horizon="30 minutes",
        left_watermark="10 minutes",
        right_watermark="10 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    rows = {(r.user, r.r_v) for r in spark.sql("SELECT user, r_v FROM ssj_t").collect()}
    assert rows == {("u1", 101)}

    # batch twin: same operator, same answer, watermarks no-op
    schema = "user STRING, ts TIMESTAMP, v LONG"
    lb = spark.createDataFrame([(u, __import__("datetime").datetime.fromisoformat(t), v) for u, t, v in imps], schema)
    rb = spark.createDataFrame([(u, __import__("datetime").datetime.fromisoformat(t), v) for u, t, v in clicks], schema)
    batch = interval_join(lb, rb, ["user"], "ts", "ts", "30 minutes", "10 minutes", "10 minutes")
    assert {(r.user, r.r_v) for r in batch.select("user", "r_v").collect()} == {("u1", 101)}


def test_stream_stream_join_state_survives_restart(spark, tmp_path):
    """Join state is checkpointed: an impression buffered in batch 1
    matches a click that only arrives in a LATER restart of the query —
    the state store carried the impression across process boundaries
    (the recovery semantic etly's meta-skip cannot express)."""
    import os

    from etly_spark.streaming import interval_join

    schema = "user STRING, ts TIMESTAMP, v LONG"
    imp_dir, clk_dir = tmp_path / "imps", tmp_path / "clicks"
    imp_dir.mkdir()
    clk_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "joined_out")
    base = time.time() - 3600

    def write(d, name, rows, age):
        p = d / name
        p.write_text(
            "".join(json.dumps({"user": u, "ts": ts, "v": v}) + "\n" for (u, ts, v) in rows)
        )
        os.utime(p, (base + age, base + age))

    def start():
        left = spark.readStream.schema(schema).json(str(imp_dir))
        right = spark.readStream.schema(schema).json(str(clk_dir))
        joined = interval_join(
            left, right, ["user"], "ts", "ts", "30 minutes",
            left_watermark="10 minutes", right_watermark="10 minutes",
        )
        return (
            joined.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # run 1: impression only — no match possible yet
    write(imp_dir, "i0.json", [("u1", "2024-01-01 00:00:00", 1)], 0)
    write(clk_dir, "c0.json", [], 0)
    q = start()
    _await(q)
    assert spark.read.parquet(out).count() == 0

    # run 2 (fresh query object, same checkpoint): the click arrives
    write(clk_dir, "c1.json", [("u1", "2024-01-01 00:20:00", 101)], 1)
    q = start()
    _await(q)
    rows = {(r.user, r.r_v) for r in spark.read.parquet(out).collect()}
    assert rows == {("u1", 101)}


def test_streaming_dedupe(spark, tmp_path):
    stream = _event_stream(
        spark,
        tmp_path,
        [
            [("u1", "2024-01-01 00:00:00", 1), ("u1", "2024-01-01 00:01:00", 1)],
            [("u1", "2024-01-01 00:02:00", 1), ("u2", "2024-01-01 00:03:00", 1)],
        ],
    )
    dd = streaming_dedupe(stream, ["user"], ts_col="ts", watermark="1 hour")
    q = (
        dd.writeStream.format("memory")
        .queryName("dedupe_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    users = sorted(r["user"] for r in spark.sql("SELECT * FROM dedupe_t").collect())
    assert users == ["u1", "u2"]  # u1 kept once across micro-batches


def test_stateful_running_totals(spark, tmp_path):
    stream = _event_stream(
        spark,
        tmp_path,
        [
            [("u1", "2024-01-01 00:00:00", 10), ("u1", "2024-01-01 00:01:00", 5)],
            [("u1", "2024-01-01 00:02:00", 1)],
        ],
    )
    totals = stateful_running_totals(stream, "user", "v")
    q = (
        totals.writeStream.format("memory")
        .queryName("state_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    rows = sorted(
        (r["key"], r["batch_rows"], r["total_rows"], r["total_value"])
        for r in spark.sql("SELECT * FROM state_t").collect()
    )
    # state carries across the two micro-batches (maxFilesPerTrigger=1)
    assert rows == [("u1", 1, 3, 16), ("u1", 2, 2, 15)]


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg: a row arriving behind the watermark is
    dropped; only watermark-closed windows are emitted."""
    stream = _event_stream(
        spark,
        tmp_path,
        [
            # batch 0: one row in [00:00,01:00) and one at 02:00 that
            # advances the watermark to 01:50 (10-minute delay)
            [("u1", "2024-01-01 00:05:00", 1), ("u1", "2024-01-01 02:00:00", 100)],
            # batch 1: keeps the stream moving — the late-row filter uses
            # the watermark with one extra batch of lag, so the 00:00
            # window is evicted (emitted) here
            [("u1", "2024-01-01 02:01:00", 100)],
            # batch 2: late row for the closed 00:00 window → dropped
            # (if accepted it would re-emit a duplicate 00:00 row)
            [("u1", "2024-01-01 00:10:00", 7)],
        ],
    )
    agg = tumbling_agg(
        stream, "ts", "1 hour", ["user"], [F.sum("v").alias("total")],
        watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    rows = {
        (r["user"], r["win"]["start"].isoformat(), r["total"])
        for r in spark.sql("SELECT * FROM late_t").collect()
    }
    # the 00:00 window closed with total=1 — the late 7 was DROPPED; the
    # 02:00 window is still open (not yet past the watermark), so append
    # mode has not emitted it.
    assert rows == {("u1", "2024-01-01T00:00:00", 1)}


def test_streaming_record_level_routing(spark, tmp_path):
    """R1/R6 in streaming mode: a record-extracted $var routes records of
    one micro-batch to different target files."""
    from etly_spark.config import VariableExtraction

    if "stream.TypeVar" not in registry.variable_providers:
        registry.variable_providers.register("stream.TypeVar", lambda: F.col("Type"))

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "f1.log").write_text(
        '{"Id":1,"Name":"a","Type":"x"}\n'
        '{"Id":2,"Name":"b","Type":"y"}\n'
        '{"Id":3,"Name":"c","Type":"x"}\n'
    )
    t = Transfer(
        name="stream-routed",
        source=Source(name=str(src), data_type="stream.Log"),
        target=Target(name=str(tmp_path / "out" / "type=$t" / "b$batchCount.log")),
        transformer="stream.LogToKV",
        variable_extraction=[
            VariableExtraction(name="t", source="source", provider="stream.TypeVar")
        ],
        base_dir=str(tmp_path),
    )
    q = StreamingTransferService(spark).start(t, available_now=True)
    _await(q)
    out_x = tmp_path / "out" / "type=x" / "b0.log"
    out_y = tmp_path / "out" / "type=y" / "b0.log"
    assert out_x.exists() and out_y.exists()
    assert {json.loads(l)["Key"] for l in out_x.read_text().splitlines()} == {1, 3}
    assert {json.loads(l)["Key"] for l in out_y.read_text().splitlines()} == {2}


def test_streaming_multi_schema_dispatch(spark, tmp_path):
    """Single-pass DataTypeMatch in streaming mode (reference
    transfer_object_service.go:180-195): two record types decode in one
    micro-batch pass against the merged schema, an excluded fragment is
    silently skipped (no corrupt count), and unmatched lines parse with
    the default Source.DataType."""
    if "sdt.TypeA" not in registry.schemas:
        registry.schemas.register(
            "sdt.TypeA",
            StructType([StructField("Id", LongType()), StructField("A", StringType())]),
        )
        registry.schemas.register(
            "sdt.TypeB",
            StructType([StructField("Id", LongType()), StructField("B", StringType())]),
        )
        registry.schemas.register(
            "sdt.Default",
            StructType([StructField("Id", LongType()), StructField("Name", StringType())]),
        )

    from etly_spark.config import DataTypeMatch

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "mixed.log").write_text(
        '{"Id":1,"A":"x","kind":"ta"}\n'
        '{"Id":2,"B":"y","kind":"tb"}\n'
        '{"Id":3,"skipme":1}\n'
        '{"Id":4,"Name":"deflt"}\n'
    )
    t = Transfer(
        name="stream-dispatch",
        source=Source(
            name=str(src),
            data_type="sdt.Default",
            data_type_match=[
                DataTypeMatch("ta", "sdt.TypeA"),
                DataTypeMatch("tb", "sdt.TypeB"),
                DataTypeMatch("skipme", ""),
            ],
        ),
        target=Target(name=str(tmp_path / "out" / "batch-$batchCount.log")),
        base_dir=str(tmp_path),
    )
    svc = StreamingTransferService(spark)
    q = svc.start(t, available_now=True)
    _await(q)

    out = (tmp_path / "out" / "batch-0.log").read_text().strip().splitlines()
    recs = {json.loads(ln)["Id"]: json.loads(ln) for ln in out}
    assert recs[1]["A"] == "x" and "B" not in recs[1]
    assert recs[2]["B"] == "y" and "A" not in recs[2]
    assert recs[4]["Name"] == "deflt"
    assert 3 not in recs

    meta = Meta.load(str(src / ".etly_meta.json"))
    om = next(iter(meta.processed.values()))
    assert om.record_processed == 3
    assert om.record_errors == 0  # excluded line never counted corrupt
    assert not meta.errors


def test_streaming_parquet_dataset_sink(spark, tmp_path):
    """The columnar dataset sink through the streaming path: foreachBatch
    shares _write_routed, so a parquet Target works per micro-batch with
    checkpoint exactly-once intact."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "f1.log").write_text('{"Id":1,"Name":"a","Type":"x"}\n{"Id":2,"Name":"b","Type":"y"}\n')
    t = Transfer(
        name="stream-pq",
        source=Source(name=str(src), data_type="stream.Log"),
        target=Target(
            name=str(tmp_path / "out" / "batch=$batchCount"), data_format="parquet"
        ),
        transformer="stream.LogToKV",
        base_dir=str(tmp_path),
    )
    svc = StreamingTransferService(spark)
    q = svc.start(t, available_now=True)
    _await(q)
    d0 = spark.read.parquet(str(tmp_path / "out" / "batch=0"))
    assert {(r.Key, r.Value) for r in d0.collect()} == {(1, "a/x"), (2, "b/y")}

    # second file → second micro-batch dataset; first untouched
    (src / "f2.log").write_text('{"Id":3,"Name":"c","Type":"z"}\n')
    q = svc.start(t, available_now=True)
    _await(q)
    d1 = spark.read.parquet(str(tmp_path / "out" / "batch=1"))
    assert {(r.Key, r.Value) for r in d1.collect()} == {(3, "c/z")}
    assert spark.read.parquet(str(tmp_path / "out" / "batch=0")).count() == 2


def test_streaming_warc_source_exactly_once(spark, tmp_path):
    """DataFormat 'warc' streams: the binaryFile file source discovers
    new .warc.gz objects incrementally; each record row lands once
    across restarts (shared kernel with the batch path)."""
    from etly_spark.operators.warc import encode_warc

    def _warc_bytes(uri: str, body: bytes) -> bytes:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body)
        return encode_warc(
            [({"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:1>",
               "WARC-Date": "2026-01-01T00:00:00Z", "WARC-Target-URI": uri,
               "Content-Type": "application/http; msgtype=response"}, http)],
            per_record_gzip=True,
        )

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "c1.warc.gz").write_bytes(
        _warc_bytes("https://a.example/1", b"<html><body><p>one</p></body></html>")
    )
    t = Transfer(
        name="stream-warc",
        source=Source(name=str(tmp_path / "in"), data_format="warc"),
        target=Target(name=str(tmp_path / "out" / "crawl-$batchCount.jsonl")),
        base_dir=str(tmp_path),
    )
    svc = StreamingTransferService(spark)
    _await(svc.start(t, available_now=True))
    out1 = (tmp_path / "out" / "crawl-0.jsonl").read_text().strip().splitlines()
    assert len(out1) == 1
    rec = json.loads(out1[0])
    assert rec["uri"] == "https://a.example/1" and rec["text"] == "one"

    # a new crawl shard arrives; only IT is processed
    (src / "c2.warc.gz").write_bytes(
        _warc_bytes("https://a.example/2", b"<html><body><p>two</p></body></html>")
    )
    _await(svc.start(t, available_now=True))
    out2 = (tmp_path / "out" / "crawl-1.jsonl").read_text().strip().splitlines()
    assert [json.loads(ln)["text"] for ln in out2] == ["two"]

    # no new shards: no batch-2 output
    _await(svc.start(t, available_now=True))
    assert sorted(p.name for p in (tmp_path / "out").glob("*.jsonl")) == [
        "crawl-0.jsonl", "crawl-1.jsonl",
    ]


def test_streaming_compressed_source_binaryfile_route(spark, tmp_path):
    """Source.Compression in streaming mode: extension-less gzip
    objects stream through the binaryFile + shared line kernel route
    (the text source would read the compressed bytes as garbage)."""
    import gzip as _gz

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "part-000").write_bytes(
        _gz.compress(b'{"Id":5,"Name":"z","Type":"x"}\n')
    )
    t = Transfer(
        name="stream-forced-gz",
        source=Source(name=str(tmp_path / "in"), data_type="stream.Log",
                      compression="gzip"),
        target=Target(name=str(tmp_path / "out" / "c-$batchCount.log")),
        transformer="stream.LogToKV",
        base_dir=str(tmp_path),
    )
    svc = StreamingTransferService(spark)
    _await(svc.start(t, available_now=True))
    lines = (tmp_path / "out" / "c-0.log").read_text().strip().splitlines()
    assert [json.loads(ln)["Key"] for ln in lines] == [5]

    # second shard arrives -> exactly-once continuation
    (src / "part-001").write_bytes(
        _gz.compress(b'{"Id":6,"Name":"w","Type":"y"}\n')
    )
    _await(svc.start(t, available_now=True))
    lines2 = (tmp_path / "out" / "c-1.log").read_text().strip().splitlines()
    assert [json.loads(ln)["Key"] for ln in lines2] == [6]


def test_streaming_binaryfile_routes_skip_zero_byte(spark, tmp_path):
    """Review find: zero-byte objects (upload markers) must not poison
    the binaryFile streaming routes - batch skips them at list time."""
    import gzip as _gz

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "part-000").write_bytes(
        _gz.compress(b'{"Id":7,"Name":"k","Type":"x"}\n')
    )
    (src / "part-empty").write_bytes(b"")
    t = Transfer(
        name="stream-zero-byte",
        source=Source(name=str(tmp_path / "in"), data_type="stream.Log",
                      compression="gzip"),
        target=Target(name=str(tmp_path / "out" / "z-$batchCount.log")),
        transformer="stream.LogToKV",
        base_dir=str(tmp_path),
    )
    _await(StreamingTransferService(spark).start(t, available_now=True))
    lines = (tmp_path / "out" / "z-0.log").read_text().strip().splitlines()
    assert [json.loads(ln)["Key"] for ln in lines] == [7]


def test_streaming_cdx_index(spark, tmp_path):
    """DataFormat 'cdx' streams: new shards get indexed incrementally."""
    from etly_spark.operators.warc import encode_warc

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: 5\r\n\r\nhello")
    (src / "s0.warc.gz").write_bytes(encode_warc(
        [({"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:1>",
           "WARC-Date": "2026-01-01T00:00:00Z",
           "WARC-Target-URI": "https://e.com/1",
           "Content-Type": "application/http; msgtype=response"}, body)],
        per_record_gzip=True,
    ))
    t = Transfer(
        name="stream-cdx",
        source=Source(name=str(tmp_path / "in"), data_format="cdx"),
        target=Target(name=str(tmp_path / "out" / "i-$batchCount.jsonl")),
        base_dir=str(tmp_path),
    )
    _await(StreamingTransferService(spark).start(t, available_now=True))
    rows = [json.loads(l) for l in
            (tmp_path / "out" / "i-0.jsonl").read_text().splitlines()]
    assert len(rows) == 1
    assert rows[0]["uri"] == "https://e.com/1" and rows[0]["compressed"]
