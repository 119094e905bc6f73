"""io/staging.py — the staged-intermediate contract: build once per
process, atomic commit, dependency-fingerprint invalidation, empty-table
schema round-trip."""

import os
import time

from pyspark.sql import functions as F

from etly_spark.io import staging


def test_stage_builds_once_then_reuses(spark, tmp_path):
    dep = tmp_path / "in.txt"
    dep.write_text("v1")
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("x"))

    for _ in range(3):
        df = staging.stage_table(spark, "t1", build, deps=[str(dep)])
        assert df.count() == 5
    assert len(calls) == 1  # built exactly once, reused from parquet


def test_stage_invalidates_on_dep_change(spark, tmp_path):
    dep = tmp_path / "in.txt"
    dep.write_text("v1")
    calls = []

    def build():
        calls.append(1)
        return spark.range(3)

    staging.stage_table(spark, "t2", build, deps=[str(dep)])
    # mtime granularity: force a visibly different mtime_ns
    time.sleep(0.01)
    dep.write_text("v2-longer")
    staging.stage_table(spark, "t2", build, deps=[str(dep)])
    assert len(calls) == 2  # content change ⇒ new stage identity


def test_stage_keys_are_independent(spark, tmp_path):
    dep = tmp_path / "in.txt"
    dep.write_text("v1")
    a = staging.stage_table(spark, "ka", lambda: spark.range(2), deps=[str(dep)])
    b = staging.stage_table(spark, "kb", lambda: spark.range(7), deps=[str(dep)])
    assert (a.count(), b.count()) == (2, 7)


def test_empty_stage_round_trips_schema(spark):
    df = spark.range(10).filter(F.col("id") < 0).select("id", F.lit("s").alias("tag"))
    out = staging.stage_table(spark, "empty", lambda: df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "tag"]
    # reuse path hits the saved-schema read too
    out2 = staging.stage_table(spark, "empty", lambda: df)
    assert out2.schema == out.schema


def test_concurrent_builders_one_commit(spark):
    """Two threads racing to build the same stage: exactly one commit
    wins the os.rename, the loser adopts it, both read identical rows —
    the P3 parallel-window world where two window DAGs want the same
    staged artifact."""
    import threading

    from etly_spark.io import staging

    key = "race-stage"
    results = []
    errors = []
    barrier = threading.Barrier(2)

    def build():
        return spark.range(100).selectExpr("id", "id * 2 as v")

    def run():
        try:
            barrier.wait()
            df = staging.stage_table(spark, key, build)
            results.append(sorted((r.id, r.v) for r in df.collect()))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(120)
    assert not errors, errors
    assert len(results) == 2 and results[0] == results[1]
    assert results[0][0] == (0, 0) and len(results[0]) == 100
    # later consumers hit the single commit
    before = dict(staging.stats)
    staging.stage_table(spark, key, build).count()
    assert staging.stats["hits"] == before["hits"] + 1


def test_stage_root_is_process_scoped(spark):
    staging.stage_table(spark, "root-check", lambda: spark.range(1))
    assert staging._STAGE_ROOT and os.path.isdir(staging._STAGE_ROOT)
    assert os.path.basename(staging._STAGE_ROOT).startswith("etly_stage_")


def test_bm25_postings_staged_probe(spark):
    """r12 (verdict item 5): bm25 probes the STAGED inverted-postings
    table — rows identical across invocations, the second invocation
    hits the stage instead of rebuilding, and the probe plan reaches
    the parquet scan with a pushed term filter (the index-lookup
    shape, not a tokenize pass)."""
    from pyspark.sql import functions as F

    from etly_spark.queries.text import bm25_postings, text_top_terms

    sf = "/root/testdata/sf0.001"
    r1 = sorted(map(tuple, text_top_terms(spark, sf).collect()))
    before = dict(staging.stats)
    r2 = sorted(map(tuple, text_top_terms(spark, sf).collect()))
    assert r1 == r2 and any(v == "bm25" for v, *_ in r1)
    assert staging.stats["hits"] > before["hits"]
    assert staging.stats["misses"] == before["misses"]
    plan = (
        bm25_postings(spark, sf)
        .where(F.col("term").isin(["alpha", "beta"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "term" in plan and "Scan parquet" in plan
