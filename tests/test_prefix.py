"""Banded two-phase prefix sums (operators/prefix.py) must be
bit-identical to the single-window form they replace — the de-skew is a
physical-plan change only — and fully lazy (no driver-side jobs at
construction time)."""

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from etly_spark.operators.prefix import (
    banded_row_number,
    banded_running_sum,
    with_range_band,
)


def _skewed(spark):
    # 9:1 skew onto 'en', non-dense ids, duplicate order keys
    return (
        spark.range(2000)
        .selectExpr(
            "id * 7 + 3 as doc_id",
            "case when id % 10 = 0 then 'de' else 'en' end as lang",
            "cast(pmod(hash(id), 97) as long) as v",
            "pmod(hash(id + 1), 50) as key",
        )
    )


def test_running_sum_matches_window(spark):
    df = _skewed(spark)
    band = F.floor(F.col("key") / 7)  # order-preserving in key
    got = banded_running_sum(
        df, ["lang"], band, [F.col("key"), F.col("doc_id")], F.col("v"), "cum"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert (
        got.select("lang", "doc_id", "cum")
        .exceptAll(want.select("lang", "doc_id", "cum"))
        .count()
        == 0
    )
    assert got.count() == want.count()


def test_row_number_matches_window(spark):
    df = _skewed(spark)
    band = F.floor(F.col("key") / 5)
    got = banded_row_number(
        df, ["lang"], band, [F.col("key"), F.col("doc_id")], "rn"
    )
    w = Window.partitionBy("lang").orderBy("key", "doc_id")
    want = df.withColumn("rn", F.row_number().over(w))
    assert (
        got.select("lang", "doc_id", "rn")
        .exceptAll(want.select("lang", "doc_id", "rn"))
        .count()
        == 0
    )


def test_construction_is_lazy(spark):
    """The declarative rewrite's point: building the banded plan must
    launch ZERO Spark jobs (the r7 first cut collected band totals at
    build time, serializing the catalog's branch builds)."""
    df = _skewed(spark)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    banded_running_sum(
        df, ["lang"], F.floor(F.col("key") / 7),
        [F.col("key"), F.col("doc_id")], F.col("v"), "cum",
    )
    with_range_band(df, ["lang"], "doc_id", n_bands=16)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_no_window_partitioned_solely_by_part_col(spark):
    df = _skewed(spark)
    got = banded_running_sum(
        df, ["lang"], F.floor(F.col("key") / 7),
        [F.col("key"), F.col("doc_id")], F.col("v"), "cum",
    )
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    from tests.conftest import single_key_window_re

    bad = single_key_window_re("lang")
    assert not bad.search(plan), "window partitioned solely by part col"


def test_range_band_is_bounded_and_monotone(spark):
    df = _skewed(spark)
    rows = (
        with_range_band(df, ["lang"], "doc_id", n_bands=16)
        .select("lang", "doc_id", "_band")
        .collect()
    )
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append((r["doc_id"], r["_band"]))
    assert len(rows) == df.count()
    for lang, lst in per_lang.items():
        lst.sort()
        bands = [b for _, b in lst]
        assert bands == sorted(bands), f"non-monotone bands for {lang}"
        assert len(set(bands)) <= 16


def test_null_part_values_keep_their_rows(spark):
    """PARTITION BY treats NULL as its own group — real corpora have
    NULL langs. The offsets / range-band joins are null-safe, so no row
    is silently dropped and the NULL group's running sum matches the
    window form."""
    df = spark.range(1000).selectExpr(
        "id as doc_id",
        "case when id % 3 = 0 then NULL else concat('l', id % 2) end as lang",
        "cast(id % 13 as long) as v",
    )
    got = banded_running_sum(
        with_range_band(df, ["lang"], "doc_id", n_bands=8),
        ["lang"],
        F.col("_band"),
        [F.col("doc_id")],
        F.col("v"),
        "cum",
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert got.count() == 1000
    assert (
        got.select("lang", "doc_id", "cum")
        .exceptAll(want.select("lang", "doc_id", "cum"))
        .count()
        == 0
    )


def test_null_order_key_matches_window_nulls_first(spark):
    """A NULL band (NULL order key under Spark's default NULLS FIRST)
    must behave exactly like the window form: null-key rows come first
    and are counted in every later band's offset — not dropped from the
    offsets and double-started at 0 (the review finding)."""
    df = spark.range(300).selectExpr(
        "case when id % 7 = 0 then NULL else id end as k",
        "case when id % 4 = 0 then 'de' else 'en' end as lang",
        "cast(id % 11 as long) as v",
        "id as tie",
    )
    got = banded_running_sum(
        df,
        ["lang"],
        F.floor(F.col("k") / 25),  # NULL k -> NULL band
        [F.col("k"), F.col("tie")],
        F.col("v"),
        "cum",
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("k", "tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert got.count() == 300
    assert (
        got.select("lang", "tie", "cum")
        .exceptAll(want.select("lang", "tie", "cum"))
        .count()
        == 0
    )
