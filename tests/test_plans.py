"""Physical-plan hygiene gates — the properties that keep the catalog
fast at 100 TB, asserted so they can't silently regress:

- filters reach the parquet scan (PushedFilters non-empty where expected)
- small dimensions broadcast (no shuffle join for nation/customer)
- no accidental CartesianProduct anywhere in the catalog
- multimodal decode runs as Arrow-batched MapInPandas, not row Python
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etly_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    assert any("l_shipdate" in p for p in pushed), plan


def test_star_join_broadcasts_dimensions(spark):
    plan = plan_of(spark, "q2_revenue_per_nation")
    assert "BroadcastHashJoin" in plan
    # column pruning: lineitem scan must not read unused columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "l_comment" not in m.group(1)


def test_no_cartesian_products_anywhere(spark):
    offenders = []
    for name in sorted(REGISTRY):
        plan = plan_of(spark, name)
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == [], f"cartesian products in: {offenders}"


def test_no_row_at_a_time_python_udfs_anywhere(spark):
    """Stay JVM-side or Arrow-batched: a BatchEvalPython node means a
    row-at-a-time Python UDF crept into a hot path — 10-100× slower than
    the pandas/Arrow boundary and the first thing that dies at 100 TB.
    Allowed Python boundaries are ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas only."""
    offenders = []
    for name in sorted(REGISTRY):
        if "BatchEvalPython" in plan_of(spark, name):
            offenders.append(name)
    assert offenders == [], f"row-at-a-time Python UDFs in: {offenders}"


def test_ann_scoring_is_vectorized(spark):
    # The scoring kernel must be the numpy/Arrow path, not interpreted
    # HOF folds: brute-force scores via a mapInPandas BLAS matmul (one
    # corpus scan, query matrix in the closure), LSH/IVF per-pair scores
    # via ArrowEvalPython pandas UDFs. aggregate(zip_with(...)) in this
    # plan would be the 5-10x-slower interpreted regression.
    plan = plan_of(spark, "sim_ann_methods")
    assert "MapInPandas" in plan  # brute-force matmul scorer
    assert "ArrowEvalPython" in plan  # einsum dot/norm pandas UDFs
    assert "zip_with" not in plan and "aggregate(" not in plan


def test_ivf_centroid_collect_is_bounded(spark):
    """The IVF centroid set must be corpus-independent: exactly
    K_CENTROIDS rows reach the driver at any N (the old vec_id % 61
    rule collected N/61 — a driver collect growing with the corpus),
    and the selection plan is a top-k (TakeOrderedAndProject), never a
    global sort or full collect."""
    from etly_spark.io.tables import load_table
    from etly_spark.queries.similarity import K_CENTROIDS, _normed, select_centroids

    s = _normed(load_table(spark, SF, "embeddings"))
    cent = select_centroids(s)
    assert len(cent) == min(K_CENTROIDS, s.count())
    assert list(cent.columns) == ["cent_id", "ce", "cn"]
    # deterministic across runs (hash order, vec_id tiebreak)
    assert list(cent.cent_id) == list(select_centroids(s).cent_id)
    plan = (
        s.select("vec_id")
        .orderBy(((F.col("vec_id") * F.lit(2654435761)) % F.lit(4294967296)))
        .limit(K_CENTROIDS)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_multimodal_decode_is_arrow_batched(spark):
    plan = plan_of(spark, "mm_decode_frames")
    assert "MapInPandas" in plan
    # input pruned to the two used columns before the Python boundary
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "lang" not in m.group(1)


def test_minhash_has_single_sketch_aggregate(spark):
    # the sketch is built by ONE grouped aggregate over the exploded
    # shingle stream (map-side combinable) — HOF lambdas would show up
    # as ArrayAggregate/TransformValues operators in the final plan
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "InMemoryRelation" in plan  # sketch materialized once
