"""Bucketed co-located join: the pre-shuffle technique for repeated
big-table joins at 100 TB — both sides bucketed on the join key land
shuffle-free (zero Exchange) in the join plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    spark.sql("USE buckdemo")
    orders = spark.range(0, 10000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 997).alias("o_custkey"),
    )
    lines = spark.range(0, 30000).select(
        (F.col("id") % 10000).alias("l_orderkey"),
        (F.col("id") % 50 + 1).alias("l_quantity"),
    )
    for name, df, key in [("b_orders", orders, "o_orderkey"), ("b_lines", lines, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(name)
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    spark.sql("USE default")
    spark.sql("DROP DATABASE IF EXISTS buckdemo CASCADE")


def test_bucketed_join_has_no_shuffle(bucketed_tables):
    spark = bucketed_tables
    # disable broadcast so the join would otherwise shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lines").join(
            spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located: bucketed scans satisfy the join distribution — no
        # shuffle anywhere in the join plan
        assert "Exchange" not in plan, plan
        # and it computes the right thing: every line matches exactly
        # one order, so total quantity is preserved through the join
        total = joined.agg(F.sum("l_quantity")).first()[0]
        assert total == sum((i % 50 + 1) for i in range(30000))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
