"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog from ``etly_spark.queries``
(each Spark builder paired with a DuckDB-runnable ANSI-SQL oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etly_spark.queries import oracle_sql_map, query_map
from etly_spark.queries.relational import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary aggregate) on /root/testdata/sf0.001."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
