"""Canonical loaders for the synthetic test tables.

One place that knows the quirks of `/root/testdata/sf*`:

- ``events.parquet`` stores TIMESTAMP(NANOS) which Spark's parquet reader
  rejects outright; we read it with ``spark.sql.legacy.parquet.nanosAsLong``
  and convert the long to a micro-second TIMESTAMP_NTZ (integer floor
  division — exactly what DuckDB's ns→µs coercion produces, so oracle
  comparisons line up bit-for-bit).
- Everything else reads as-is; ms-timestamps arrive as TIMESTAMP_NTZ.

At scale these loaders are just `spark.read.parquet` — predicate pushdown,
column pruning and partition pruning all apply; nothing here ever collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etly_spark.session import tune_session

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# fixes region=5 / nation=25 rows; supplier/part/customer grow with SF).
BROADCAST_DIMS = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns epoch → µs epoch → TIMESTAMP_NTZ (matches DuckDB coercion).
        # Integer division: ns values exceed 2^53, double math would round.
        df = df.withColumn(
            "ts", F.to_timestamp_ntz(F.timestamp_micros(F.expr("ts DIV 1000")))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
