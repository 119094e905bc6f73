"""Registry of correctness-checked queries.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string DuckDB can run over the same
parquet tables. Cross-engine conventions that make value-hash parity hold:

- money/rate doubles are cast to exact DECIMAL before aggregation (sums
  become order-independent and bit-identical across engines), and final
  aggregates are cast back to DOUBLE;
- the shared deterministic hash is md5 hex (identical in both engines);
- timestamps are TIMESTAMP_NTZ / naive and usually projected as formatted
  strings;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a Spark query builder with its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.spark for n, s in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}
