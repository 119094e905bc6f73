"""Query catalog: every operator exposed as a (Spark builder, DuckDB oracle) pair.

Importing this package registers all queries into ``catalog.REGISTRY``.
"""

from etly_spark.queries.catalog import REGISTRY, QuerySpec, oracle_sql_map, query, query_map  # noqa: F401

# Register all query modules (import side effects populate REGISTRY).
from etly_spark.queries import relational  # noqa: E402,F401
from etly_spark.queries import etly_ops  # noqa: E402,F401
from etly_spark.queries import dedup  # noqa: E402,F401
from etly_spark.queries import similarity  # noqa: E402,F401
from etly_spark.queries import text  # noqa: E402,F401
from etly_spark.queries import multimodal  # noqa: E402,F401
from etly_spark.queries import windows  # noqa: E402,F401
