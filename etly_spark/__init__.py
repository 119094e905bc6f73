"""etly_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the data-processing capabilities of the
reference config-driven ETL transfer framework (viant/etly), re-expressed
Spark-first: declarative pipeline specs compile to DataFrame DAGs that
Catalyst plans, plus the relational surface (joins/aggs/windows/SQL) and
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) the reference lacks.

Design notes (100 TB scale):
- Everything is a DataFrame; no driver-side record loops.
- Small dimensions are broadcast; big joins shuffle on explicit keys.
- Pairwise operators (dedup / similarity) always run behind a blocking
  key (LSH band, label, length bucket) so candidate generation is a
  shuffle-join, never a cross join.
- Python stays out of the hot path: built-in column expressions first,
  Arrow-batched pandas UDFs only where semantics demand (multimodal
  decode stubs).
"""

__version__ = "0.1.0"
