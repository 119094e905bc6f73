"""Streaming twin of the batch rollup fold (operators/incremental_agg).

A continuous ingest keeps corpus statistics current by folding each
micro-batch's partial aggregate into the same durable state the batch
pipeline uses: epoch = the foreachBatch epoch_id, so a replayed
micro-batch (crash between fold and checkpoint commit) overwrites its
own partial — the idempotent-foreachBatch pattern; exactly-once lands
on the checkpoint. Unlike an in-memory streaming aggregation with
``outputMode("complete")``, the state here survives query restarts,
is readable by ANY batch consumer mid-stream via ``incremental_agg.
read``, and never holds unbounded keys in executor state stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from etly_spark.operators import incremental_agg as IA


def start_rollup(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    *,
    keys: list[str],
    aggregates: dict[str, str],
    compact_threshold: int = 16,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a durable keyed rollup from a stream. ``aggregates``
    uses the config-level spec ('count' | 'sum:<col>' | 'min:<col>' |
    'max:<col>' — incremental_agg.rollup_plan)."""
    partial_cols, merges = IA.rollup_plan(aggregates)

    def fold_batch(bdf: DataFrame, epoch_id: int) -> None:
        IA.fold(
            state_dir,
            bdf.groupBy(*keys).agg(*partial_cols),
            epoch_id,
            keys=keys,
            merges=merges,
        )
        IA.compact(
            bdf.sparkSession,
            state_dir,
            keys=keys,
            merges=merges,
            threshold=compact_threshold,
        )

    writer = stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
