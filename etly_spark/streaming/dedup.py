"""Continuous-ingest sketch-index maintenance.

The 100 TB dedup story is incremental: a crawler streams document
batches forever, and each batch must be near-dup-checked against
EVERYTHING ingested so far without recomputing the corpus sketch. The
two pieces:

- ``start_signature_index`` — a Structured Streaming query that folds
  each micro-batch into a parquet minhash-signature index. Each epoch
  writes its own ``epoch=N`` directory with ``mode("overwrite")``, so a
  replayed micro-batch (crash between write and checkpoint commit)
  overwrites its own output instead of duplicating it — the standard
  idempotent-foreachBatch pattern; exactly-once lands on the
  checkpoint, not on writer luck.
- ``read_signature_index`` — the accumulated (doc_id, sig) table, a
  drop-in for the batch ``minhash_sigs`` stage: signatures are built by
  the SAME bulk builder (operators/sketch.py), so a streamed index is
  bit-identical to a batch-built one and every LSH consumer
  (dedup_incremental_lsh's band-probe shape) can run against it.

Scale: per-trigger work is O(batch) — shingle explode + one hash
aggregate per micro-batch; the index grows one small parquet dir per
epoch (compactable exactly like the meta sidecar); nothing driver-side
grows with history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from etly_spark.operators.sketch import minhash_signatures


def start_signature_index(
    doc_stream: DataFrame,
    index_dir: str,
    checkpoint: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a minhash signature index from a streaming document
    source. ``available_now=True`` drains the backlog then stops (one
    ingest sweep); otherwise the query runs continuously."""

    def fold_batch(bdf: DataFrame, epoch_id: int) -> None:
        sigs = minhash_signatures(bdf, id_col=id_col, text_col=text_col)
        sigs.write.mode("overwrite").parquet(f"{index_dir}/epoch={epoch_id}")

    writer = doc_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_signature_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The accumulated sketch table (id, sig) across all ingested
    epochs — partition-discovered, epoch column dropped (consumers see
    exactly the batch ``minhash_sigs`` shape)."""
    return spark.read.parquet(index_dir).drop("epoch")
