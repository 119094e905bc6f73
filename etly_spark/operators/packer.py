"""Materializing sequence packer — the training-shard end product.

``text_curation_split``'s 'pack' variant reports packing STATISTICS;
this operator produces the actual artifact a pretraining job reads:
documents' token ids concatenated in a deterministic order and split
into fixed-length sequences (the standard concat-and-split, boundary
docs straddling adjacent sequences).

Scale design: the one unavoidable shuffle is the token stream itself —
each token is routed to the sequence that owns it, keyed by
(group, seq_no), a high-NDV key that is BALANCED BY CONSTRUCTION
(every full sequence holds exactly ``seq_len`` tokens, so no reducer
sees more than seq_len rows per key). Document offsets come from the
banded two-phase prefix sum (operators/prefix.py) — no window
partitioned on a group key, no driver-side action anywhere; the whole
construction is one lazy DAG. Integral arithmetic end-to-end
(``div`` for the sequence index — double division would round past
2^53 tokens).

Reference parity: none (SURVEY §2.3 training-data scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etly_spark.operators.prefix import banded_running_sum, with_range_band

__all__ = ["pack_token_sequences"]


def pack_token_sequences(
    df: DataFrame,
    *,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pack per-document token-id arrays into fixed ``seq_len``
    sequences, concatenating documents in ascending ``id_col`` order
    within each group (``group_cols``, e.g. ['lang']; None = one global
    stream). Returns one row per sequence:
    (group_cols..., seq_no, token_ids, n_tokens, n_docs) — the final
    sequence of each group may be short (no padding; the trainer pads).
    Deterministic at any partitioning/cluster size: order is a pure
    function of (group, doc_id, position)."""
    groups = list(group_cols or [])
    if not groups:
        # constant group: with_range_band's per-part stats aggregate
        # needs at least one key column to broadcast-join back on
        df = df.withColumn("_pk_g", F.lit(0))
        groups_eff = ["_pk_g"]
    else:
        groups_eff = groups
    base = df.select(*groups_eff, id_col, F.col(ids_col).alias("_ids")).withColumn(
        "_n", F.size("_ids")
    )
    cum = banded_running_sum(
        with_range_band(base, groups_eff, id_col),
        groups_eff,
        F.col("_band"),
        [F.col(id_col)],
        F.col("_n"),
        "_cum",
    )
    toks = (
        cum.withColumn("_start", F.col("_cum") - F.col("_n"))
        .select(
            *groups_eff,
            id_col,
            "_start",
            F.posexplode("_ids").alias("_i", "_tid"),
        )
        .withColumn("_gpos", F.col("_start") + F.col("_i"))
        .withColumn("seq_no", F.expr(f"_gpos div {int(seq_len)}"))
    )
    out = toks.groupBy(*groups_eff, "seq_no").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_gpos", "_tid"))),
            lambda x: x["_tid"],
        ).alias("token_ids"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    if not groups:
        out = out.drop("_pk_g")
    # No final orderBy: a global sort over every packed sequence would
    # be a second full-stream exchange, and shard writers don't need a
    # total order — (group, seq_no) identifies each row; callers that
    # materialize ordered shards sort explicitly at write time.
    return out
