"""Event-time operators for the streaming surface (absent in the
reference — its "TimeWindow" is a look-back path enumeration,
transfer_service.go:820-861; no event time, no watermark. SURVEY §2.2).

These helpers work on BOTH batch and streaming DataFrames — `window()`
/ `session_window()` are ordinary Catalyst expressions; watermarks and
state only engage on streams. The batch query catalog reuses them so
the *same* operator definitions are DuckDB-oracle-checked, and the
streaming tests run them with real triggers/watermarks.

Scale: windowed aggregation shuffles once on (keys, window); state store
size is bounded by the watermark horizon; stateful pandas ops stream
Arrow batches per group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd


def _watermarked(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows; late rows beyond the watermark
    are dropped (streaming) — the semantics etly approximates by re-
    scanning a look-back window per run."""
    d = _watermarked(df, ts_col, watermark)
    return d.groupBy(F.window(ts_col, duration).alias("win"), *keys).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    d = _watermarked(df, ts_col, watermark)
    return d.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows (session_window merges rows whose ts are
    within `gap` of the session's span)."""
    d = _watermarked(df, ts_col, watermark)
    return d.groupBy(F.session_window(ts_col, gap).alias("win"), *keys).agg(*aggs)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    horizon: str,
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: right rows within
    ``[left_ts, left_ts + horizon]`` of a matching-key left row (the
    impression→click attribution shape). On streams BOTH sides carry
    watermarks and the join condition carries the time bound — exactly
    what Spark requires to expire join state, so the state store holds
    only `horizon + watermark` worth of rows at any corpus rate;
    without the bound a stream-stream join buffers forever. Outer
    variants emit unmatched rows once the watermark passes the bound.
    Works identically on batch frames (watermarks no-op) — the batch
    twin is oracle-checked as q13's range join; this operator is the
    streaming-native form.
    """
    lt, rt = f"l_{left_ts}", f"r_{right_ts}"
    lw = _watermarked(left, left_ts, left_watermark).withColumnRenamed(left_ts, lt)
    # prefix every right column so the joined schema is unambiguous
    rw = _watermarked(right, right_ts, right_watermark)
    rw = rw.select([F.col(c).alias(f"r_{c}") for c in rw.columns])
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"r_{k}"))
    cond = (
        cond
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, how)


def streaming_dedupe(
    df: DataFrame, keys: list[str], ts_col: str | None = None, watermark: str | None = None
) -> DataFrame:
    """Exact streaming dedup: state = keys seen inside the watermark
    horizon. With a watermark the state store self-expires — the
    unbounded-state footgun of naive dedup at 100 TB/day is bounded."""
    if ts_col and watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


# ---------------------------------------------------------------- #
# Custom stateful operator: per-key running totals across batches
# (applyInPandasWithState — the "arbitrary Go callback with state"
# slot in etly's model, here with managed, fault-tolerant state).
# ---------------------------------------------------------------- #

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("batch_rows", LongType()),
        StructField("total_rows", LongType()),
        StructField("total_value", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("total_rows", LongType()), StructField("total_value", LongType())]
)


def stateful_running_totals(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Running (rows, sum) per key, carried in managed state across
    micro-batches. Output: one row per key per batch it appears in."""

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        rows = 0
        value = 0
        for pdf in pdfs:
            rows += len(pdf)
            value += int(pdf[value_col].sum()) if len(pdf) else 0
        if state.exists:
            prev_rows, prev_value = state.get
        else:
            prev_rows, prev_value = 0, 0
        state.update((prev_rows + rows, prev_value + value))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "batch_rows": [rows],
                "total_rows": [prev_rows + rows],
                "total_value": [prev_value + value],
            }
        )

    return (
        df.groupBy(F.col(key_col).cast("string").alias(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
