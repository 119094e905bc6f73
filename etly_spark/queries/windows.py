"""Event-time window operators as oracle-checked batch queries.

These exercise the SAME helpers the streaming surface uses
(etly_spark.streaming.windows) — window()/session_window() are ordinary
Catalyst expressions, so running them on the batch events table puts the
streaming operator semantics under the DuckDB correctness gate; the
streaming tests then cover triggers/watermark/state on top.

Scale: one shuffle on (key, window); tumbling/sliding windows are
computed row-side (no explode for tumbling; sliding emits one row per
covering window), sessions merge in the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etly_spark.io.tables import load_table
from etly_spark.queries.catalog import query
from etly_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


@query(
    "q19_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    doc="Tumbling 1-hour event-time windows per type (streaming operator "
    "semantics, batch-checked).",
)
def q19_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = tumbling_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        ],
    )
    return agg.select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
        "total_value",
    ).orderBy("win_start", "event_type")


@query(
    "q20_sliding_window",
    oracle="""
    WITH expanded AS (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
                     time_bucket(INTERVAL 30 MINUTE, ts)]) AS win_start,
             user_id
      FROM events
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS users
    FROM expanded
    GROUP BY 1
    ORDER BY win_start
    """,
    doc="Sliding windows (1 h / 30 min): every event covered by exactly "
    "two windows; the oracle expands the two covering starts explicitly.",
)
def q20_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = sliding_agg(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        [],
        [F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("users")],
    )
    return agg.select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "n",
        "users",
    ).orderBy("win_start")


@query(
    "q21_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sess_id
    ORDER BY user_id, session_start
    """,
    doc="Native session_window() (30-min gap) per user — one row per "
    "session; oracle derives identical sessions via gaps-and-islands.",
)
def q21_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = session_agg(
        ev, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n_events")]
    )
    return agg.select(
        "user_id",
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    ).orderBy("user_id", "session_start")
