"""Event-time window operators as one oracle-checked batch query.

These exercise the SAME helpers the streaming surface uses
(etly_spark.streaming.windows) — window()/session_window() are ordinary
Catalyst expressions, so running them on the batch events table puts the
streaming operator semantics under the DuckDB correctness gate; the
streaming tests then cover triggers/watermark/state on top.

The three window shapes (tumbling / sliding / session) are union'd into
a single catalog entry with a `wkind` tag so the external driver's
50-query check covers all of them in one row; each branch still runs
its own dedicated helper and plan.

Scale: one shuffle on (key, window) per branch; tumbling windows are
computed row-side (no explode), sliding emits one row per covering
window, sessions merge in the aggregation. The union is plan-level
(each branch independent) — no extra shuffle is introduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etly_spark.io.tables import load_table
from etly_spark.queries.catalog import query
from etly_spark.queries.relational import FUNNEL_SQL
from etly_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


@query(
    "q19_event_time_windows",
    oracle="""
    SELECT 'tumbling' AS wkind,
           strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type AS grp,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS metric
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS wkind, win_start, 'ALL' AS grp, n,
           CAST(users AS DOUBLE) AS metric
    FROM (
      SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
             COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS users
      FROM (
        SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
                       time_bucket(INTERVAL 30 MINUTE, ts)]) AS win_start,
               user_id
        FROM events
      )
      GROUP BY 1
    )
    UNION ALL
    SELECT 'session' AS wkind,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(user_id AS VARCHAR) AS grp,
           COUNT(*) AS n,
           0.0 AS metric
    FROM (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
    )
    GROUP BY user_id, sess_id
    """
    + f"""
    UNION ALL
    SELECT 'funnel' AS wkind, '' AS win_start, stage AS grp,
           users AS n, conv_from_prev AS metric
    FROM ({FUNNEL_SQL})
    UNION ALL
    SELECT 'cohort' AS wkind, win_start, grp, n, metric FROM (
      WITH first AS (
        SELECT user_id, time_bucket(INTERVAL 1 DAY, MIN(ts)) AS cohort
        FROM events GROUP BY 1
      ), sizes AS (
        SELECT cohort, COUNT(*) AS n0 FROM first GROUP BY 1
      ), act AS (
        SELECT f.cohort,
               date_diff('day', f.cohort, time_bucket(INTERVAL 1 DAY, e.ts)) AS d,
               e.user_id
        FROM (SELECT DISTINCT user_id, time_bucket(INTERVAL 1 DAY, ts) AS ts
              FROM events) e
        JOIN first f USING (user_id)
      )
      SELECT strftime(act.cohort, '%Y-%m-%d %H:%M:%S') AS win_start,
             'd' || lpad(CAST(d AS VARCHAR), 3, '0') AS grp,
             COUNT(*) AS n,
             round(COUNT(*) / CAST(ANY_VALUE(n0) AS DOUBLE), 6) AS metric
      FROM act JOIN sizes ON act.cohort = sizes.cohort
      GROUP BY act.cohort, d
    )
    ORDER BY wkind, win_start, grp
    """,
    doc="Event-time analytics, five shapes in one checked row: "
    "tumbling 1-hour per event_type (metric = decimal-exact value sum), "
    "sliding 1 h / 30 min global (metric = distinct users), native "
    "session_window() 30-min gap per user (oracle derives identical "
    "sessions via gaps-and-islands), and the sequential funnel "
    "(view → click → purchase, each step within 7 days of the previous "
    "— per-stage first-event times via conditional aggregation chained "
    "through two user-keyed joins; counts collapse to one row exploded "
    "into stage rows, so no cross join and no driver loop), and cohort "
    "retention (users bucketed by first-active day; per (cohort, "
    "day-offset) active count + retained fraction — two user-keyed "
    "shuffles plus a broadcast of the day-cardinality cohort sizes). "
    "Streaming operator semantics, batch-checked.",
)
def q19_event_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    tumbling = tumbling_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("metric"),
        ],
    ).select(
        F.lit("tumbling").alias("wkind"),
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.col("event_type").alias("grp"),
        "n",
        "metric",
    )

    sliding = sliding_agg(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        [],
        [F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("users")],
    ).select(
        F.lit("sliding").alias("wkind"),
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.lit("ALL").alias("grp"),
        "n",
        F.col("users").cast("double").alias("metric"),
    )

    session = session_agg(
        ev, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")]
    ).select(
        F.lit("session").alias("wkind"),
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.col("user_id").cast("string").alias("grp"),
        "n",
        F.lit(0.0).alias("metric"),
    )

    # funnel branch (queries/relational.py:funnel_conversion_stages):
    # the sequential view→click→purchase operator, mapped into the
    # event-time row shape (no window start — funnel rows are stages)
    from etly_spark.queries.relational import funnel_conversion_stages

    funnel = funnel_conversion_stages(spark, sf_dir).select(
        F.lit("funnel").alias("wkind"),
        F.lit("").alias("win_start"),
        F.col("stage").alias("grp"),
        F.col("users").alias("n"),
        F.col("conv_from_prev").alias("metric"),
    )

    # cohort retention: users grouped by first-active day; per
    # (cohort, day-offset) the active-user count and the retained
    # fraction of the cohort. Two user-keyed shuffles (per-user min,
    # activity join — the first-event table partitions WITH the events
    # on user_id) + a broadcast of the day-cardinality cohort sizes.
    cohort_day = F.date_trunc("day", F.col("ts"))
    # the per-user first-event aggregate feeds BOTH the cohort sizes
    # and the activity join — persist (scoped: released at the next
    # catalog query) so the full-events pass runs once, not twice
    from etly_spark.queries.catalog import scoped_persist

    first = scoped_persist(
        ev.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("cohort")),
        eager=False,
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("n0"))
    act = (
        ev.select("user_id", cohort_day.alias("day"))
        .distinct()
        .join(first, "user_id")
        .select("cohort", F.datediff(F.col("day"), F.col("cohort")).alias("d"))
        .groupBy("cohort", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cohort = act.join(F.broadcast(sizes), "cohort").select(
        F.lit("cohort").alias("wkind"),
        F.date_format("cohort", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.concat(F.lit("d"), F.lpad(F.col("d").cast("string"), 3, "0")).alias("grp"),
        "n",
        F.round(F.col("n") / F.col("n0"), 6).alias("metric"),
    )

    return (
        tumbling.unionByName(sliding)
        .unionByName(session)
        .unionByName(funnel)
        .unionByName(cohort)
        .orderBy("wkind", "win_start", "grp")
    )
