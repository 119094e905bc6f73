"""Hot-key stress: prove the skew strategy at a deliberately brutal
key distribution — 50% of the fact side on ONE join/group key.

Two claims measured (the ones the 100 TB design depends on):

1. Join skew is a *runtime* concern, handled by AQE's skew-join split
   (session.py pins spark.sql.adaptive.skewJoin.enabled): the hot
   partition is split into task-sized chunks, so one straggler task
   never serializes the stage.
2. Aggregation skew is a *plan* concern, handled by map-side partial
   aggregation (every groupBy here partial-aggregates before the
   shuffle: the hot key contributes ONE row per map task to the
   shuffle, no salting needed for algebraic aggs). The salted
   two-phase pattern (q26) is for the holistic-agg case.

Usage: python tools/stress_skew.py [sf_dir] [multiplier]
Prints one JSON line with timings and the skew-split evidence.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.io.tables import load_table  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def build_skewed(spark, sf_dir: str, mult: int):
    """Fact table where half of all rows carry custkey=1 (the hot key),
    scaled `mult`x by explode — deterministic, no data files needed."""
    o = load_table(spark, sf_dir, "orders")
    fact = (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(mult))))
        .withColumn(
            "custkey",
            F.when((F.col("o_orderkey") + F.col("rep")) % 2 == 0, F.lit(1)).otherwise(
                F.col("o_custkey")
            ),
        )
        .select("custkey", "o_totalprice")
    )
    return fact


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 2)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("stress-skew")
    fact = build_skewed(spark, sf_dir, mult)
    n = fact.count()
    hot = fact.filter(F.col("custkey") == 1).count()

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_nationkey"
    )

    # sort-merge join against the dim, hot key included. Broadcast is
    # disabled so the skewed SHUFFLE path is what gets measured (at
    # 100 TB the dim side may not broadcast); AQE on/off is the A/B.
    def join_run():
        (
            fact.hint("merge")
            .join(cust, "custkey")
            .groupBy("c_nationkey")
            .agg(F.sum("o_totalprice").alias("rev"), F.count(F.lit(1)).alias("n"))
            .write.format("noop").mode("overwrite").save()
        )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    sec_skew_off = timed(join_run)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # force the splitter to engage even at test-scale partition sizes
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    sec_skew_on = timed(join_run)

    # algebraic agg on the hot key: map-side partial aggregation means
    # the hot key ships one row per map task — measured as the agg
    # completing in the same order as a uniform-key agg
    def agg_run(col):
        fact.groupBy(col).agg(
            F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n")
        ).write.format("noop").mode("overwrite").save()

    sec_agg_hot = timed(lambda: agg_run("custkey"))
    uniform = fact.withColumn("ukey", F.monotonically_increasing_id() % 1000)
    sec_agg_uniform = timed(
        lambda: uniform.groupBy("ukey")
        .agg(F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # 3) Zipf-dimension join (token -> corpus frequency, REAL Zipf data
    # from the documents table): hot/rare split-broadcast join
    # (operators/skew.py) vs one shuffle join. autoBroadcast is disabled
    # for the A/B — the 100 TB premise is a dimension too big to
    # broadcast whole, where only the EXPLICIT top-K broadcast survives.
    from etly_spark.operators.skew import split_broadcast_join

    # Zipf(1) over a 10k-key dimension: key r appears ∝ 1/r, so the
    # top-1024 keys carry ~77% of probe rows (H(1024)/H(10000)) — the
    # token-frequency shape at a controllable scale (the sf documents
    # table's synthetic vocabulary is ~31 near-uniform words, too flat
    # to exercise the head/tail split).
    n_vocab, hot_k = 10_000, 1024
    base = 2_000 * mult  # frequency of rank 1
    ranks = spark.range(1, n_vocab + 1).select(F.col("id").alias("tok"))
    tf = ranks.select(
        "tok",
        F.explode(
            F.sequence(F.lit(1), F.greatest((F.lit(base) / F.col("tok")).cast("int"), F.lit(1)))
        ).alias("rep"),
    ).select("tok")
    freq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    top_frac = (
        freq.orderBy(F.desc("cnt")).limit(hot_k).agg(F.sum("cnt")).collect()[0][0]
        / tf.count()
    )

    def probe_run(joined):
        joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("s")
        ).write.format("noop").mode("overwrite").save()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sec_zipf_shuffle = timed(lambda: probe_run(tf.join(freq, "tok")))
    sec_zipf_split = timed(
        lambda: probe_run(split_broadcast_join(tf, freq, "tok", "cnt", hot_k=hot_k))
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    print(
        json.dumps(
            {
                "rows": n,
                "hot_key_rows": hot,
                "hot_fraction": round(hot / n, 3),
                "join_sec_skewjoin_off": sec_skew_off,
                "join_sec_skewjoin_on": sec_skew_on,
                "agg_sec_hot_key": sec_agg_hot,
                "agg_sec_uniform_key": sec_agg_uniform,
                "zipf_vocab": n_vocab,
                "zipf_hot_k": hot_k,
                "zipf_hot_probe_fraction": round(top_frac, 3),
                "zipf_join_sec_shuffle": sec_zipf_shuffle,
                "zipf_join_sec_split_broadcast": sec_zipf_split,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
