"""Reference-operator semantics as correctness-checked queries.

Each query re-expresses one operator family from SURVEY §2.1 over the
synthetic tables, so the DuckDB oracle gate covers the *semantics* the
pipeline engine (etly_spark.pipeline) implements over files:

- F3 transformer projection (transformer.go:7-31)       → etly_transform
- F1 filter + skip counters (filter.go, transfer.go:76) → etly_filter_counts
- F2/F4 enrich + ndjson re-encode (content_enricher.go; transfer.go:46-51)
                                                        → etly_enrich_encode
- R1/R2 mod-bucket routing (util.go:38-52,131-139)      → etly_mod_routing
- S5 per-line type dispatch (config.go:248-251)         → etly_type_dispatch
- R6 variable extraction (util.go:190-242)              → etly_variable_extraction
- R4/W1 date-template partitioning (util.go:27-36)      → etly_date_partition
- E1 corrupt tolerance (transfer.go:17-25)              → etly_corrupt_tolerance
- M2 status roll-up (meta.go:48-61)                     → etly_meta_rollup
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etly_spark.io.tables import load_table
from etly_spark.queries.catalog import query


@query(
    "etly_transform",
    oracle="""
    SELECT event_id AS Key,
           concat(event_type, '/', CAST(user_id AS VARCHAR)) AS Value
    FROM events
    ORDER BY Key
    """,
    doc="F3: 1→1 projection to a new record shape (Log1ToLog2 pattern).",
)
def etly_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("Key"),
        F.concat_ws("/", F.col("event_type"), F.col("user_id").cast("string")).alias("Value"),
    ).orderBy("Key")


@query(
    "etly_filter_counts",
    oracle="""
    SELECT COUNT(*) AS record_read,
           COUNT(*) FILTER (WHERE event_type <> 'error') AS record_processed,
           COUNT(*) FILTER (WHERE event_type = 'error')  AS record_skipped
    FROM events
    """,
    doc="F1 + progress counters: predicate keep/skip accounting "
    "(transfer.go:34,76-77) in one pass.",
)
def etly_filter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keep = F.col("event_type") != "error"
    return ev.agg(
        F.count(F.lit(1)).alias("record_read"),
        F.sum(keep.cast("long")).alias("record_processed"),
        F.sum((~keep).cast("long")).alias("record_skipped"),
    )


@query(
    "etly_enrich_encode",
    oracle="""
    SELECT doc_id,
           concat('{"doc_id":', CAST(doc_id AS VARCHAR),
                  ',"lang":"', lang,
                  '","src":"', source, '"}') AS line
    FROM documents
    ORDER BY doc_id
    """,
    doc="F2 enrichment + F4 single-line JSON re-encode. The JSON line is "
    "assembled explicitly so both engines agree byte-for-byte.",
)
def etly_enrich_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit('{"doc_id":'),
            F.col("doc_id").cast("string"),
            F.lit(',"lang":"'),
            F.col("lang"),
            F.lit('","src":"'),
            F.col("source"),
            F.lit('"}'),
        ).alias("line"),
    ).orderBy("doc_id")


@query(
    "etly_mod_routing",
    oracle="""
    SELECT concat('app-', CAST(((event_id % 4) + 4) % 4 AS VARCHAR), '.log') AS target_key,
           COUNT(*) AS n_records,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY target_key
    """,
    doc="R1/R2: dynamic target routing by computed bucket — records fan "
    "out to templated keys; groupBy == partitionBy(key) write.",
)
def etly_mod_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = F.concat(F.lit("app-"), F.pmod(F.col("event_id"), F.lit(4)).cast("string"), F.lit(".log"))
    return (
        ev.groupBy(key.alias("target_key"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .orderBy("target_key")
    )


@query(
    "etly_type_dispatch",
    oracle="""
    SELECT CASE WHEN contains(props, '"k": 1') THEN 'typeA'
                WHEN contains(props, '"k": 2') THEN 'typeB'
                ELSE 'other' END AS data_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k_variant
    FROM events
    GROUP BY 1
    ORDER BY data_type
    """,
    doc="S5: per-line substring dispatch selects the decode schema; "
    "payload parsed through BOTH Spark JSON paths — the string path "
    "(get_json_object) and Spark 4's binary VARIANT path "
    "(parse_json + variant_get, the columnar semi-structured encoding "
    "that avoids re-tokenizing JSON per extraction at scale) — and "
    "both must agree with the oracle's json_extract.",
)
def etly_type_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dt = (
        F.when(F.col("props").contains('"k": 1'), F.lit("typeA"))
        .when(F.col("props").contains('"k": 2'), F.lit("typeB"))
        .otherwise(F.lit("other"))
    )
    return (
        ev.groupBy(dt.alias("data_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            # try_parse_json: malformed props must yield NULL like
            # get_json_object / the oracle's json_extract, not abort
            F.sum(
                F.expr("cast(variant_get(try_parse_json(props), '$.k') as bigint)")
            ).alias("sum_k_variant"),
        )
        .orderBy("data_type")
    )


@query(
    "etly_variable_extraction",
    oracle="""
    SELECT regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    ORDER BY CAST(src_num AS INT)
    """,
    doc="R6: regex capture-group variable from a source identifier → "
    "routing/partition variable.",
)
def etly_variable_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.regexp_extract("source", "src([0-9]+)", 1).alias("src_num"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy(F.col("src_num").cast("int"))
    )


@query(
    "etly_date_partition",
    oracle="""
    SELECT strftime(ts, '%Y%m%d') AS dt, count(*) AS n,
           COUNT(DISTINCT user_id) AS users
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-12'
    GROUP BY 1
    ORDER BY dt
    """,
    doc="R4/W1: <dateFormat:yyyyMMdd> template ≡ date partition key; the "
    "look-back window is a partition-pruned range predicate.",
)
def etly_date_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-05").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-12").cast("timestamp_ntz"))
    )
    return (
        ev.groupBy(F.date_format("ts", "yyyyMMdd").alias("dt"))
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("users"))
        .orderBy("dt")
    )


@query(
    "etly_corrupt_tolerance",
    oracle="""
    WITH lines AS (
      SELECT event_id,
             CASE WHEN event_id % 97 = 0 THEN substr(props, 1, 3) ELSE props END AS line
      FROM events
    )
    SELECT COUNT(*) AS record_read,
           COUNT(*) FILTER (WHERE json_valid(line)) AS record_processed,
           COUNT(*) FILTER (WHERE NOT json_valid(line)) AS record_errors
    FROM lines
    """,
    doc="E1: PERMISSIVE decode — corrupt lines counted, tolerated below "
    "MaxErrorCounts (transfer.go:17-25). Corruption injected "
    "deterministically for the parity check.",
)
def etly_corrupt_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    line = F.when(F.col("event_id") % 97 == 0, F.substring("props", 1, 3)).otherwise(
        F.col("props")
    )
    # valid iff parseable json — from_json corrupt-record marker
    parsed = F.from_json(
        line, "k INT, _corrupt_record STRING", {"columnNameOfCorruptRecord": "_corrupt_record"}
    )
    ok = parsed.isNotNull() & parsed["_corrupt_record"].isNull()
    return ev.agg(
        F.count(F.lit(1)).alias("record_read"),
        F.sum(ok.cast("long")).alias("record_processed"),
        F.sum((~ok).cast("long")).alias("record_errors"),
    )


@query(
    "etly_meta_rollup",
    oracle="""
    SELECT COALESCE(concat('file_', CAST(event_id // 1000 AS VARCHAR)), 'TOTAL') AS resource,
           COUNT(*) AS record_processed,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY ROLLUP (concat('file_', CAST(event_id // 1000 AS VARCHAR)))
    ORDER BY resource
    """,
    doc="M2: per-resource status + grand-total roll-up (meta.go:48-61).",
)
def etly_meta_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    res = F.concat(F.lit("file_"), (F.col("event_id") / 1000).cast("long").cast("string"))
    return (
        ev.withColumn("resource0", res)
        .rollup("resource0")
        .agg(F.count(F.lit(1)).alias("record_processed"), F.countDistinct("user_id").alias("users"))
        .select(
            F.coalesce("resource0", F.lit("TOTAL")).alias("resource"),
            "record_processed",
            "users",
        )
        .orderBy("resource")
    )


@query(
    "etly_datastore_source",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="S3 datastore source through the engine's own read_datastore "
    "path (driver dispatch + SQL-over-view, transfer_service.go:343-405 "
    "semantics) — not a direct spark.read: the transfer engine's SQL "
    "source is itself under the oracle gate.",
)
def etly_datastore_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etly_spark.config import Source
    from etly_spark.sources.datastore import read_datastore

    src = Source(
        name="SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
        type="datastore",
        ds_config={"DriverName": "parquet", "Parameters": {"url": sf_dir}},
    )
    return read_datastore(spark, src)
