"""BigQuery sink (K2) + schema-file → StructType converter.

Reference parity:
- URL form ``bg://project/dataset.table`` (transfer_service.go:585-597).
- Schema file: BigQuery JSON field list — name/type/mode/fields, nested
  RECORD with mode REPEATED (pkg/bigquery/big_query_schema.go:11-16,
  29-65); types are uppercased strings (big_query_schema.go:52).
- Load semantics: CreateIfNeeded + WriteAppend, file-based (indirect)
  load rather than per-record streaming (big_query.go:102,111-112) →
  spark-bigquery-connector ``writeMethod=indirect`` + ``mode("append")``.

The connector jar is not in this container, so the writer is gated; the
URL parsing, schema conversion, and option mapping are real and tested.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_BQ_URL = re.compile(r"^b[gq]://(?P<project>[^/]+)/(?P<dataset>[^.]+)\.(?P<table>.+)$")

_TYPE_MAP: dict[str, DataType] = {
    "STRING": StringType(),
    "BYTES": BinaryType(),
    "INTEGER": LongType(),
    "INT64": LongType(),
    "FLOAT": DoubleType(),
    "FLOAT64": DoubleType(),
    "NUMERIC": DecimalType(38, 9),
    "BIGNUMERIC": DecimalType(38, 18),
    "BOOLEAN": BooleanType(),
    "BOOL": BooleanType(),
    "TIMESTAMP": TimestampType(),
    "DATETIME": TimestampType(),
    "DATE": DateType(),
}


def parse_bq_url(url: str) -> tuple[str, str, str]:
    """``bg://project/dataset.table`` → (project, dataset, table)."""
    m = _BQ_URL.match(url)
    if not m:
        raise ValueError(f"invalid BigQuery target URL: {url!r}")
    return m.group("project"), m.group("dataset"), m.group("table")


def bq_field_to_spark(field: dict) -> StructField:
    """One BQ schema entry → StructField (big_query_schema.go:44-65)."""
    name = field["name"]
    btype = str(field.get("type", "STRING")).upper()
    mode = str(field.get("mode", "NULLABLE")).upper()
    if btype in ("RECORD", "STRUCT"):
        inner: DataType = StructType(
            [bq_field_to_spark(f) for f in field.get("fields", [])]
        )
    else:
        if btype not in _TYPE_MAP:
            raise ValueError(f"unsupported BigQuery type: {btype!r}")
        inner = _TYPE_MAP[btype]
    if mode == "REPEATED":
        inner = ArrayType(inner)
    return StructField(name, inner, nullable=(mode != "REQUIRED"))


def bq_schema_to_struct(schema_json: str | list) -> StructType:
    """BQ schema JSON (string or parsed list) → StructType."""
    fields = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    if isinstance(fields, dict) and "fields" in fields:
        fields = fields["fields"]
    return StructType([bq_field_to_spark(f) for f in fields])


def load_schema_file(path: str) -> StructType:
    with open(path) as fh:
        return bq_schema_to_struct(fh.read())


def write_bigquery(
    df: DataFrame,
    target_url: str,
    *,
    temp_gcs_bucket: str | None = None,
    write_method: str = "indirect",
) -> None:
    """Append-load a DataFrame into BigQuery (K2).

    Indirect write = files staged to GCS then one load job — the exact
    shape of the reference's URI-based load (big_query.go:62-141), with
    the connector owning retry/cancel.
    """
    project, dataset, table = parse_bq_url(target_url)
    writer = (
        df.write.format("bigquery")
        .option("parentProject", project)
        .option("writeMethod", write_method)
        .mode("append")
    )
    if temp_gcs_bucket:
        writer = writer.option("temporaryGcsBucket", temp_gcs_bucket)
    try:
        writer.save(f"{project}.{dataset}.{table}")
    except Exception as e:  # pragma: no cover — connector absent here
        raise NotImplementedError(
            "spark-bigquery-connector unavailable in this environment"
        ) from e
