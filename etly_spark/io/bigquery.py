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


# ---------------------------------------------------------------------------
# Load-job orchestration (big_query.go:62-168) — client is injectable so the
# semantics are testable without GCP; the real client would wrap the
# spark-bigquery-connector / google-cloud-bigquery, absent in this container.
# ---------------------------------------------------------------------------

import time as _time
from dataclasses import dataclass as _dataclass, field as _field

KV_SEPARATOR = "--"  # big_query.go:40
PAIR_SEPARATOR = "__"  # big_query.go:42


@_dataclass
class LoadJob:
    """big_query.go:28-36 — everything one load needs."""

    project_id: str
    dataset_id: str
    table_id: str
    uris: list = _field(default_factory=list)
    schema: StructType | None = None
    fail_retry: int = 2


@_dataclass
class BqError:
    """One load-job error; ``location`` is the offending source URI."""

    location: str
    message: str


@_dataclass
class BqJobStatus:
    state: str = "DONE"
    errors: list = _field(default_factory=list)


class BqWaitError(RuntimeError):
    """Transient failure retrieving job status (retryable)."""


def generate_job_id(*kv: str) -> str:
    """key1--val1__key2--val2__... (big_query.go:144-158, following the
    documented BigQuery job-id best practice)."""
    out = []
    for i in range(0, len(kv), 2):
        pair = kv[i] + KV_SEPARATOR
        if i + 1 < len(kv):
            pair += kv[i + 1]
        out.append(pair + PAIR_SEPARATOR)
    return "".join(out)


def run_load_job(
    client,
    job: LoadJob,
    timeout_sec: float,
    *,
    now_unix: int | None = None,
    sleep=_time.sleep,
) -> tuple[BqJobStatus | None, str, str]:
    """One bounded, retried load job (big_query.go:62-141). Returns
    (status, job_id, error_message — '' on success).

    ``client`` duck-type: ``run(job, job_id) -> handle``,
    ``wait(handle, timeout_sec) -> BqJobStatus`` raising ``TimeoutError``
    past the deadline or ``BqWaitError`` on transient status failures,
    ``cancel(handle)``.

    - job id: ProjectID--p__DatasetID--d__TableID--t__Ts--unix__
    - on timeout: the job is cancelled (cancelJob, big_query.go:161-168)
    - on transient status errors: re-wait ``fail_retry`` times with
      3^(i+1)-second backoff (big_query.go:127-139)
    """
    ts = now_unix if now_unix is not None else int(_time.time())
    job_id = generate_job_id(
        "ProjectID", job.project_id,
        "DatasetID", job.dataset_id,
        "TableID", job.table_id,
        "Ts", str(ts),
    )
    try:
        handle = client.run(job, job_id)
    except Exception as exc:
        return None, job_id, f"failed to submit GBQ load job {job_id}: {exc}"

    try:
        return client.wait(handle, timeout_sec), job_id, ""
    except TimeoutError:
        try:
            client.cancel(handle)
        except Exception:
            pass
        return None, job_id, f"GBQ load job {job_id} timed out after {timeout_sec:g}s (cancelled)"
    except BqWaitError as exc:
        last = str(exc)
        for i in range(max(job.fail_retry, 0)):
            sleep(float(3 ** (i + 1)))
            try:
                return client.wait(handle, timeout_sec), job_id, ""
            except BqWaitError as exc2:
                last = str(exc2)
        return None, job_id, f"failed to get status of GBQ job {job_id}: {last}"


def apply_load_status(meta, status: BqJobStatus, job_id: str, *, source_name: str, object_urls: list) -> str:
    """Fold a finished load's status into the meta ledger
    (transfer_service.go:620-655). Returns '' on success, else the
    combined error message.

    Per-file errors: each error's location (the bad source URI) is
    recorded as a processed-with-error entry, so the next run SKIPS the
    bad file instead of failing the whole window on it again. On
    success every loaded object is recorded with the job's status line.
    """
    from etly_spark.meta import ObjectMeta

    if status is not None and status.errors:
        lines = []
        for er in status.errors:
            lines.append(er.message)
            if not er.location:
                continue
            meta.record(
                ObjectMeta(
                    source=er.location,
                    target="",
                    message="error loading to GBQ",
                    error=er.message,
                )
            )
            meta.add_error(f"GBQ load {job_id}: {er.location}: {er.message}")
        return "failed to perform GBQ load: " + "\n".join(lines)

    message = f"status: {status.state if status else 'UNKNOWN'}  with job id: {job_id}"
    for url in object_urls:
        meta.record(ObjectMeta(source=url, target="", message=message))
    return ""
