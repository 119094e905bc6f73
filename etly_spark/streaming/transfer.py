"""Streaming transfer mode: the etly incremental loop as Structured
Streaming (SURVEY §7 step 9).

The reference's whole scheduler/meta machinery — frequency polling
(service.go:48-98), processed-file skip (transfer_service.go:503-505),
per-file ledger (meta.go:6-26) — is, in Spark terms, exactly the
streaming file source + checkpoint: new files discovered per trigger,
each file processed exactly once across restarts, progress in the commit
log. This service swaps the batch source for `readStream` and reuses the
batch operator chain (enrich → filter → transform → routed write) inside
`foreachBatch`, so both modes share one code path for F1-F4/R1-R6
semantics. The meta ledger is still written per micro-batch — the
*status surface* stays etly-compatible while exactly-once is carried by
the checkpoint.

Scale: the file source lists incrementally (maxFilesPerTrigger bounds
per-trigger work); state lives in the checkpoint, not the driver heap;
the per-batch driver work is O(files in batch), never O(records).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etly_spark.config import Transfer
from etly_spark.meta import Meta, ObjectMeta
from etly_spark.pipeline import TransferService, _local, _norm_file_url
from etly_spark.sources.storage import (
    CORRUPT,
    FILE,
    RAW,
    _decode_ndjson,
    _forced_codec_ext,
    cdx_records,
    get_schema,
    line_records,
    warc_records,
)
from etly_spark.templates import expand_date, expand_env, expand_pwd, expand_target_key


class StreamingTransferService:
    """Run a Transfer rule as a continuous (or run-once) stream."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._batch = TransferService(spark)

    def start(
        self,
        t: Transfer,
        *,
        now: datetime | None = None,
        checkpoint: str | None = None,
        available_now: bool = True,
        max_files_per_trigger: int | None = None,
    ) -> StreamingQuery:
        """Start the stream. ``available_now=True`` ≈ one `transferOnce`
        sweep (drains the backlog then stops); otherwise the trigger
        interval is ``t.frequency`` — the scheduler loop, in-engine.

        ``now`` is UTC, matching the batch engine (pipeline.py run()) so
        <dateFormat:> expansion resolves identically in both modes."""
        now = now or datetime.now(timezone.utc)
        src_url = expand_date(expand_env(expand_pwd(t.source.name, t.base_dir)), now)
        target_template = expand_date(expand_env(expand_pwd(t.target.name, t.base_dir)), now)
        meta_url = (
            expand_date(expand_env(expand_pwd(t.meta.name, t.base_dir)), now)
            if t.meta
            else os.path.join(_local(src_url), ".etly_meta.json")
        )
        checkpoint = checkpoint or os.path.join(_local(src_url), ".etly_checkpoint")

        fmt = (t.source.data_format or "ndjson").lower()
        cap = max_files_per_trigger or t.max_transfers
        if fmt in ("warc", "wet", "cdx"):
            # web archives stream too: the binaryFile source is a file
            # source like text, so the checkpointed exactly-once file
            # discovery is identical; each new .warc[.gz] object is one
            # task through the shared warc kernel (storage.warc_records)
            reader = self.spark.readStream.format("binaryFile").schema(
                # the binaryFile source's fixed schema — streaming file
                # sources require it stated up front
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            if cap:
                reader = reader.option("maxFilesPerTrigger", cap)
            # zero-byte objects (in-flight upload markers) are skipped
            # at list time on the batch path (transfer_service.go:
            # 516-519); here they would raise inside the parse and
            # poison every checkpoint retry — filter on the source's
            # length column, same contract
            bin_df = reader.load(_local(src_url)).filter(F.col("length") > 0)
            if t.source.filter_reg_exp:
                # S2 filter BEFORE the parse — a non-warc sidecar the
                # regex excludes (manifest.json, README) must never
                # reach decode_warc, where its ValueError would poison
                # the micro-batch on every checkpoint retry. Matches
                # against the source's Hadoop URI (path column); the
                # batch path filters the same pattern at list time.
                bin_df = bin_df.filter(
                    F.col("path").rlike(t.source.filter_reg_exp)
                )
            if fmt == "cdx":
                decoded = cdx_records(bin_df)
            else:
                decoded = warc_records(bin_df, main=(fmt == "wet"))
        elif t.source.compression:
            # Source.Compression set: the text file source selects
            # codecs by EXTENSION only, so extension-less/python-codec
            # objects must stream through binaryFile + the shared line
            # kernel (same codec registry, archives included) — the
            # streaming twin of the batch forced-codec route
            reader = self.spark.readStream.format("binaryFile").schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            if cap:
                reader = reader.option("maxFilesPerTrigger", cap)
            # length > 0: batch skips zero-byte objects at list time
            # (upload markers); a forced-codec decompress of b'' would
            # raise and poison every checkpoint retry
            bin_df = reader.load(_local(src_url)).filter(F.col("length") > 0)
            if t.source.filter_reg_exp:
                bin_df = bin_df.filter(
                    F.col("path").rlike(t.source.filter_reg_exp)
                )
            raw = line_records(
                bin_df, forced_ext=_forced_codec_ext(t.source)
            )
            schema = get_schema(t.source.data_type) if t.source.data_type else None
            decoded = _decode_ndjson(raw, t.source, schema)
        else:
            reader = self.spark.readStream.format("text")
            if cap:
                reader = reader.option("maxFilesPerTrigger", cap)
            raw = (
                reader.load(_local(src_url))
                .withColumnRenamed("value", RAW)
                .withColumn(FILE, F.input_file_name())
            )
            if t.source.filter_reg_exp:
                # S2 regex filter — same regex semantics as the batch
                # path (transfer_service.go:488-495), on the file URL.
                raw = raw.filter(F.col(FILE).rlike(t.source.filter_reg_exp))

            schema = get_schema(t.source.data_type) if t.source.data_type else None
            decoded = _decode_ndjson(raw, t.source, schema)
        decoded = self._batch._enrich(decoded, t, src_url)

        def process_batch(bdf: DataFrame, epoch_id: int) -> None:
            self._process_batch(bdf, epoch_id, t, target_template, meta_url, now)

        writer = decoded.writeStream.foreachBatch(process_batch).option(
            "checkpointLocation", _local(checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif t.frequency:
            secs = int(t.frequency.to_timedelta().total_seconds())
            writer = writer.trigger(processingTime=f"{secs} seconds")
        return writer.start()

    # ----------------------------------------------------------------- #

    def _process_batch(
        self,
        bdf: DataFrame,
        epoch_id: int,
        t: Transfer,
        target_template: str,
        meta_url: str,
        ts: datetime,
    ) -> None:
        """One micro-batch = one etly worker sweep: per-file keys computed
        driver-side (bounded by maxFilesPerTrigger), records filtered,
        transformed, routed, and the meta ledger appended."""
        bdf = bdf.persist()
        try:
            files = [r[0] for r in bdf.select(FILE).distinct().collect()]
            if not files:
                return
            file_keys = {
                _norm_file_url(u): expand_target_key(
                    target_template,
                    u,
                    ts,
                    self._batch._master_variables(t, u),
                    t.base_dir,
                )
                for u in files
            }

            keep = self._batch._keep_column(bdf, t)
            flagged = bdf.withColumn("__keep__", keep)
            per_file = {
                r[FILE]: r
                for r in flagged.groupBy(FILE)
                .agg(
                    F.count(F.lit(1)).alias("total"),
                    F.sum(F.col(CORRUPT).cast("long")).alias("corrupt"),
                    F.sum((~F.col(CORRUPT) & F.col("__keep__")).cast("long")).alias("kept"),
                    F.first(F.when(F.col(CORRUPT), F.col(RAW)), ignorenulls=True).alias(
                        "corrupt_sample"
                    ),
                )
                .collect()
            }

            out = flagged.filter(~F.col(CORRUPT) & F.col("__keep__")).drop("__keep__")
            out = self._batch._transform(out, t)
            key_col = self._batch._routed_key_column(t, file_keys, batch_count=epoch_id)
            self._batch._write_routed(out, key_col, t)

            meta = Meta.load(meta_url)
            for u in files:
                norm = _norm_file_url(u)
                r = per_file.get(norm)
                total = r["total"] if r is not None else 0
                corrupt = int(r["corrupt"]) if r is not None else 0
                kept = int(r["kept"]) if r is not None else 0
                msg = ""
                if corrupt and r is not None and r["corrupt_sample"]:
                    msg = f"failed to decode json ({corrupt} times): {r['corrupt_sample'][:200]}"
                    meta.add_error(msg)
                meta.record(
                    ObjectMeta(
                        source=norm,
                        target=file_keys[norm],
                        record_processed=kept,
                        record_skipped=total - corrupt - kept,
                        record_errors=corrupt,
                        message=msg,
                    )
                )
            meta.save()
        finally:
            bdf.unpersist()
