"""Run-scoped staged intermediate tables.

A staged table is an intermediate DataFrame materialized ONCE per
process as parquet under a run-scoped directory and re-read by every
downstream consumer — the engine-level way to declare "this artifact
is shared between pipeline stages". The reference re-runs each query
from raw inputs (it has no intermediate store); a real training-data
pipeline persists stage outputs (the verified near-dup pair table,
a sketch table) and fans consumers out from them — this primitive is
that contract.

Semantics:
- the first consumer builds the DataFrame and commits it atomically
  (write to a tmp dir, then one `os.rename`); every later consumer in
  the same process — regardless of which SparkSession asks — reads
  the committed parquet;
- invalidation is by dependency fingerprint: the stage path hashes the
  logical key plus (path, size, mtime_ns) of every declared input
  file, so a changed input yields a NEW stage directory, never a
  stale read;
- the stage root is per-process (`mkdtemp`) and deleted at
  interpreter exit, so cross-run staleness is structurally
  impossible; the schema is saved alongside the data, so an EMPTY
  staged table (e.g. a corpus with no duplicate pairs) reads back
  with its schema intact.

Scale: at 100 TB the stage write is one shuffle-free parquet write of
an intermediate that is already proportional to result density (the
pair table), and it saves every downstream recompute of the stage —
exactly the trade a cluster pipeline makes when it lands stage output
on the cluster FS between jobs.
"""

from __future__ import annotations

import atexit
import hashlib
import json
import os
import shutil
import tempfile
import threading
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_STAGE_ROOT: str | None = None

# observability (and test hooks): how often a stage was reused vs built,
# and the cumulative one-time build+commit cost (reported by bench.py so
# the amortized stage cost is never invisible)
stats = {"hits": 0, "misses": 0, "build_sec": 0.0}


def _root() -> str:
    global _STAGE_ROOT
    if _STAGE_ROOT is None:
        _STAGE_ROOT = tempfile.mkdtemp(prefix="etly_stage_")
        atexit.register(shutil.rmtree, _STAGE_ROOT, ignore_errors=True)
    return _STAGE_ROOT


def run_scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under the per-process stage root
    (auto-removed at interpreter exit). NOT fingerprinted: every call
    returns a NEW directory — for per-invocation materializations that
    must be recomputed on every run (the opposite contract of
    stage_table: nothing here is ever reused across invocations)."""
    path = os.path.join(_root(), f"{prefix}-{uuid.uuid4().hex[:12]}")
    os.makedirs(path)
    return path


def _dep_sig(path: str) -> str:
    """(path, size, mtime_ns) for a file; recursed for a directory —
    any byte-level change to an input flips the stage fingerprint."""
    p = os.path.abspath(path)
    if os.path.isdir(p):
        parts = []
        for dirpath, _dirs, files in os.walk(p):
            for fn in sorted(files):
                fp = os.path.join(dirpath, fn)
                st = os.stat(fp)
                parts.append(f"{os.path.relpath(fp, p)}:{st.st_size}:{st.st_mtime_ns}")
        return f"{p}|dir|{';'.join(parts)}"
    st = os.stat(p)
    return f"{p}|{st.st_size}|{st.st_mtime_ns}"


def stage_table(
    spark: SparkSession,
    key: str,
    build: Callable[[], DataFrame],
    deps: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Return the staged table for ``key``: build + commit it on first
    use, read the committed parquet afterwards. ``deps`` are the input
    files/dirs whose content the stage derives from (fingerprinted into
    the stage identity)."""
    path = stage_path(spark, key, build, deps)
    with open(os.path.join(path, "_schema.json")) as f:
        schema = StructType.fromJson(json.loads(f.read()))
    return spark.read.schema(schema).parquet(path)


def stage_path(
    spark: SparkSession,
    key: str,
    build: Callable[[], DataFrame],
    deps: list[str] | tuple[str, ...] = (),
    partition_by: list[str] | tuple[str, ...] = (),
) -> str:
    """Like stage_table, but return the committed parquet DIRECTORY
    instead of reading it back — for artifacts consumed executor-side
    (e.g. per-cell PQ codebooks loaded lazily inside an Arrow kernel,
    functions/vector._staged_books): the artifact is written by a
    distributed job and never materialized on the driver. In cluster
    mode the stage root must live on storage all executors can read —
    the same contract stage_table's read-back path already has.

    ``partition_by`` hive-partitions the stage (r12 — the ivfpq codes
    table partitions on the coarse cell, so a probe's cell filter
    PRUNES directories instead of scanning interleaved row groups;
    note _staged_pdf's flat glob cannot read a partitioned stage —
    consume these through spark.read)."""
    fp = hashlib.sha1(
        "\n".join([key, *(_dep_sig(d) for d in deps)]).encode()
    ).hexdigest()[:24]
    path = os.path.join(_root(), fp)
    # Committed-stage fast path (r15): the rename commit is atomic, so
    # an existing path is always a complete stage — readers of a
    # committed stage must not serialize behind another fingerprint's
    # in-flight builder holding the lock dict's guard, nor behind a
    # same-fingerprint hit.
    if os.path.exists(path):
        stats["hits"] += 1
        return path
    # Per-stage build lock (optimization r14): composite queries build
    # branches from a driver thread pool, and two branches sharing a
    # stage would otherwise BOTH run build() (the rename keeps it
    # correct but the duplicate build wastes a full job). Second
    # arrival blocks until the first commits, then takes the hit path.
    with _BUILD_LOCKS_GUARD:
        lock = _BUILD_LOCKS.setdefault(fp, threading.Lock())
    try:
        with lock:
            return _stage_path_locked(path, build, partition_by)
    finally:
        # drop the lock entry once the stage is committed — the fast
        # path above serves all later readers, and the dict would
        # otherwise grow one entry per fingerprint forever
        if os.path.exists(path):
            with _BUILD_LOCKS_GUARD:
                _BUILD_LOCKS.pop(fp, None)


_BUILD_LOCKS: dict[str, threading.Lock] = {}
_BUILD_LOCKS_GUARD = threading.Lock()


def build_lock(fp: str) -> threading.Lock:
    """The per-fingerprint build lock, for index builders that manage
    their own commit directories (ivf_inc/ivf_split/ivfpq_inc/bm25_inc)
    instead of going through stage_path: under a driver thread pool two
    branches sharing an index would otherwise BOTH run the multi-epoch
    fold (the rename race keeps it correct but wastes the full build's
    Spark jobs). Callers re-check the committed dir after acquiring."""
    with _BUILD_LOCKS_GUARD:
        return _BUILD_LOCKS.setdefault(fp, threading.Lock())


def _stage_path_locked(
    path: str,
    build: Callable[[], DataFrame],
    partition_by: list[str] | tuple[str, ...] = (),
) -> str:
    if not os.path.exists(path):
        stats["misses"] += 1
        t0 = time.monotonic()
        df = build()
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        with open(os.path.join(tmp, "_schema.json"), "w") as f:
            f.write(df.schema.json())
        stats["build_sec"] = round(stats["build_sec"] + time.monotonic() - t0, 4)
        try:
            os.rename(tmp, path)
        except OSError:
            # concurrent builder won the rename — use its commit
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(path):
                raise
    else:
        stats["hits"] += 1
    return path
