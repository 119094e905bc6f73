"""Incremental maintenance of keyed aggregates across runs.

The 100 TB rollup story: a pipeline that lands a batch per window must
keep corpus-level statistics (per-source doc counts, token totals,
per-lang quality sums, min/max watermarks) WITHOUT rescanning history.
For distributive/algebraic aggregates the textbook answer is partial
aggregation + merge: each run folds only its batch's partials into a
durable store, and the current value is the merge of all folds —
per-run work is O(batch + key cardinality), never O(history).

This module is the batch twin of the streaming epoch fold
(streaming/dedup.py:start_feature_index) with the one property record
indexes don't need: MERGE-AWARENESS. A replayed or compacted partial
must never double-count, so the store tracks which epochs each
compacted segment covers.

Layout under ``state_dir``::

    epoch=<K>/        one parquet dir per fold (partial agg rows,
                      key-cardinality sized; replay overwrites its own
                      epoch — idempotent)
    base-<N>/         compacted segment: the merge of every epoch in
                      its ``_covered.json``; reader uses ONLY the
                      highest-numbered base + loose epochs not covered
                      by it, so a crash between commit and cleanup
                      cannot double-count

Aggregates are declared as ``merges: {column: 'sum'|'min'|'max'}`` over
partial columns the caller computes (count -> sum of partial counts,
avg -> sum/sum of two partials, distinct -> fold a sketch column).
Exact float sums under refold follow the repo's cross-engine contract:
route them through DECIMAL partials if bit-stability matters.

No reference analogue (viant/etly tracks files, not aggregates —
meta.go is presence-only); this extends M1's exactly-once ledger idea
to the relational surface.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# One lock per state dir (process-level): P3 runs a transfer's windows
# from concurrent driver threads, and those windows share one rollup
# state — two unsynchronized compact() calls would race the base-N
# rename (second os.rename onto the existing dir fails, erroring the
# window). Folds of distinct epochs are write-disjoint but cheap to
# serialize alongside.
_STATE_LOCKS: dict[str, threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()


def _state_lock(state_dir: str) -> threading.Lock:
    key = os.path.abspath(state_dir)
    with _LOCKS_GUARD:
        return _STATE_LOCKS.setdefault(key, threading.Lock())

# 'hll' merges DataSketches HLL binaries (hll_union_agg): the sketch
# answer to the one aggregate partial-merge can't do exactly —
# COUNT(DISTINCT) — making distinct counts incrementally maintainable
# at bounded state per key. Read back with hll_estimate().
_MERGE_FNS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "hll": lambda c: F.hll_union_agg(c, allowDifferentLgConfigK=False),
}


def hll_estimate(col) -> F.Column:
    """Estimate column for a folded 'hll' sketch (read-side helper)."""
    return F.hll_sketch_estimate(col)


def _bases(state_dir: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(d for d in os.listdir(state_dir) if d.startswith("base-"))


def _covered(state_dir: str) -> set[str]:
    """Epochs already merged into the highest-numbered base. Epoch ids
    are strings (ints from streaming epoch_ids and test folds stringify;
    the pipeline's per-file folds use full md5 hex — collision-free
    without squeezing into an int)."""
    bases = _bases(state_dir)
    if not bases:
        return set()
    manifest = os.path.join(state_dir, bases[-1], "_covered.json")
    with open(manifest) as fh:
        return {str(e) for e in json.load(fh)["epochs"]}


def _loose_epochs(state_dir: str) -> dict[str, str]:
    if not os.path.isdir(state_dir):
        return {}
    out = {}
    for d in os.listdir(state_dir):
        if d.startswith("epoch="):
            out[d.split("=", 1)[1]] = os.path.join(state_dir, d)
    return out


def fold(
    state_dir: str,
    partial: DataFrame,
    epoch: int | str,
    *,
    keys: list[str],
    merges: dict[str, str],
) -> bool:
    """Fold one batch's partial aggregate into the store.

    ``partial`` must already be aggregated per ``keys`` (one shuffle
    over the BATCH only — history is never read). Replaying an epoch
    overwrites its own directory; an epoch already merged into a base
    segment is skipped entirely. Returns True if the fold was applied,
    False if it was a no-op replay of a compacted epoch."""
    epoch = str(epoch)
    with _state_lock(state_dir):
        if epoch in _covered(state_dir):
            return False
        cols = list(keys) + list(merges)
        os.makedirs(state_dir, exist_ok=True)
        # tmp + rename (mirroring fold_rows): a crash mid-write must
        # not leave a torn epoch= dir that read() — e.g. the
        # /etly/rollup endpoint before a streaming replay re-folds —
        # would read as partial data or fail on
        tmp = os.path.join(state_dir, f"_tmp-{uuid.uuid4().hex[:8]}")
        partial.select(*cols).write.mode("overwrite").parquet(tmp)
        final = os.path.join(state_dir, f"epoch={epoch}")
        # Replay path: rename the existing epoch ASIDE (never rmtree it
        # in place). This NARROWS — not closes — the window where a
        # cross-process reader (e.g. /etly/rollup, which shares only the
        # filesystem, not this process lock) can observe the epoch dir
        # absent: from rmtree-duration down to the two rename syscalls.
        # Closing it entirely needs renameat2(RENAME_EXCHANGE) or
        # reader-side retry; a crash between the renames leaves the
        # epoch recoverable in _old-* (vs destroyed under rmtree), and
        # the worst steady-state outcome is a leaked _old-* dir,
        # reclaimed by the same sweep that handles _tmp-*.
        aside = None
        if os.path.isdir(final):
            aside = os.path.join(state_dir, f"_old-{uuid.uuid4().hex[:8]}")
            os.rename(final, aside)
        os.rename(tmp, final)
        if aside is not None:
            shutil.rmtree(aside, ignore_errors=True)
        return True


def read(
    spark: SparkSession,
    state_dir: str,
    *,
    keys: list[str],
    merges: dict[str, str],
) -> DataFrame:
    """The current aggregate: highest base segment + uncovered loose
    epochs, merged. Input rows number (covered keys + per-epoch keys),
    so this is a small-table merge at any history length."""
    bases = _bases(state_dir)
    covered = _covered(state_dir)
    parts = []
    if bases:
        parts.append(os.path.join(state_dir, bases[-1], "data"))
    parts += [p for e, p in sorted(_loose_epochs(state_dir).items()) if e not in covered]
    if not parts:
        raise FileNotFoundError(f"no folded state under {state_dir}")
    df = spark.read.parquet(*parts)
    return df.groupBy(*keys).agg(
        *[_MERGE_FNS[kind](c).alias(c) for c, kind in merges.items()]
    )


def compact(
    spark: SparkSession,
    state_dir: str,
    *,
    keys: list[str],
    merges: dict[str, str],
    threshold: int = 16,
) -> bool:
    """Merge base + loose epochs into one new base segment once loose
    epochs exceed ``threshold``. Aggregate rows are key-cardinality
    sized, so full re-merge is cheap; the new base commits with one
    rename BEFORE old dirs are removed, and the reader's
    highest-base-wins rule makes the worst crash outcome some
    un-reclaimed disk, never a double count."""
    with _state_lock(state_dir):
        loose = _loose_epochs(state_dir)
        covered = _covered(state_dir)
        fresh = {e: p for e, p in loose.items() if e not in covered}
        if len(fresh) <= threshold:
            return False
        merged = read(spark, state_dir, keys=keys, merges=merges)
        bases = _bases(state_dir)
        n_next = (int(bases[-1].split("-")[1]) + 1) if bases else 1
        tmp = os.path.join(state_dir, f"_tmp-{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        with open(os.path.join(tmp, "_covered.json"), "w") as fh:
            json.dump({"epochs": sorted(covered | set(fresh))}, fh)
        final = os.path.join(state_dir, f"base-{n_next:06d}")
        os.rename(tmp, final)
        # cleanup (best-effort: reader ignores superseded dirs
        # regardless); loose dirs of already-covered epochs are crash
        # leftovers — sweep
        for b in bases:
            shutil.rmtree(os.path.join(state_dir, b), ignore_errors=True)
        for e in loose:
            shutil.rmtree(os.path.join(state_dir, f"epoch={e}"), ignore_errors=True)
        # _tmp-*/_old-* dirs (a crash between a tmp write and its
        # rename, or mid-replay in fold) leak disk unboundedly if never
        # swept, but the state lock is only PROCESS-level: a _tmp from
        # another process sharing this state_dir (cron overlap, a
        # separate service) may be a live in-flight write whose deletion
        # would fail that writer's rename. Staleness therefore keys on
        # the NEWEST mtime found recursively under the dir — a Spark
        # parquet job writes under _temporary/... subdirs, so the top
        # dir's own mtime stays at job start for the whole write and
        # would mark a long-running legitimate fold stale; any file the
        # job is still producing keeps the recursive mtime fresh. The
        # day-long cutoff on top makes a sweep of a live write require
        # a writer fully wedged for 24h with no file progress.
        cutoff = time.time() - 86400
        for d in os.listdir(state_dir):
            if d.startswith(("_tmp-", "_old-")):
                p = os.path.join(state_dir, d)
                try:
                    newest = os.path.getmtime(p)
                    for root, _dirs, files in os.walk(p):
                        for f in files:
                            newest = max(newest, os.path.getmtime(os.path.join(root, f)))
                except OSError:
                    continue  # vanished mid-listing (its writer finished)
                if newest < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
        return True


def parse_rollup_spec(aggregates: dict[str, str]) -> dict[str, tuple[str, str]]:
    """Validate a config-level aggregate spec (`Rollup.Aggregates`:
    column -> 'count' | 'sum:<col>' | 'min:<col>' | 'max:<col>' |
    'distinct:<col>') into {name: (kind, source_col)}. Pure Python —
    config validation must work with no SparkSession alive (building a
    Column without one raises from the JVM bridge)."""
    out: dict[str, tuple[str, str]] = {}
    for name, spec in aggregates.items():
        kind, _, col = spec.partition(":")
        if (kind == "count" and not col) or (
            kind in ("sum", "min", "max", "distinct") and col
        ):
            out[name] = (kind, col)
        else:
            raise ValueError(f"unknown rollup aggregate '{spec}' for '{name}'")
    return out


def rollup_plan(aggregates: dict[str, str]):
    """Compile an aggregate spec into (partial agg columns, merge spec).
    'count' partials merge by sum (the classic distributive
    decomposition); 'distinct' partials are HLL sketches merged by
    union (read-side estimate via hll_estimate)."""
    cols, merges = [], {}
    for name, (kind, col) in parse_rollup_spec(aggregates).items():
        if kind == "count":
            cols.append(F.count(F.lit(1)).alias(name))
            merges[name] = "sum"
        elif kind == "distinct":
            cols.append(F.hll_sketch_agg(col).alias(name))
            merges[name] = "hll"
        else:
            cols.append(_MERGE_FNS[kind](col).alias(name))
            merges[name] = kind
    return cols, merges


def delta(
    spark: SparkSession,
    newer_dir: str,
    older_dir: str,
    *,
    keys: list[str],
    sums: list[str],
) -> DataFrame:
    """Per-key difference between two rollup snapshots: what a
    monitoring pipeline computes between periodic copies of a
    cumulative state (this crawl vs last crawl — corpus growth per
    source, new-token influx per lang). Only additive columns are
    diffable (sum/count merges); keys present in one snapshot only get
    zero on the missing side. One small-table full-outer join — both
    inputs are key-cardinality sized at any history length."""
    merges = {c: "sum" for c in sums}
    new = read(spark, newer_dir, keys=keys, merges=merges)
    old = read(spark, older_dir, keys=keys, merges=merges)
    for k in keys:
        new = new.withColumnRenamed(k, f"__nk_{k}")
    for c in sums:
        new = new.withColumnRenamed(c, f"__new_{c}")
        old = old.withColumnRenamed(c, f"__old_{c}")
    # null-safe equality: a NULL key value is one bucket, not two
    # (a plain key-list join would split it into +new and -old rows)
    cond = None
    for k in keys:
        c = F.col(f"__nk_{k}").eqNullSafe(F.col(k))
        cond = c if cond is None else (cond & c)
    joined = new.join(old, cond, "full_outer")
    out_cols = [F.coalesce(F.col(f"__nk_{k}"), F.col(k)).alias(k) for k in keys]
    for c in sums:
        out_cols.append(
            (
                F.coalesce(F.col(f"__new_{c}"), F.lit(0))
                - F.coalesce(F.col(f"__old_{c}"), F.lit(0))
            ).alias(f"d_{c}")
        )
    return joined.select(*out_cols)


def fold_rows(
    state_dir: str,
    pdf,
    epoch: int | str,
    *,
    keys: list[str],
    merges: dict[str, str],
    schema=None,
) -> bool:
    """Driver-side fold of an already-collected partial (a pandas frame
    with the key + merge columns): pyarrow write, no Spark job. For
    per-file partials whose rows are bounded by (files x key
    cardinality) — the ledger-sidecar precedent; launching a Spark
    write (with its per-task commit protocol) per tiny partial would be
    pure overhead. Same epoch semantics as ``fold`` (covered refusal,
    replay overwrites its own dir atomically via tmp+rename).

    ``schema`` (a Spark StructType covering at least keys+merges, or a
    pyarrow Schema in cols order) pins the parquet types. Without it a
    ZERO-ROW partial (a file whose rows were all filtered/corrupt)
    arrow-infers every column as null — and if compact() runs while
    only such empty epochs are uncovered, the base segment commits with
    the wrong schema and every later read/compact fails permanently
    with a parquet type mismatch. Callers that can see a Spark schema
    must pass it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    epoch = str(epoch)
    with _state_lock(state_dir):
        if epoch in _covered(state_dir):
            return False
        os.makedirs(state_dir, exist_ok=True)
        cols = list(keys) + list(merges)
        arrow_schema = None
        if schema is not None:
            if isinstance(schema, pa.Schema):
                arrow_schema = schema
            else:
                from pyspark.sql.pandas.types import to_arrow_schema
                from pyspark.sql.types import StructType

                arrow_schema = to_arrow_schema(
                    StructType([schema[c] for c in cols])
                )
        table = pa.Table.from_pandas(
            pdf[cols], schema=arrow_schema, preserve_index=False
        )
        tmp = os.path.join(state_dir, f"_tmp-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp)
        pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
        final = os.path.join(state_dir, f"epoch={epoch}")
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return True
