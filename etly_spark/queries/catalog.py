"""Registry of correctness-checked queries.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string DuckDB can run over the same
parquet tables. Cross-engine conventions that make value-hash parity hold:

- money/rate doubles are cast to exact DECIMAL before aggregation (sums
  become order-independent and bit-identical across engines), and final
  aggregates are cast back to DOUBLE;
- the shared deterministic hash is md5 hex (identical in both engines);
- timestamps are TIMESTAMP_NTZ / naive and usually projected as formatted
  strings;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import functools
import threading
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# ------------------------------------------------------- cache scope --
# Sketch tables (minhash signatures, simhash votes, deduped key sets …)
# are persisted so multi-read plan subtrees run once. CacheManager holds
# a persisted relation until an explicit unpersist — ContextCleaner only
# reclaims RDDs that become garbage, and a CachedData entry pins its
# plan — so a long-lived session running the catalog repeatedly would
# accumulate dead cache entries. Every catalog persist therefore goes
# through scoped_persist(), and each query invocation releases the
# previous one's scope: at most ONE query's intermediates are cached at
# any moment, and release_cache() empties even that.
#
# Contract: catalog queries are invoked SEQUENTIALLY — finish collecting
# one query's result before invoking the next (the driver, bench, and
# correctness gate all do). The scope list itself is lock-protected so
# accidental concurrent invocation cannot corrupt the bookkeeping or
# double-unpersist; but a second thread invoking a query would still
# release the first thread's live intermediates (they recompute — a
# silent slowdown, not a wrong answer).
_CACHE_SCOPE: list[DataFrame] = []
# RLock: _tl_scope() registers new per-thread stacks under the lock and
# is itself called from scoped_persist's locked section
_SCOPE_LOCK = threading.RLock()
# Per-thread scope stacks (optimization r14): composite queries build
# their independent branches from a driver-side thread pool (guide
# §2.6 — the serialized collect/persist jobs were 60% of
# sim_ann_methods' wall), and the old single global stack let one
# thread's stage-build release_scope() pop ANOTHER thread's live
# persists (silent recompute). scope_mark/release_scope now operate on
# the calling thread's own stack; the global list only backs
# release_cache(), which still frees everything regardless of thread.
_TLS = threading.local()
# Every thread's scope stack, registered at creation (r15 hardening —
# r14 verdict item 8 / advice: release_cache() used to clear only the
# CALLING thread's stack, so a pool worker's thread-local list kept
# already-unpersisted DataFrame refs alive — a slow driver-memory leak
# if a pool outlives its query, and stale entries if a pool is reused
# across two catalog queries). release_cache() now empties every
# registered stack; emptied stacks are dropped from the registry so
# short-lived pool threads don't accumulate entries.
_ALL_SCOPES: list[list[DataFrame]] = []


def _tl_scope() -> list[DataFrame]:
    lst = getattr(_TLS, "scope", None)
    if lst is None:
        lst = _TLS.scope = []
    with _SCOPE_LOCK:
        # (re-)register: release_cache prunes stacks from the registry,
        # and a pool thread REUSED across catalog queries must re-enter
        # it or its later persists would never be released. The scan is
        # O(live threads) — single digits.
        if not any(x is lst for x in _ALL_SCOPES):
            _ALL_SCOPES.append(lst)
    return lst


def scoped_persist(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Persist an intermediate for the current catalog query and register
    it for release at the next query invocation (or ``release_cache()``).
    ``eager`` materializes immediately — required when concurrent stages
    would otherwise each rebuild a lazily-populated cache."""
    df = df.persist()
    if eager:
        df.count()
    with _SCOPE_LOCK:
        _CACHE_SCOPE.append(df)
        _tl_scope().append(df)
    return df


def release_cache() -> None:
    """Unpersist every scoped intermediate — from every thread. Called
    automatically at the start of each catalog query; call explicitly
    after collecting the final query's result to leave the session
    cache-clean. Clears EVERY thread's scope stack (not just the
    caller's), so pool workers' thread-local lists hold no dangling
    refs; emptied stacks are dropped from the registry."""
    with _SCOPE_LOCK:
        dfs = _CACHE_SCOPE[:]
        _CACHE_SCOPE.clear()
        for lst in _ALL_SCOPES:
            lst.clear()
        keep = _tl_scope()  # keep the caller's (live) stack registered
        _ALL_SCOPES.clear()
        _ALL_SCOPES.append(keep)
    for df in dfs:
        df.unpersist()


def scope_mark() -> int:
    """Current scope depth OF THIS THREAD — pair with ``release_scope``
    to free only the intermediates this thread persisted after the mark
    (used by stage builds: once the stage is parquet-committed, its
    build-time persists are dead, but the caller's earlier persists must
    survive)."""
    with _SCOPE_LOCK:
        return len(_tl_scope())


def release_scope(mark: int) -> None:
    """Unpersist intermediates THIS THREAD registered after ``mark``."""
    while True:
        with _SCOPE_LOCK:
            lst = _tl_scope()
            if len(lst) <= mark:
                return
            df = lst.pop()
            for i, x in enumerate(_CACHE_SCOPE):
                if x is df:
                    del _CACHE_SCOPE[i]
                    break
            else:
                df = None  # release_cache already freed it
        if df is not None:
            df.unpersist()


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a Spark query builder with its DuckDB oracle.

    The registered callable releases the PREVIOUS query's scoped cache
    before building its plan — callers must finish collecting one
    query's result before invoking the next (the driver, bench, and the
    correctness gate all do)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_cache()
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(name=name, spark=run, oracle=oracle, doc=doc)
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.spark for n, s in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}
