"""queries/catalog.py cache-scope machinery under driver thread pools
(r15 hardening — r14 verdict item 8): composite queries persist
intermediates from pool workers, and a pool may be reused across two
catalog queries. release_cache() must clear EVERY thread's scope stack
(no dangling DataFrame refs in a worker's thread-local list), a reused
worker's later persists must still be releasable, and the identity-
checked release_scope() must never double-unpersist."""

from concurrent.futures import ThreadPoolExecutor

from etly_spark.queries import catalog


def test_pool_reuse_across_queries_no_stale_refs(spark):
    pool = ThreadPoolExecutor(2)
    try:

        def persist_on_worker():
            return catalog.scoped_persist(
                spark.range(10).selectExpr("id", "id * 2 as x"), eager=True
            )

        # query 1: a pool worker persists an intermediate
        df1 = pool.submit(persist_on_worker).result()
        assert df1.storageLevel.useMemory
        # next catalog query begins: release_cache must free the worker's
        # persist AND leave no stale ref in any thread's stack
        catalog.release_cache()
        assert not df1.storageLevel.useMemory
        with catalog._SCOPE_LOCK:
            assert catalog._CACHE_SCOPE == []
            assert all(len(lst) == 0 for lst in catalog._ALL_SCOPES)
        # query 2 REUSES the same pool: the worker's cleared stack must
        # re-register so its new persists are releasable too
        df2 = pool.submit(persist_on_worker).result()
        assert df2.storageLevel.useMemory
        catalog.release_cache()
        assert not df2.storageLevel.useMemory
        # idempotent: a second release finds nothing and unpersists nothing
        catalog.release_cache()
    finally:
        pool.shutdown(wait=True)


def test_release_scope_after_release_cache_is_noop(spark):
    # a stage build marks its scope, but release_cache() (next query)
    # fires before the build's release_scope(mark): the pops must see
    # the already-emptied stack and NOT double-unpersist
    mark = catalog.scope_mark()
    df = catalog.scoped_persist(spark.range(5), eager=True)
    catalog.release_cache()
    assert not df.storageLevel.useMemory
    catalog.release_scope(mark)  # no raise, no double unpersist
    with catalog._SCOPE_LOCK:
        assert catalog._CACHE_SCOPE == []
