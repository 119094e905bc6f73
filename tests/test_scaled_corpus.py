"""tools/build_scaled_corpus.py invariants — the 10x stress corpus's
FK-consistency claims, checked at sf0.001 with 2 copies."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etly_spark.io.tables import load_table


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    import importlib

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    bsc = importlib.import_module("build_scaled_corpus")
    out = str(tmp_path_factory.mktemp("scaled"))
    base = "/root/testdata/sf0.001"
    orig_base, bsc.BASE = bsc.BASE, base
    try:
        counts = bsc.build(spark, 2, out)
    finally:
        bsc.BASE = orig_base
    return base, out, counts


def test_row_multiples_and_single_copies(spark, corpus):
    base, out, counts = corpus
    for t in ("orders", "lineitem", "customer", "documents", "embeddings"):
        assert counts[t] == 2 * load_table(spark, base, t).count(), t
    for t in ("region", "nation"):
        assert counts[t] == load_table(spark, base, t).count(), t


def test_fk_integrity_holds_across_copies(spark, corpus):
    _, out, _ = corpus
    o = spark.read.parquet(os.path.join(out, "orders.parquet"))
    c = spark.read.parquet(os.path.join(out, "customer.parquet"))
    li = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    n = spark.read.parquet(os.path.join(out, "nation.parquet"))
    # every shifted FK resolves (no orphans)
    orphans = o.join(c, o.o_custkey == c.c_custkey, "left_anti").count()
    assert orphans == 0
    li_orphans = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count()
    assert li_orphans == 0
    # and joins never cross copies: exactly one customer match per order
    # (cross-copy key reuse would multiply the join cardinality)
    assert o.join(c, o.o_custkey == c.c_custkey).count() == o.count()
    # unshifted nationkey FKs still resolve from every copy
    assert c.join(n, c.c_nationkey == n.n_nationkey, "left_anti").count() == 0


def test_copies_are_not_near_duplicates(spark, corpus):
    import build_scaled_corpus as bsc

    base, out, _ = corpus
    d = spark.read.parquet(os.path.join(out, "documents.parquet"))
    n_base = load_table(spark, base, "documents").count()
    # copy 1 of a doc must not share its text with copy 0 (consonant
    # rotation changes shingles). Pair copy-0 docs with their copy-1
    # twins by the builder's own OFFSET: the pairing must be complete
    # (guards against the assertion passing vacuously on an empty join)
    # and share zero texts.
    paired = d.alias("x").join(
        d.alias("y"), F.col("x.doc_id") + bsc.OFFSET == F.col("y.doc_id")
    )
    assert paired.count() == n_base
    assert paired.filter(F.col("x.text") == F.col("y.text")).count() == 0
    assert d.select("doc_id").distinct().count() == 2 * n_base
