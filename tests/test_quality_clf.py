"""Trained quality classifier (operators/quality.py): closed-form
least-squares with exact DECIMAL sufficient statistics and a
Cramer solve whose operation order the SQL oracle mirrors verbatim.
The catalog row text_quality hash-gates the per-doc scores; this pins
the trainer itself (weight parity, solve correctness, classifier
usefulness) and the config-only etly.QualityScore stage."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from etly_spark.functions import text as T
from etly_spark.io.tables import load_table
from etly_spark.operators.quality import (
    LR_SOLVE_SQL,
    LR_STATS_SQL,
    lr_features,
    lr_stats,
    solve_weights,
)

SF = "/root/testdata/sf0.001"


def _spark_weights(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.tokens("text").alias("toks")
    )
    feats = lr_features(F.col("toks"))
    stats = lr_stats(
        d.select(feats["r1"].alias("r1"), feats["r2"].alias("r2"), feats["y"].alias("y"))
    )
    return stats, solve_weights(stats)


def test_weights_match_duckdb_bit_for_bit(spark):
    stats, (w0, w1, w2) = _spark_weights(spark, SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    row = con.sql(
        f"""
        WITH tok AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
          FROM documents
        ), c AS (
          SELECT doc_id,
                 least(len(toks) / 100.0, 1.0) AS length_c,
                 CASE WHEN len(toks) > 0
                      THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
                      ELSE 0.0 END AS diversity,
                 1.0 - (CASE WHEN len(toks) > 0
                             THEN len(list_filter(toks, t -> list_contains(
                                  ['the','a','of','to','and','is','in','on'], t)))
                                  / CAST(len(toks) AS DOUBLE)
                             ELSE 0.0 END) AS stop_c
          FROM tok
        ), tmodal AS (
          SELECT doc_id, max(cnt) AS m FROM (
            SELECT doc_id, t, count(*) AS cnt
            FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY 1, 2
          ) GROUP BY 1
        ), rep AS (
          SELECT tok.doc_id,
                 CASE WHEN len(toks) > 0
                      THEN tmodal.m / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS top_token_frac
          FROM tok LEFT JOIN tmodal ON tok.doc_id = tmodal.doc_id
        ), feat AS (
          SELECT c.doc_id, round(diversity, 6) AS r1, round(stop_c, 6) AS r2,
                 CASE WHEN top_token_frac > 0.2 THEN 1 ELSE 0 END AS y
          FROM c JOIN rep ON c.doc_id = rep.doc_id
        ), st AS ({LR_STATS_SQL} FROM feat)
        {LR_SOLVE_SQL} FROM st
        """
    ).fetchone()
    assert (w0, w1, w2) == row  # identical BITS, not just close


def test_solve_weights_is_least_squares(spark):
    """The canonical-order Cramer solve must agree with numpy's
    solver to float tolerance (guards formula transcription errors)."""
    stats, w = _spark_weights(spark, SF)
    A = np.array(
        [
            [stats["n"], stats["s1"], stats["s2"]],
            [stats["s1"], stats["s11"], stats["s12"]],
            [stats["s2"], stats["s12"], stats["s22"]],
        ]
    )
    b = np.array([stats["sy"], stats["s1y"], stats["s2y"]])
    np.testing.assert_allclose(np.array(w), np.linalg.solve(A, b), rtol=1e-9)


def test_classifier_flags_repetitive_docs(spark):
    """Distillation sanity: the cheap 2-feature scorer's 2x-prior flag
    must recover most of the expensive Gopher repetition label without
    flagging the bulk of the corpus."""
    from etly_spark.queries.text import text_quality

    rows = text_quality(spark, SF).select(
        "top_token_frac", "clf_score", "clf_flag"
    ).collect()
    true_pos = [r for r in rows if r.top_token_frac > 0.2]
    assert true_pos, "fixture should contain repetitive docs"
    recall = sum(r.clf_flag for r in true_pos) / len(true_pos)
    flag_rate = sum(r.clf_flag for r in rows) / len(rows)
    assert recall >= 0.5, f"recall {recall}"
    assert flag_rate <= 0.25, f"flag rate {flag_rate}"
    # a real split, not a constant predictor
    assert {r.clf_flag for r in rows} == {True, False}


def test_curation_chain_config_e2e(spark, tmp_path):
    """examples/curation_transfer.json transfer 2 end-to-end: the
    standard curation chain config-only — line dedup (enricher) ->
    quality gate (filter) -> trained scorer (transformer). Duplicate
    boilerplate lines vanish, the junk doc is gated out, survivors
    carry clf columns."""
    import json as _json
    import os
    import shutil

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from etly_spark import registry
    from etly_spark.config import TransferConfig
    from etly_spark.pipeline import DONE, TransferService

    if "example.Doc" not in registry.schemas:
        registry.schemas.register(
            "example.Doc",
            StructType(
                [
                    StructField("doc_id", LongType()),
                    StructField("text", StringType()),
                    StructField("lang", StringType()),
                    StructField("n_chars", LongType()),
                ]
            ),
        )
    cfg_path = tmp_path / "curation_transfer.json"
    shutil.copy(
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "curation_transfer.json"),
        cfg_path,
    )
    src = tmp_path / "incoming" / "docs"
    src.mkdir(parents=True)
    (tmp_path / "deduped").mkdir()
    boiler = "subscribe to our newsletter today"
    good1 = " ".join(f"alpha{i}" for i in range(40))
    good2 = " ".join(f"beta{i}" for i in range(40))
    # two extra clean docs with distinct (diversity, stopword) mixes:
    # the trained scorer needs >= 3 distinct feature points among the
    # docs that SURVIVE the gate (training runs post-filter)
    good3 = " ".join(f"gamma{i}" for i in range(30)) + " the of and is in"
    good4 = " ".join(f"delta{i % 30}" for i in range(60))
    docs = [
        {"doc_id": 1, "text": f"{good1}\n{boiler}", "lang": "en", "n_chars": 1},
        {"doc_id": 2, "text": f"{boiler}\n{good2}", "lang": "en", "n_chars": 1},
        {"doc_id": 3, "text": "the the the the", "lang": "en", "n_chars": 1},
        {"doc_id": 4, "text": good3, "lang": "en", "n_chars": 1},
        {"doc_id": 5, "text": good4, "lang": "en", "n_chars": 1},
    ]
    (src / "d.log").write_text("\n".join(_json.dumps(d) for d in docs) + "\n")

    cfg = TransferConfig.from_json(str(cfg_path))
    res = TransferService(spark).run(cfg.transfers[1])
    assert res.status == DONE, res.error
    rows = {r.doc_id: r for r in spark.read.parquet(str(tmp_path / "deduped" / "part")).collect()}
    assert set(rows) == {1, 2, 4, 5}  # junk doc gated out
    texts = {rows[1].text, rows[2].text}
    # the boilerplate line survives in exactly one doc
    assert sum(boiler in t for t in texts) == 1
    assert all(hasattr(rows[i], "clf_score") and rows[i].clf_flag is not None
               for i in (1, 2))


def test_quality_score_builtin_config_stage(spark):
    """Config-only usage: the etly.QualityScore transformer appends
    clf_score/clf_keep to arbitrary text records, training on the
    batch itself."""
    from etly_spark import registry

    # three distinct (r1, r2) feature points (a 2-point design is
    # singular for the 3-parameter solve and must raise)
    df = spark.createDataFrame(
        [(i, "spam spam spam spam spam spam spam spam the a" if i % 3 == 0 else
          (" ".join(f"w{i}x{j}" for j in range(40)) if i % 3 == 1 else
           "the a of to and " + " ".join(f"u{i}y{j}" for j in range(20))))
         for i in range(30)],
        "id long, text string",
    )
    fn = registry.transformers.get("etly.QualityScore")
    out = fn(df)
    rows = out.collect()
    assert {"clf_score", "clf_flag"} <= set(out.columns)
    # repetitive low-diversity docs score higher repetition risk than
    # fully-diverse docs, and only they are flagged at 2x prior
    lo = [r for r in rows if r.id % 3 == 0]
    hi = [r for r in rows if r.id % 3 != 0]
    assert min(x.clf_score for x in lo) > max(x.clf_score for x in hi)
    assert all(x.clf_flag for x in lo) and not any(x.clf_flag for x in hi)


def test_solve_weights_degenerate_corpus_null_model(spark):
    """r10 (ADVICE): a homogeneous batch whose rounded (r1, r2)
    features are all identical yields a singular normal-equations
    matrix — the solve must fall back to the zero-weight null model
    (not raise), and the SQL oracle's CASE branch must agree."""
    import duckdb

    d = spark.createDataFrame(
        [(i, "same words same words") for i in range(5)],
        "doc_id long, text string",
    ).select("doc_id", T.tokens("text").alias("toks"))
    feats = lr_features(F.col("toks"))
    stats = lr_stats(
        d.select(feats["r1"].alias("r1"), feats["r2"].alias("r2"),
                 feats["y"].alias("y"))
    )
    assert solve_weights(stats) == (0.0, 0.0, 0.0)

    con = duckdb.connect()
    row = con.sql(
        f"""
        WITH feat AS (
          SELECT 0.5 AS r1, 0.5 AS r2, 0 AS y FROM range(5)
        ), st AS ({LR_STATS_SQL} FROM feat)
        {LR_SOLVE_SQL} FROM st
        """
    ).fetchone()
    assert row == (0.0, 0.0, 0.0)

    # and the config-addressable stage survives the degenerate corpus
    import etly_spark.builtins  # noqa: F401  (populates the registry)
    from etly_spark.registry import transformers

    out = transformers.get("etly.QualityScore")(
        d.withColumn("text", F.lit("same words same words"))
    )
    assert {"clf_score", "clf_flag"} <= set(out.columns)
    assert out.count() == 5


def test_text_quality_stats_are_staged_and_reused(spark):
    """r13: the classifier's sufficient-stats row is a staged artifact
    — a second text_quality call must hit the stage (no second training
    aggregate) and return identical rows; decimal sums are exact
    through the parquet roundtrip so the solved weights are
    bit-identical."""
    from etly_spark.io import staging
    from etly_spark.queries.text import text_quality

    sf = "/root/testdata/sf0.001"
    first = text_quality(spark, sf).collect()
    misses = staging.stats["misses"]
    hits = staging.stats["hits"]
    second = text_quality(spark, sf).collect()
    assert staging.stats["misses"] == misses
    # r15: text_quality consumes TWO staged artifacts per invocation —
    # the lr-stats row and the bm25 postings table (the per-term
    # signals now read the postings instead of re-tokenizing)
    assert staging.stats["hits"] == hits + 2
    assert first == second
