"""Per-doc surfaces behind the curation-family variants: the
ExactSubstr repeated-span builder and the unigram-perplexity builder
(the checked catalog row only sees their per-(lang, grp) aggregates),
plus the skew split-broadcast join they ride on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _duck(sf_dir: str):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def test_repeated_span_stats_matches_duckdb(spark):
    from etly_spark.queries.dedup import SPAN_PERDOC_CTE, repeated_span_stats

    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac"], r["flagged"])
        for r in repeated_span_stats(spark, SF).collect()
    }
    con = _duck(SF)
    want_rows = con.sql(
        SPAN_PERDOC_CTE
        + """
        SELECT d.doc_id,
               COALESCE(n_spans, 0) AS n_spans,
               COALESCE(n_dup_spans, 0) AS n_dup_spans,
               ROUND(COALESCE(n_dup_spans / n_spans, 0.0), 6) AS dup_frac,
               (COALESCE(n_dup_spans / n_spans, 0.0) >= 0.5) AS flagged
        FROM documents d LEFT JOIN per_doc USING (doc_id)
        """
    ).fetchall()
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in want_rows}
    assert got == want
    # exact-duplicate docs exist in the fixture -> some full-coverage flags
    assert any(v[3] for v in got.values())


def test_exact_substr_lrs_matches_duckdb(spark):
    """Per-doc longest cross-document verbatim token span: the
    distributed suffix-sort (range partitions + boundary-row
    reconstruction) must equal DuckDB's full-sort lag-window twin for
    EVERY document."""
    from etly_spark.queries.dedup import SEXACT_PERDOC_CTE, exact_substr_lrs

    got = {r["doc_id"]: r["lrs"] for r in exact_substr_lrs(spark, SF).collect()}
    con = _duck(SF)
    want = dict(
        con.sql(
            SEXACT_PERDOC_CTE
            + """
        SELECT d.doc_id, COALESCE(lrs, 0) AS lrs
        FROM documents d LEFT JOIN lrs_per_doc USING (doc_id)
        """
        ).fetchall()
    )
    assert got == want
    # the fixture plants exact-duplicate docs -> some lrs at the 30 cap
    assert max(got.values()) == 30


def test_exact_substr_lrs_partitioning_invariance(spark, tmp_path):
    """The distributed pass must be exact under adversarial execution
    shapes: far more range partitions than suffix rows (most partitions
    EMPTY — the boundary chain must skip them) and 1-row Arrow batches
    (the kernel's carry-over state crosses every batch boundary)."""
    from etly_spark.queries.dedup import exact_substr_lrs

    span = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, f"aa bb {span}", "en", "x", 0),
        (2, f"{span} cc dd", "en", "x", 0),
        (3, "ee ff gg", "en", "x", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    want = {1: 12, 2: 12, 3: 0}
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "97")  # >> 34 suffix rows
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
        got = {
            r["doc_id"]: r["lrs"]
            for r in exact_substr_lrs(spark, str(tmp_path)).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)
    assert got == want


def test_exact_substr_lrs_planted_span(spark, tmp_path):
    """Golden: a 17-token span copied between two docs (otherwise
    disjoint vocab) must come back as lrs=17 for both, 0 for a
    bystander; 5-gram coverage could only say '13 of the 5-grams
    repeat', never the span length."""
    span = " ".join(f"s{i}" for i in range(17))
    rows = [
        (1, f"aaa bbb {span} ccc", "en", "x", 0),
        (2, f"ddd {span} eee fff", "en", "x", 0),
        (3, "ggg hhh iii jjj kkk", "en", "x", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from etly_spark.queries.dedup import exact_substr_lrs

    got = {r["doc_id"]: r["lrs"] for r in exact_substr_lrs(spark, str(tmp_path)).collect()}
    assert got == {1: 17, 2: 17, 3: 0}


def test_unigram_perplexity_terciles(spark):
    from etly_spark.queries.text import unigram_perplexity

    rows = unigram_perplexity(spark, SF).collect()
    assert rows and all(r["bits"] > 0 for r in rows)
    # per lang, terciles are balanced to within one doc
    from collections import Counter

    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], Counter())[r["bucket"]] += 1
    for lang, c in per_lang.items():
        assert set(c) <= {"head", "middle", "tail"}
        if sum(c.values()) >= 3:
            assert max(c.values()) - min(c.values()) <= 1, (lang, c)
    # head really is the low-perplexity slice: per lang,
    # max(head bits) <= min(tail bits)
    by = {}
    for r in rows:
        by.setdefault((r["lang"], r["bucket"]), []).append(r["bits"])
    for lang in {r["lang"] for r in rows}:
        if (lang, "head") in by and (lang, "tail") in by:
            assert max(by[(lang, "head")]) <= min(by[(lang, "tail")])


def test_split_broadcast_join_equals_plain_join(spark):
    from etly_spark.operators.skew import split_broadcast_join

    probe = spark.range(0, 1000).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 13).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    got = split_broadcast_join(probe, dim, "k", "w", hot_k=4)
    want = probe.join(dim, "k")
    assert got.count() == want.count() == 1000
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # the hot path really broadcasts
    assert "BroadcastHashJoin" in got._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("hot_k", [0, 10_000])
def test_split_broadcast_join_degenerate_splits(spark, hot_k):
    """hot_k=0 (all-shuffle) and hot_k >= |dim| (all-broadcast) both
    reduce to the plain join — the split is a pure performance knob."""
    from etly_spark.operators.skew import split_broadcast_join

    probe = spark.range(0, 200).select((F.col("id") % 7).alias("k"), "id")
    dim = spark.range(0, 7).select(F.col("id").alias("k"), F.col("id").alias("w"))
    got = split_broadcast_join(probe, dim, "k", "w", hot_k=hot_k)
    assert got.count() == 200


def test_unigram_perplexity_approx_agrees_away_from_cuts(spark):
    """The scale path (percentile_approx cut-points, no window sort)
    assigns the same bucket as the exact percent_rank path for every
    doc except possibly those within sketch error of a cut; its plan
    contains no Window exchange."""
    from etly_spark.queries.text import unigram_perplexity, unigram_perplexity_approx

    exact = {
        (r["doc_id"]): (r["lang"], r["bits"], r["bucket"])
        for r in unigram_perplexity(spark, SF).collect()
    }
    approx_df = unigram_perplexity_approx(spark, SF)
    assert "Window" not in approx_df._jdf.queryExecution().executedPlan().toString()
    approx = {r["doc_id"]: r["bucket"] for r in approx_df.collect()}
    assert set(approx) == set(exact)
    # per-lang sorted bits: disagreements must be confined to docs
    # adjacent to a tercile boundary (|rank - cut| <= 1 position)
    import collections

    by_lang = collections.defaultdict(list)
    for doc, (lang, bits, bucket) in exact.items():
        by_lang[lang].append((bits, doc, bucket))
    n_diff = 0
    for lang, rows in by_lang.items():
        rows.sort()
        n = len(rows)
        for i, (bits, doc, bucket) in enumerate(rows):
            if approx[doc] != bucket:
                n_diff += 1
                # must be adjacent to a boundary position
                assert min(abs(i - n / 3), abs(i - 2 * n / 3)) <= 2, (
                    lang, doc, i, n, bucket, approx[doc],
                )
    # overwhelming agreement
    assert n_diff <= max(2, len(exact) // 50)


def test_mix_thresholds_match_duckdb_fold_order():
    """The mix variant's float contract, pinned at the unit level: for
    skewed/tied/NULL-bearing count tables, the driver-side left fold in
    mix_thresholds must produce the SAME integer thresholds as the
    oracle's list(... ORDER BY lang) + list_reduce formulation — any
    reorder of the fold or change to the rate expression fails here
    with the exact lang, not as a whole-query hash mismatch."""
    import duckdb

    from etly_spark.queries.text import mix_thresholds

    cases = [
        [("en", 90000), ("de", 7000), ("fr", 2000), ("ru", 900), ("zh", 100)],
        [("en", 1), ("de", 1)],  # tie
        [("en", 5), (None, 3), ("de", 2)],  # NULL lang in the shares
        [("only", 12345)],
    ]
    con = duckdb.connect()
    for counts in cases:
        con.execute("DROP TABLE IF EXISTS lc")
        con.execute("CREATE TABLE lc(lang VARCHAR, cnt DOUBLE)")
        con.executemany("INSERT INTO lc VALUES (?, ?)", [(l, float(n)) for l, n in counts])
        rows = con.execute(
            """
            WITH tot AS (SELECT SUM(cnt) AS total FROM lc),
            den AS (
              SELECT list_reduce(list(sqrt(cnt / total) ORDER BY lang), (x, y) -> x + y) AS denom
              FROM lc, tot
            )
            SELECT lang,
                   CAST(floor(least(1.0, (sqrt(cnt / total) / denom) * 0.5 * total / cnt)
                              * 10000 + 0.5) AS BIGINT) AS thr
            FROM lc, tot, den
            """
        ).fetchall()
        want = {lang: thr for lang, thr in rows}
        assert mix_thresholds(counts) == want, counts


def test_remove_spans_builtin_stage(spark):
    """etly.RemoveSpans (r10): the ExactSubstr action as a config-
    addressable transformer — a >= 15-token span shared by two docs is
    cut from BOTH; a within-doc repeat is NOT cut (cross-doc rule);
    EXACT-duplicate documents are fully excised on both copies (their
    whole text is a cross-doc repeated span — the true ExactSubstr
    semantics); untouched documents pass through byte-identical
    (original whitespace preserved); other columns ride through."""
    import etly_spark.builtins  # noqa: F401
    from etly_spark.registry import transformers

    S = " ".join(f"s{i}" for i in range(20))
    U = " ".join(f"u{i}" for i in range(6))
    P = " ".join(f"p{i}" for i in range(6))
    rep = " ".join(f"r{i}" for i in range(16))
    multiline = "first line here\nsecond  line   spacing\nthird"
    df = spark.createDataFrame(
        [
            (1, f"{P} {S}", "a"),       # unique prefix + the shared span
            (2, f"{S} {U}", "b"),       # the span + unique suffix
            (3, f"{rep} {rep}", "c"),   # within-doc repeat only -> kept
            (4, f"{rep} {rep}", "d"),   # ...but doc 4 DUPLICATES doc 3
            (5, multiline, "e"),        # untouched -> byte-identical
        ],
        "doc_id long, text string, tag string",
    )
    out = {r.doc_id: (r.text, r.tag) for r in
           transformers.get("etly.RemoveSpans")(df).collect()}
    # r11 byte fidelity: only the span's own byte range is removed —
    # the separator between kept text and the span survives
    assert out[1] == (P + " ", "a")    # shared span cut from doc 1
    assert out[2] == (" " + U, "b")    # ...and from doc 2
    # docs 3+4 are exact duplicates of EACH OTHER: every window is
    # cross-doc repeated, so both copies are fully excised (internal
    # whitespace sits between removed tokens and goes with them)
    assert out[3] == ("", "c")
    assert out[4] == ("", "d")
    # no excision -> original bytes, including newlines + double spaces
    assert out[5] == (multiline, "e")


def test_remove_spans_config_e2e(spark, tmp_path):
    """examples/curation_transfer.json transfer 3 end-to-end: the
    ExactSubstr action config-only — a >= 15-token span shared by two
    ndjson docs is excised from both in the landed parquet, the unique
    doc is untouched byte-for-byte."""
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
    S = " ".join(f"boiler{i}" for i in range(18))
    rows = [
        {"doc_id": 1, "text": f"{S} plus unique alpha words", "lang": "en", "n_chars": 10},
        {"doc_id": 2, "text": f"other beta prefix {S}", "lang": "en", "n_chars": 10},
        {"doc_id": 3, "text": "totally unique gamma document", "lang": "en", "n_chars": 10},
    ]
    (src / "d.log").write_text("\n".join(_json.dumps(r) for r in rows) + "\n")

    cfg = TransferConfig.from_json(str(cfg_path))
    t = next(x for x in cfg.transfers if x.name == "exactsubstr-excise-documents")
    assert t.transformer == "etly.RemoveSpans"
    res = TransferService(spark).run(t)
    assert res.status == DONE, res.error
    out = {r.doc_id: r.text for r in
           spark.read.parquet(str(tmp_path / "excised" / "part")).collect()}
    # byte-offset excision (r11): the separator adjacent to the cut
    # span is outside the removed byte range and survives
    assert out[1] == " plus unique alpha words"
    assert out[2] == "other beta prefix "
    assert out[3] == "totally unique gamma document"


def test_remove_spans_matches_python_reference(spark):
    """etly.RemoveSpans vs a single-machine reference on a random
    corpus with planted cross-doc spans AND exact-duplicate documents:
    the multiplicity rule (a window inside a text that occurs >= 2
    times is cross-doc duplicated) must hold exactly per document."""
    import random

    import etly_spark.builtins  # noqa: F401
    from etly_spark.queries.dedup import _SPANR_T
    from etly_spark.registry import transformers

    T = _SPANR_T
    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(300)]
    planted = [rng.choice(vocab) for _ in range(T + 5)]
    rows = []
    for doc_id in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 45))]
        if doc_id % 4 == 0:
            at = rng.randrange(0, len(toks) + 1)
            toks = toks[:at] + planted + toks[at:]
        rows.append((doc_id, " ".join(toks)))
    rows.append((100, rows[5][1]))  # exact duplicate of doc 5
    rows.append((101, rows[5][1]))  # ...twice

    # ---- reference: window multiset over NORMALIZED text, a window is
    # dup iff seen in >= 2 distinct texts OR in a text with count >= 2
    from collections import Counter

    texts = Counter(t for _, t in rows)
    occ = {}
    for t in texts:
        tok = t.split()
        for i in range(len(tok) - T + 1):
            occ.setdefault(tuple(tok[i : i + T]), set()).add(t)
    def expected(t):
        import re

        tok = t.split()
        cut = set()
        for i in range(len(tok) - T + 1):
            w = tuple(tok[i : i + T])
            if len(occ[w]) >= 2 or texts[t] >= 2:
                cut.update(range(i, i + T))
        if not cut:
            return t
        # byte-offset rebuild (r11): token segment drops iff cut,
        # whitespace segment iff both neighbor tokens are cut
        out, tp = [], 0
        for seg in re.findall(r"\S+|\s+", t):
            if seg.strip():
                if tp not in cut:
                    out.append(seg)
                tp += 1
            elif not (tp - 1 in cut and tp in cut):
                out.append(seg)
        return "".join(out)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in transformers.get("etly.RemoveSpans")(df).collect()}
    for doc_id, t in rows:
        assert got[doc_id] == expected(t), doc_id
    # the exact-dup trio is fully excised iff it had >= T tokens
    if len(rows[5][1].split()) >= T:
        assert got[5] == got[100] == got[101] == ""
