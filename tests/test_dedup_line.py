"""Golden semantics for the dedup_exact r9 variants: C4-style
line(segment)-level dedup with order-preserving reassembly, and
canonical-URL document dedup. The catalog row hash-gates these against
DuckDB at sf0.01; this pins the *semantics* on a handcrafted corpus
where the expected kept set and rebuilt texts are known by hand."""

from __future__ import annotations

import hashlib

import pytest

P = 1000000007


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _mkdocs(spark, tmp_path):
    # segment size is 10 tokens; craft exact segment-level overlaps:
    #   doc 0 (src a): segs A(w1..w10) B(w11..w20) C(w21..w25, short tail)
    #   doc 7 (src b): seg A again (dup -> removed), then D(x1..x10)
    #   doc 91 (src a): exact copy of doc 0 -> every segment a dup
    # url variant: doc 0 vs doc 91 share (doc_id%7, doc_id%91) = (0, 0)
    # -> same canonical URL, doc 91 removed; doc 7 unique.
    A = " ".join(f"w{i}" for i in range(1, 11))
    B = " ".join(f"w{i}" for i in range(11, 21))
    C = " ".join(f"w{i}" for i in range(21, 26))
    D = " ".join(f"x{i}" for i in range(1, 11))
    rows = [
        (0, f"{A} {B} {C}", "en", "a", 0),
        (7, f"{A} {D}", "en", "b", 0),
        (91, f"{A} {B} {C}", "en", "a", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path), dict(A=A, B=B, C=C, D=D)


def test_line_variant_keeps_first_and_reassembles(spark, tmp_path):
    from etly_spark.queries.dedup import dedup_exact

    sf_dir, segs = _mkdocs(spark, tmp_path)
    got = {
        (r.variant, r.source): (r.n_units, r.n_kept, r.n_removed, r.kept_checksum)
        for r in dedup_exact(spark, sf_dir).collect()
    }

    # src a: doc 0 has 3 segs (all first occurrences), doc 91 has 3 (all
    # dups of doc 0's). src b: doc 7 -> seg A is a dup, D is new.
    assert got[("line", "a")][:3] == (6, 3, 3)
    assert got[("line", "b")][:3] == (2, 1, 1)
    # reassembly: doc 0 rebuilt = full text; doc 91 vanishes (0 kept
    # segs); doc 7 rebuilt = just D, order-preserving.
    a_chk = _md5i(f"{segs['A']} {segs['B']} {segs['C']}") % P
    b_chk = _md5i(segs["D"]) % P
    assert got[("line", "a")][3] == a_chk
    assert got[("line", "b")][3] == b_chk

    # doc variant: doc 91 is an exact copy of doc 0 -> removed.
    assert got[("doc", "a")][:3] == (2, 1, 1)
    assert got[("doc", "b")][:3] == (1, 1, 0)

    # url variant: docs 0 and 91 canonicalize to the same (host, path)
    # (tracking query + fragment + case + port stripped); doc 7 unique.
    assert got[("url", "a")][:3] == (2, 1, 1)
    assert got[("url", "b")][:3] == (1, 1, 0)
    assert got[("url", "a")][3] == _md5i("news-0.example.com/articles/0") % P
    assert got[("url", "b")][3] == _md5i("news-0.example.com/articles/7") % P


def test_line_incremental_old_corpus_wins(spark, tmp_path):
    """line_incremental: incoming docs (doc_id % 10 >= 8) keep a
    segment only when no EXISTING doc has it and no earlier incoming
    doc kept it — regardless of doc_id order among old docs."""
    from etly_spark.queries.dedup import dedup_exact

    A = " ".join(f"w{i}" for i in range(1, 11))   # in the old corpus
    D = " ".join(f"x{i}" for i in range(1, 11))   # only in incoming docs
    E = " ".join(f"y{i}" for i in range(1, 11))
    rows = [
        (20, A, "en", "a", 0),                    # old doc owns A
        (8, f"{A} {D}", "en", "a", 0),            # incoming: A dup, D first
        (18, f"{D} {E}", "en", "a", 0),           # incoming: D dup of doc 8's, E new
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.variant, r.source): (r.n_units, r.n_kept, r.kept_checksum)
        for r in dedup_exact(spark, str(tmp_path)).collect()
    }
    # incoming segments: doc8 (A,D) + doc18 (D,E) = 4; kept: doc8's D,
    # doc18's E (A owned by old doc 20; doc18's D lost to doc8's)
    assert got[("line_incremental", "a")][:2] == (4, 2)
    # rebuilt incoming docs: doc8 -> D, doc18 -> E
    assert got[("line_incremental", "a")][2] == (_md5i(D) + _md5i(E)) % P
    # the plain 'line' rule keeps first occurrence by doc order instead:
    # doc 8 keeps A and D, doc 18 keeps E, doc 20 loses A
    assert got[("line", "a")][:2] == (5, 3)


def test_line_rules_match_python_reference(spark, tmp_path):
    """Both line rules against a single-machine reference on a random
    corpus with planted repeats: per-(variant, source) counts and the
    reassembly checksums must agree exactly."""
    import random

    rng = random.Random(99)
    vocab = [f"v{i}" for i in range(12)]  # tiny vocab -> real segment repeats
    rows = []
    for doc_id in range(40):
        n = rng.randrange(1, 35)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((doc_id, text, "en", f"s{doc_id % 3}", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    # ---- reference ----
    def segs_of(text):
        t = text.split()
        k = max(-(-len(t) // 10), 1)
        return [" ".join(t[i * 10 : i * 10 + 10]) for i in range(k)]

    plain_first, inc_first = {}, {}
    for doc_id, text, _, _, _ in sorted(rows):
        new = doc_id % 10 >= 8
        for ln, seg in enumerate(segs_of(text), start=1):
            ord_ = doc_id * 1000000 + ln
            plain_first.setdefault(seg, ord_)
            key_inc = (new * 4611686018427387904) + ord_
            if seg not in inc_first or key_inc < inc_first[seg]:
                inc_first[seg] = key_inc

    want = {}
    for variant, first in (("line", plain_first), ("line_incremental", inc_first)):
        stats = {}
        for doc_id, text, _, src, _ in rows:
            new = doc_id % 10 >= 8
            if variant == "line_incremental" and not new:
                continue
            kept = []
            for ln, seg in enumerate(segs_of(text), start=1):
                ord_ = doc_id * 1000000 + ln
                key = ((new * 4611686018427387904) + ord_
                       if variant == "line_incremental" else ord_)
                n_units, n_kept, chk = stats.get(src, (0, 0, 0))
                if first[seg] == key:
                    n_kept += 1
                    kept.append(seg)
                stats[src] = (n_units + 1, n_kept, chk)
            if kept:
                n_units, n_kept, chk = stats[src]
                stats[src] = (n_units, n_kept, (chk + _md5i(" ".join(kept))) % P)
        for src, (nu, nk, chk) in stats.items():
            want[(variant, src)] = (nu, nk, chk)

    from etly_spark.queries.dedup import dedup_exact

    got = {
        (r.variant, r.source): (r.n_units, r.n_kept, r.kept_checksum)
        for r in dedup_exact(spark, str(tmp_path)).collect()
        if r.variant in ("line", "line_incremental")
    }
    assert got == want


def test_dedup_lines_builtin_stage(spark):
    """etly.DedupLines: config-addressable C4 recipe over REAL newline
    lines — first occurrence kept, reassembly order-preserving,
    identical documents tie (both keep their lines; whole-doc dedup is
    a separate stage), all other columns ride through."""
    from etly_spark import registry

    df = spark.createDataFrame(
        [
            (1, "alpha\nshared boilerplate\nbravo", "a"),
            (2, "shared boilerplate\ncharlie", "b"),
            (3, "delta\nshared boilerplate", "c"),
            (4, "shared boilerplate", "d"),          # all lines dup -> empty
            (5, "alpha\nshared boilerplate\nbravo", "e"),  # identical to 1
        ],
        "id long, text string, tag string",
    )
    fn = registry.transformers.get("etly.DedupLines")
    got = {r.id: (r.text, r.tag) for r in fn(df).collect()}
    # other columns ride through
    assert [got[i][1] for i in (1, 2, 3, 4)] == ["a", "b", "c", "d"]
    # the keeper is hash-ordered (a pure function of content), so assert
    # structure, not which doc won: exactly ONE distinct text retains
    # the shared line, every other occurrence is removed, and the
    # non-shared lines survive in their original order.
    texts = {i: got[i][0] for i in (1, 2, 3, 4)}
    keepers = [i for i, t in texts.items() if "shared boilerplate" in t]
    assert len(keepers) == 1, texts
    k = keepers[0]
    expect_with = {1: "alpha\nshared boilerplate\nbravo",
                   2: "shared boilerplate\ncharlie",
                   3: "delta\nshared boilerplate",
                   4: "shared boilerplate"}
    expect_without = {1: "alpha\nbravo", 2: "charlie", 3: "delta", 4: ""}
    for i in (1, 2, 3, 4):
        assert texts[i] == (expect_with[i] if i == k else expect_without[i]), texts
    # identical text -> identical treatment (tie keeps both copies whole)
    assert got[5][0] == got[1][0]


def test_dedup_lines_blank_lines_are_structure(spark):
    """Whitespace-only lines never dedupe — collapsing every blank
    separator in the corpus to its first occurrence would mangle
    formatting corpus-wide."""
    from etly_spark import registry

    df = spark.createDataFrame(
        [(1, "para one\n\npara two"), (2, "other text\n\nmore text")],
        "id long, text string",
    )
    fn = registry.transformers.get("etly.DedupLines")
    got = {r.id: r.text for r in fn(df).collect()}
    assert got[1] == "para one\n\npara two"
    assert got[2] == "other text\n\nmore text"


def test_line_variant_first_occurrence_is_document_order(spark, tmp_path):
    """The keeper is min(doc_id*1e6 + seg_no): a segment repeated WITHIN
    one document keeps its earliest position."""
    from etly_spark.queries.dedup import dedup_exact

    A = " ".join(f"t{i}" for i in range(1, 11))
    rows = [(5, f"{A} {A}", "en", "a", 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.variant, r.source): (r.n_units, r.n_kept, r.kept_checksum)
        for r in dedup_exact(spark, str(tmp_path)).collect()
    }
    assert got[("line", "a")][:2] == (2, 1)
    assert got[("line", "a")][2] == _md5i(A) % P


def test_spans_remove_excises_cross_doc_spans(spark, tmp_path):
    """r10 spans_remove golden: a 20-token cross-doc verbatim span is
    excised from EVERY occurrence (Lee et al. ExactSubstr action, T=15);
    a 14-token cross-doc overlap (< T) survives untouched; rebuild is
    order-preserving and checksum-gated per document."""
    from etly_spark.queries.dedup import _SPANR_T, dedup_exact

    assert _SPANR_T == 15  # the golden below is calibrated to T=15
    S = [f"s{i}" for i in range(1, 21)]   # the shared 20-token span
    U = [f"u{i}" for i in range(1, 6)]
    Pfx = [f"p{i}" for i in range(1, 6)]
    V = S[:14] + [f"v{i}" for i in range(1, 7)]   # 14-token overlap only
    rows = [
        (0, " ".join(S + U), "en", "a", 0),
        (7, " ".join(Pfx + S), "en", "b", 0),
        (91, " ".join(V), "en", "a", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r.variant, r.source): (r.n_units, r.n_kept, r.n_removed, r.kept_checksum)
        for r in dedup_exact(spark, str(tmp_path)).collect()
    }
    # src a: doc 0 loses its 20 S-tokens (keeps U); doc 91 intact (< T).
    # r11 byte fidelity: only the span's own bytes go — the whitespace
    # between the span and U is OUTSIDE the removed range and survives,
    # so doc 0 rebuilds to ' u1 ... u5' (leading separator kept).
    assert got[("spans_remove", "a")][:3] == (45, 25, 20)
    assert got[("spans_remove", "a")][3] == (
        _md5i(" " + " ".join(U)) + _md5i(" ".join(V))
    ) % P
    # src b: doc 7 loses the SAME span (excised from every occurrence);
    # the separator before the span survives -> trailing space kept
    assert got[("spans_remove", "b")][:3] == (25, 5, 20)
    assert got[("spans_remove", "b")][3] == _md5i(" ".join(Pfx) + " ") % P


def test_semantic_semdedup_prunes_within_cell(spark, tmp_path):
    """r10 SemDeDup golden (dedup_clusters 'semantic' variant): two
    identical embeddings share a cell (tie-break to the smaller
    cent_id) and the larger vec_id is pruned; an orthogonal vector
    keeps its own cell untouched. Checksums gate the exact kept set."""
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StringType, StructField, StructType,
    )

    from etly_spark.queries.dedup import dedup_clusters

    A = [1.0] + [0.0] * 63
    B = [0.0, 1.0] + [0.0] * 62
    emb = spark.createDataFrame(
        [(1, A, 0), (2, A, 0), (3, B, 0)],
        StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", LongType()),
        ]),
    )
    emb.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "a", 16), (2, "delta epsilon zeta", "en", "a", 18)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    sem = {
        r.cluster_id: (r.n_docs, r.ref_doc, r.ref_chars)
        for r in dedup_clusters(spark, str(tmp_path)).collect()
        if r.variant == "semantic"
    }
    # cell 1 = {vec 1, vec 2}: identical vectors, vec 2 pruned
    assert sem[1] == (2, 1, 1)
    # cell 3 = {vec 3}: orthogonal, kept whole
    assert sem[3] == (1, 1, 3)


@pytest.mark.parametrize("seed", [1234, 77, 90210])
def test_spans_remove_matches_python_reference(spark, tmp_path, seed):
    """spans_remove vs a single-machine reference on a random corpus
    with planted verbatim spans AND mixed separators (spaces, double
    spaces, newlines): per-source token counts and the post-excision
    text checksums must agree exactly. r11: the reference excises by
    byte offsets — kept regions (including their newlines and spacing)
    are byte-identical to the source. Parametrized seeds vary the span
    placements, separator mixes and doc lengths independently."""
    import random
    import re

    from etly_spark.queries.dedup import _SPANR_T, dedup_exact

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(400)]
    seps = [" ", "  ", "\n", " \n "]
    planted = [rng.choice(vocab) for _ in range(_SPANR_T + 7)]  # 22-token span
    short = [rng.choice(vocab) for _ in range(_SPANR_T - 1)]    # sub-threshold

    def join_mixed(toks):
        out = []
        for k, tok in enumerate(toks):
            if k:
                out.append(rng.choice(seps))
            out.append(tok)
        return "".join(out)

    rows = []
    for doc_id in range(36):
        n = rng.randrange(0, 50)
        toks = [rng.choice(vocab) for _ in range(n)]
        if doc_id % 5 == 0:  # plant the long span at a random offset
            at = rng.randrange(0, len(toks) + 1)
            toks = toks[:at] + planted + toks[at:]
        if doc_id % 7 == 0:  # plant the sub-threshold overlap
            toks = short + toks
        rows.append((doc_id, join_mixed(toks), "en", f"s{doc_id % 3}", 0))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    # ---- single-machine reference (byte-offset excision) ----
    T = _SPANR_T
    occ = {}  # window tuple -> set of doc_ids
    toks_of = {d: (t.split() if t else []) for d, t, *_ in rows}
    for d, t in toks_of.items():
        for i in range(len(t) - T + 1):
            occ.setdefault(tuple(t[i : i + T]), set()).add(d)
    want = {}
    for d, text, _, src, _ in rows:
        t = toks_of[d]
        cut = set()  # 0-based removed token indices
        for i in range(len(t) - T + 1):
            if len(occ[tuple(t[i : i + T])]) >= 2:
                cut.update(range(i, i + T))
        kept = [tok for p, tok in enumerate(t) if p not in cut]
        # byte-faithful rebuild: token segment drops iff its index is
        # cut; a whitespace segment drops iff BOTH neighbor tokens are
        rebuilt, tp = [], 0
        for seg in re.findall(r"\S+|\s+", text):
            if seg.strip():
                if tp not in cut:
                    rebuilt.append(seg)
                tp += 1
            else:
                if not (tp - 1 in cut and tp in cut):
                    rebuilt.append(seg)
        nu, nk, chk = want.get(src, (0, 0, 0))
        want[src] = (
            nu + len(t),
            nk + len(kept),
            (chk + _md5i("".join(rebuilt))) % P,
        )

    got = {
        r.source: (r.n_units, r.n_kept, r.kept_checksum)
        for r in dedup_exact(spark, str(tmp_path)).collect()
        if r.variant == "spans_remove"
    }
    assert got == want


def test_excise_dup_spans_interval_fold_bounded_and_exact(spark):
    """r11 (verdict item 5): the kept-position filter folds duplicated
    starts into merged coverage intervals — O(len + starts log starts)
    per unit. Pin (a) a fully-duplicated ~10k-token doc pair completes
    in bounded time (the r10 O(len x starts) form was ~1e8 lambda evals
    per doc), (b) the interval complement matches a brute-force
    coverage reference on an adversarial mixed corpus (overlapping,
    adjacent and disjoint spans)."""
    import random
    import time

    from pyspark.sql import functions as F

    from etly_spark.queries.dedup import _SPANR_T, excise_dup_spans

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    shared_a = [rng.choice(vocab) for _ in range(_SPANR_T + 10)]
    shared_b = [rng.choice(vocab) for _ in range(_SPANR_T)]
    rows = []
    for i in range(40):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(0, 70))]
        if i % 3 == 0:
            at = rng.randrange(0, len(toks) + 1)
            toks = toks[:at] + shared_a + toks[at:]
        if i % 4 == 0:  # second span, sometimes adjacent to the first
            toks = shared_b + toks
        rows.append((i, " ".join(toks)))
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("t", F.split(F.trim("text"), r"\s+"))
        .withColumn("t", F.filter("t", lambda x: x != ""))
    )
    out = excise_dup_spans(df, "doc_id").select("doc_id", "_ss", "_iv", "_kp", "t")
    for r in out.collect():
        covered = set()
        for s in r._ss:
            covered.update(range(s, s + _SPANR_T))
        ref_kp = [p for p in range(1, len(r.t) + 1) if p not in covered]
        assert list(r._kp) == ref_kp, f"doc {r.doc_id}"
        # merged intervals are sorted, non-overlapping, non-adjacent,
        # and their union is exactly the covered set
        got_cov = set()
        prev_e = -10
        for iv in r._iv:
            assert iv.b > prev_e + 1 and iv.b <= iv.e
            got_cov.update(range(iv.b, iv.e + 1))
            prev_e = iv.e
        assert got_cov == covered, f"doc {r.doc_id}"

    # bounded time: two identical 10k-token docs (every window
    # duplicated -> one merged interval, zero kept positions)
    big = " ".join(f"tok{i % 997}x{i % 31}" for i in range(10_000))
    bf = spark.createDataFrame(
        [(1, big), (2, big)], "doc_id long, text string"
    ).withColumn("t", F.split(F.trim("text"), r"\s+"))
    t0 = time.monotonic()
    res = {
        r.doc_id: (r.k, r.niv)
        for r in excise_dup_spans(bf, "doc_id")
        .select("doc_id", F.size("_kp").alias("k"), F.size("_iv").alias("niv"))
        .collect()
    }
    wall = time.monotonic() - t0
    assert res == {1: (0, 1), 2: (0, 1)}
    assert wall < 60, f"fully-duplicated 10k-token doc took {wall:.1f}s"


def test_semdedup_hot_cell_recursion_prunes_boilerplate(spark, tmp_path):
    """r11 (verdict item 2): a 1,000-member near-dup cluster lands in
    ONE coarse cell (>_SEM_CAP=256). The r10 code kept all 1,000 (hot
    cells skipped); the recursion re-clusters the cell (k_c~sqrt(n)
    hash-selected sub-centroids, staged grouped assign) until every
    leaf fits, then prunes within leaves — so the operator now prunes
    exactly where duplicate mass concentrates. The DuckDB oracle's
    fixed 3-level unroll must mirror the Spark loop row-for-row."""
    import duckdb
    import numpy as np

    from etly_spark.queries import REGISTRY
    from etly_spark.queries.dedup import _SEM_CAP

    n_total, n_cluster, dim = 1089, 1000, 64

    def h(v):  # the coarse-selection hash
        return ((v % 2147483648) * 2654435761) % 4294967296

    order = sorted(range(n_total), key=lambda v: (h(v), v))
    k_sem = min(4096, max(32, int(np.floor(np.sqrt(n_total)))))  # 33
    selected = order[:k_sem]
    # the FIRST-selected id anchors the cluster; the other selected ids
    # are orthogonal background, so all cluster members coarse-assign
    # to the single in-cluster centroid -> one hot cell of 1,000
    attractor = selected[0]
    background_sel = set(selected[1:])
    cluster_ids = [attractor] + [
        v for v in range(n_total) if v != attractor and v not in background_sel
    ][: n_cluster - 1]
    cluster_set = set(cluster_ids)

    # cluster members: cos(38°)·e1 + sin(38°)·w_i with w_i a random
    # unit vector ⊥ e1 — EQUAL norms (norm spread would let one
    # min-norm sub-centroid win every argmax) and pairwise cos ≈
    # cos²38° ≈ 0.62 ≥ the 0.4 prune bar; the attractor is itself a
    # regular member (a pure-e1 hub would out-cosine every
    # sub-centroid and make the cell cosine-unsplittable)
    rng = np.random.default_rng(42)
    th = np.deg2rad(38.0)
    rows = []
    bg_j = 0
    for v in range(n_total):
        if v in cluster_set:
            g = rng.standard_normal(dim)
            g[0] = 0.0
            g /= np.linalg.norm(g)
            vec = np.cos(th) * np.eye(dim)[0] + np.sin(th) * g
        else:
            vec = np.zeros(dim)
            vec[1 + (bg_j % (dim - 1))] = 1.0
            vec[2 + (bg_j % (dim - 2))] += 0.1
            bg_j += 1
        rows.append((v, [float(x) for x in vec], 0))
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    spark.createDataFrame(
        rows,
        StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
            StructField("label", LongType()),
        ]),
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "a", 16),
         (2, "delta epsilon zeta", "en", "a", 18)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    spec = REGISTRY["dedup_clusters"]
    got = sorted(
        (r.variant, r.cluster_id, r.n_docs, r.ref_doc, r.ref_chars)
        for r in spec.spark(spark, str(tmp_path)).collect()
    )

    # --- the recursion actually fired and actually pruned ---
    sem = [r for r in got if r[0] == "semantic"]
    assert all(r[2] <= _SEM_CAP for r in sem), "a hot leaf survived recursion"
    # leaf ids are member vec_ids; a few background vectors ride along
    # in the hot cell, so bound the totals rather than pin them
    cl_docs = sum(r[2] for r in sem if r[1] in cluster_set)
    cl_kept = sum(r[3] for r in sem if r[1] in cluster_set)
    assert n_cluster <= cl_docs <= n_cluster + 40  # fully re-partitioned
    assert cl_kept <= 100, f"recursion kept {cl_kept}/1000 near-dups"
    assert len(sem) > k_sem - 10  # leaves replaced the one hot cell

    # --- oracle mirror on the SAME fixture ---
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'"
        )
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want
