"""Text-analysis column expressions for the documents pipeline.

Everything is a pure Column expression (JVM-side, whole-stage codegen) so
each runs as a scan-project with zero shuffles at any scale. Each helper
has an exact DuckDB twin documented inline; keeping both sides identical
is what makes the oracle hash-match (floats: same op order both engines).

Mirrors no reference code — viant/etly has no text operators (SURVEY
§2.2, scalar library row); this is the north-star text-analysis surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny built-in language marker profiles for the n-gram/stopword langid
# heuristic. Deterministic and engine-portable; precision on real corpora
# would come from swapping in real trigram profiles, the plan shape stays.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "is"],
    "es": ["el", "la", "de", "los", "que", "y"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "is", "in", "on"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped.
    DuckDB twin: list_filter(regexp_split_to_array(text,'\\s+'), x -> x <> '')."""
    return F.filter(F.split(_col(text), r"\s+"), lambda x: x != "")


def bigrams(toks: Column) -> Column:
    """Adjacent token 2-grams as 'a b' strings; empty for <2 tokens."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def modal_count(arr: Column) -> Column:
    """Count of the most frequent element, O(n log n) per row with NO
    shuffle: sort the array, then a single fold tracks the longest
    equal-run. The naive higher-order form — transform(array_distinct(a),
    t -> size(filter(a, x = t))) — is O(distinct * n) AND re-evaluates
    the array expression per lambda element after projection collapse,
    which measured 160x slower end-to-end. Empty array -> 0."""
    s = F.array_sort(arr)
    return F.aggregate(
        s,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a.prev, a.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a.best, F.when(x == a.prev, a.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda a: a.best,
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column | str, chunk: int = 4) -> Column:
    """BPE-ish subword count: words split into ceil(len/chunk) chunks.
    DuckDB twin: list_sum(list_transform(toks, t -> (length(t)+c-1)//c))."""
    return bpe_token_count_from(tokens(text), chunk)


def bpe_token_count_from(toks: Column | str, chunk: int = 4) -> Column:
    """``bpe_token_count`` over an already-tokenized array — the form a
    shared tokenized base feeds so the tokenizer pass is not repeated
    per consumer (text_curation_split's pack branch)."""
    return F.coalesce(
        F.aggregate(
            _col(toks),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + ((F.length(t) + (chunk - 1)) / chunk).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
    )


def marker_hits(toks: Column, markers: list[str]) -> Column:
    """How many tokens are in the marker list (order-independent count)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(toks: Column) -> Column:
    """Fraction of tokens that are stopwords; 0.0 for empty docs.
    Exact int division both sides → bit-identical doubles."""
    return F.when(F.size(toks) > 0, marker_hits(toks, STOPWORDS) / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def punct_ratio(text: Column | str) -> Column:
    """Non-alphanumeric-non-space chars / total chars."""
    c = _col(text)
    return F.when(
        F.length(c) > 0,
        F.length(F.regexp_replace(c, "[A-Za-z0-9 ]", "")) / F.length(c),
    ).otherwise(F.lit(0.0))


def langid_scores(toks: Column) -> dict[str, Column]:
    """Marker-hit score per candidate language."""
    return {lang: marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}


def langid(toks: Column) -> Column:
    """Argmax language with deterministic tie-break (en > es > de > fr);
    'und' when no marker hits. CASE-chain is identical in the SQL twin."""
    s = langid_scores(toks)
    return (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            F.lit("en"),
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] > 0), F.lit("es"))
        .when((s["de"] >= s["fr"]) & (s["de"] > 0), F.lit("de"))
        .when(s["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality in [0,1]: length component + lexical diversity +
    (1 - stopword density). Same arithmetic, same order, both engines."""
    toks = tokens(text)
    n = F.size(toks)
    length_c = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    stop_c = F.lit(1.0) - stopword_ratio(toks)
    return F.round(length_c * 0.3 + diversity * 0.4 + stop_c * 0.3, 6)


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def fingerprint(text: Column | str, prefix: int | None = None) -> Column:
    """md5 fingerprint of the normalized text (or its first `prefix` chars
    — a cheap rolling-hash stand-in for shift-resistant matching)."""
    norm = normalize_text(text)
    if prefix is not None:
        norm = F.substring(norm, 1, prefix)
    return F.md5(norm.cast("binary"))


# PII redaction rules for the pipeline-surface scrubber (builtins
# `etly.RedactPII`): applied IN ORDER, each on the output of the
# previous rule, so counts and replacements always agree. Heuristic
# regexes in the portable subset (word boundaries, no lookaround — the
# same patterns run under Java regex and RE2). This is a pipeline
# transformer, pytest-covered (tests/test_pii.py), not an
# oracle-checked catalog expression: the synthetic documents table
# carries no PII, real transfer fixtures do.
PII_RULES: list[tuple[str, str, str]] = [
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def redact_pii(text: Column | str) -> dict[str, Column]:
    """Sequentially redact every PII_RULES class from ``text``.

    Returns ``{"text": redacted, "n_<class>": per-class count, ...}``
    — counts are evaluated on the text as it stood when that rule ran
    (exactly what the rule replaced). One projection, #rules regex
    passes per row, whole-stage codegen'd: a scan-speed scrubber with
    zero shuffles at any corpus size."""
    cur = _col(text)
    out: dict[str, Column] = {}
    for name, pat, repl in PII_RULES:
        out[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    out["text"] = cur
    return out
