"""Trained quality classifier — deterministic, oracle-replicable.

Real curation pipelines replace hand-tuned quality gates with a cheap
trained classifier (the fastText/CCNet pattern: weak labels from a
heuristic, a linear model distilled onto a feature subset so scoring is
one fused expression per document). This module trains a least-squares
linear probability model in CLOSED FORM so a SQL oracle can replicate
every arithmetic step bit-for-bit:

- features are rounded to 6 dp and accumulated as exact DECIMAL
  sufficient statistics (order-independent, identical in both engines);
- each statistic is converted to double (one correctly-rounded cast,
  identical bits both sides);
- the 3x3 normal equations solve uses explicit Cramer formulas written
  in ONE canonical operation order, mirrored verbatim by the SQL
  (``LR_SOLVE_SQL``) — so Spark's driver-side Python solve and DuckDB's
  in-query solve produce the same weight bits, and the per-document
  score ``w0 + w1*r1 + w2*r2`` matches exactly.

Weak labels: y = 1 when the doc trips the Gopher modal-token
repetition rule (top_token_frac > 0.2) — the EXPENSIVE per-doc signal
(modal_count is an O(n log n) sort-fold per document); the trained
scorer predicts it from two cheap ratio features, the standard
distill-an-expensive-label pattern. The flag threshold is 2x the
corpus prior expressed division-free (score*n >= 2*sy), so the checked
decision needs no extra float rounding. Scale: training is ONE
map-side-combinable aggregate producing 9 numbers (corpus-size-
independent collect, the ``mix_thresholds`` precedent); scoring is a
codegen'd projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "lr_features",
    "lr_stats",
    "lr_stats_plan",
    "solve_weights",
    "stats_from_row",
    "LR_STATS_SQL",
    "LR_SOLVE_SQL",
]

# Canonical Cramer solve, shared verbatim by the Python and SQL sides.
# A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]], rhs = [sy, s1y, s2y].
_DET = "{n}*({s11}*{s22} - {s12}*{s12}) - {s1}*({s1}*{s22} - {s12}*{s2}) + {s2}*({s1}*{s12} - {s11}*{s2})"
_W0 = "({sy}*({s11}*{s22} - {s12}*{s12}) - {s1}*({s1y}*{s22} - {s12}*{s2y}) + {s2}*({s1y}*{s12} - {s11}*{s2y})) / ({det})"
_W1 = "({n}*({s1y}*{s22} - {s12}*{s2y}) - {sy}*({s1}*{s22} - {s12}*{s2}) + {s2}*({s1}*{s2y} - {s1y}*{s2})) / ({det})"
_W2 = "({n}*({s11}*{s2y} - {s1y}*{s12}) - {s1}*({s1}*{s2y} - {s1y}*{s2}) + {sy}*({s1}*{s12} - {s11}*{s2})) / ({det})"

_NAMES = ("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")


def lr_features(toks: F.Column) -> dict[str, F.Column]:
    """The classifier's feature/label columns from a token array:
    r1 = lexical diversity, r2 = non-stopword density (both rounded to
    6 dp — the exactness boundary), y = the Gopher modal-token
    repetition label (top_token_frac > 0.2 — the expensive signal the
    cheap features are trained to predict). Mirrors the SQL in
    queries/text.py's text_quality oracle."""
    from etly_spark.functions import text as T

    n = F.size(toks)
    diversity = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0))
    stop_c = F.lit(1.0) - T.stopword_ratio(toks)
    top_tok = F.when(n > 0, T.modal_count(toks) / n).otherwise(F.lit(0.0))
    return {
        "r1": F.round(diversity, 6),
        "r2": F.round(stop_c, 6),
        "y": F.when(top_tok > 0.2, F.lit(1)).otherwise(F.lit(0)),
    }


def lr_stats_plan(feat: DataFrame) -> DataFrame:
    """The sufficient-statistics aggregate as a 1-row PLAN: one
    map-side combinable aggregate, nine numbers at any corpus size.
    DECIMAL(18,6) inputs make every sum exact (shuffle-order
    independent) — and exact through a parquet roundtrip, so the plan
    can be STAGED (text_quality keys it on documents.parquet: training
    is an index-build cost paid once per corpus snapshot)."""
    c1 = F.col("r1").cast("decimal(18,6)")
    c2 = F.col("r2").cast("decimal(18,6)")
    cy = F.col("y").cast("decimal(18,6)")
    return feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c1).alias("s1"),
        F.sum(c2).alias("s2"),
        F.sum(cy).alias("sy"),
        F.sum(c1 * c1).alias("s11"),
        F.sum(c1 * c2).alias("s12"),
        F.sum(c2 * c2).alias("s22"),
        F.sum(c1 * cy).alias("s1y"),
        F.sum(c2 * cy).alias("s2y"),
    )


def stats_from_row(row) -> dict[str, float]:
    """DECIMAL sums -> double: single correctly-rounded casts, matching
    the oracle's CAST(... AS DOUBLE) bit-for-bit — identical whether the
    row comes straight off the aggregate or back from a staged parquet
    (decimal storage is exact)."""
    return {k: float(row[k]) for k in _NAMES}


def lr_stats(feat: DataFrame) -> dict[str, float]:
    """Exact sufficient statistics of (r1, r2, y) — the unstaged form
    (one aggregate + collect), used by the config-addressable pipeline
    builtin where training is per-window by design."""
    return stats_from_row(lr_stats_plan(feat).collect()[0])


def solve_weights(st: dict[str, float]) -> tuple[float, float, float]:
    """Cramer's rule on the 3x3 normal equations, evaluated in the
    module's canonical operation order (the _DET/_W* formula strings —
    the SQL oracle runs the SAME strings, so the weight doubles agree
    bit-for-bit). eval() over the vetted formula constants with only
    the stats dict in scope; no corpus data touches this path."""
    det = eval(_DET.format(**{k: f"st['{k}']" for k in _NAMES}))  # noqa: S307
    if det == 0.0:
        # Degenerate corpus (fewer than 3 distinct (r1, r2) points —
        # e.g. a tiny or homogeneous batch): fall back to the null
        # model w = 0 instead of failing the whole stage. clf_score
        # becomes 0.0, and because every flag site conjoins sy > 0
        # (the r10 zero-prior guard), clf_flag never fires under the
        # null model; LR_SOLVE_SQL mirrors this CASE branch verbatim.
        return 0.0, 0.0, 0.0
    names = {k: f"st['{k}']" for k in _NAMES}
    w0 = eval(_W0.format(det=repr(det), **names))  # noqa: S307
    w1 = eval(_W1.format(det=repr(det), **names))  # noqa: S307
    w2 = eval(_W2.format(det=repr(det), **names))  # noqa: S307
    return w0, w1, w2


# --- SQL twins (DuckDB) ----------------------------------------------
# Stats over a relation exposing rounded feature columns r1, r2 and the
# 0/1 weak label y (DECIMAL sums cast to DOUBLE — the exactness
# boundary matches lr_stats verbatim).
LR_STATS_SQL = """
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(r1 AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(r2 AS DECIMAL(18,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(r1 AS DECIMAL(18,6)) * CAST(r1 AS DECIMAL(18,6))) AS DOUBLE) AS s11,
         CAST(SUM(CAST(r1 AS DECIMAL(18,6)) * CAST(r2 AS DECIMAL(18,6))) AS DOUBLE) AS s12,
         CAST(SUM(CAST(r2 AS DECIMAL(18,6)) * CAST(r2 AS DECIMAL(18,6))) AS DOUBLE) AS s22,
         CAST(SUM(CAST(r1 AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(r2 AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS s2y
"""

_DET_SQL = _DET.format(**{k: k for k in _NAMES})


def _guarded(expr: str) -> str:
    """The SQL twin of solve_weights' det == 0 null-model fallback."""
    return f"CASE WHEN ({_DET_SQL}) = 0 THEN CAST(0 AS DOUBLE) ELSE {expr} END"


LR_SOLVE_SQL = (
    "SELECT "
    + _guarded(_W0.format(det=_DET_SQL, **{k: k for k in _NAMES}))
    + " AS w0, "
    + _guarded(_W1.format(det=_DET_SQL, **{k: k for k in _NAMES}))
    + " AS w1, "
    + _guarded(_W2.format(det=_DET_SQL, **{k: k for k in _NAMES}))
    + " AS w2"
)
