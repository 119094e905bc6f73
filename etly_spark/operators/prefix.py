"""Banded two-phase running sums / ranks — the de-skewed form of
``SUM(x) OVER (PARTITION BY part ORDER BY key ROWS UNBOUNDED PRECEDING)``
and ``row_number() OVER (PARTITION BY part ORDER BY key)``.

Why: a window partitioned solely by a low-cardinality skewed key (the
curation family's per-language windows) funnels the dominant group
through ONE task's sort at scale; an English-heavy corpus at 100 TB puts
~all the data in a single partition. The classic fix is the two-phase
parallel prefix sum:

1. **band** the ordering key into a *bounded, order-preserving* set of
   sub-partitions (caller supplies the band expression: md5 first-byte,
   ``floor(bits*32)``, doc_id ranges — each monotone in the window's
   ORDER BY and bounded by construction, not by data size);
2. aggregate per-(part, band) totals — a map-side-combinable groupBy
   producing at most ``n_parts * n_bands`` tiny rows;
3. turn the totals into *exclusive prefix offsets* with a broadcast
   band<band self-join over that tiny table (≤ n_bands² comparisons
   per part — JVM-trivial, and fully DECLARATIVE: no driver collect,
   no extra build-time job, so Catalyst schedules the offsets subtree
   concurrently with everything else in the final DAG);
4. run the running sum INSIDE each (part, band) — every window
   partition is now ``1/n_bands`` of a group, and the plan contains no
   window keyed solely on the skewed column.

The result is bit-identical to the single-window form (integer sums,
same total order), so oracle agreement is preserved exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A NULL band would break bit-identity silently: the band<band
# inequality is NULL against every band, so NULL-band rows would drop
# out of every offset AND start their own cumsum at 0. Spark's default
# ordering is NULLS FIRST, so rows whose order key (hence band
# expression) is NULL sort before everything — mapping their band to
# long-min reproduces exactly that placement.
_NULL_BAND = -(1 << 62)


def _null_safe_match(cols: list[str], prefix: str) -> Column:
    """AND-conjunction of eqNullSafe(col, <prefix>col) — PARTITION BY
    treats NULL as its own group (real corpora have NULL langs), so
    every join in this module must too; a plain equi-join would
    silently DROP null-key rows."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"{prefix}{c}"))
    return cond


def banded_running_sum(
    df: DataFrame,
    part_cols: list[str],
    band: Column,
    order_cols: list,
    value: Column,
    out_col: str,
    band_col: str = "_band",
) -> DataFrame:
    """Inclusive running sum of ``value`` over rows ordered by
    ``order_cols`` within ``part_cols``, computed without any window
    partitioned solely on ``part_cols`` — and without any driver-side
    action: the whole construction is one lazy DAG.

    ``band`` MUST be monotone non-decreasing in the ``order_cols``
    ordering within each part (equal order keys must band equally), and
    bounded in cardinality by construction; a NULL band (a NULL order
    key under NULLS FIRST) maps to the lowest band. ``value`` must be
    integral (offsets accumulate exactly in int64); NULL values follow
    SQL running-sum semantics exactly — skipped, and the sum is NULL
    only while the prefix holds no non-null value yet.

    Returns ``df`` + ``band_col`` + ``out_col``; row count preserved.
    """
    banded = df.withColumn(
        band_col, F.coalesce(band.cast("long"), F.lit(_NULL_BAND))
    )

    # per-band sum AND non-null count: the count reproduces SQL NULL
    # semantics (a running SUM is NULL until the first non-null value,
    # then skips nulls) without which a NULL-leading band would turn
    # offset+NULL into NULL where the window form keeps the offset
    totals = banded.groupBy(*part_cols, band_col).agg(
        F.sum(value).cast("long").alias("_band_sum"),
        F.count(value).alias("_band_cnt"),
    )
    rhs = totals.select(
        *[F.col(c).alias(f"_r_{c}") for c in part_cols],
        F.col(band_col).alias("_r_band"),
        F.col("_band_sum").alias("_r_sum"),
        F.col("_band_cnt").alias("_r_cnt"),
    )
    # exclusive prefix offsets: for each (part, band), the sum/count of
    # every strictly-lower band's total — a broadcast self-join of the
    # band-level table against itself (bounded rows on both sides)
    offsets = (
        totals.join(
            F.broadcast(rhs),
            _null_safe_match(part_cols, "_r_") & (F.col("_r_band") < F.col(band_col)),
            "left",
        )
        .groupBy(*part_cols, band_col)
        .agg(
            F.coalesce(F.sum("_r_sum"), F.lit(0)).alias("_band_offset"),
            F.coalesce(F.sum("_r_cnt"), F.lit(0)).alias("_cnt_offset"),
        )
    )

    w = (
        Window.partitionBy(*part_cols, band_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    keys = [*part_cols, band_col]
    off = offsets.select(
        *[F.col(c).alias(f"_o_{c}") for c in keys], "_band_offset", "_cnt_offset"
    )
    nonnull_prefix = F.col("_cnt_offset") + F.count(value).over(w)
    running = F.col("_band_offset") + F.coalesce(F.sum(value).over(w), F.lit(0))
    return (
        banded.join(F.broadcast(off), _null_safe_match(keys, "_o_"))
        .withColumn(
            out_col,
            F.when(nonnull_prefix > 0, running.cast("long")).otherwise(
                F.lit(None).cast("long")
            ),
        )
        .drop("_band_offset", "_cnt_offset", *[f"_o_{c}" for c in keys])
    )


def banded_row_number(
    df: DataFrame,
    part_cols: list[str],
    band: Column,
    order_cols: list,
    out_col: str,
    band_col: str = "_band",
) -> DataFrame:
    """``row_number() OVER (PARTITION BY part ORDER BY order_cols)``
    via the banded running sum of 1 — exact, de-skewed, lazy."""
    return banded_running_sum(
        df, part_cols, band, order_cols, F.lit(1), out_col, band_col
    )


def with_range_band(
    df: DataFrame,
    part_cols: list[str],
    id_col: str,
    n_bands: int = 2048,
    band_col: str = "_band",
) -> DataFrame:
    """Attach an order-preserving band over an integer id column:
    per-part ``floor((id - min) / width)`` with width sized so the band
    count is bounded by ``n_bands`` regardless of id density. The
    per-part (min, max) stats are a tiny broadcast-joined aggregate —
    declarative, no driver collect, shares its scan with the caller's
    plan (and the caller's persist, if any). A NULL id yields a NULL
    band, which ``banded_running_sum`` maps to the lowest band
    (NULLS FIRST)."""
    stats = df.groupBy(*part_cols).agg(
        F.min(id_col).alias("_rb_lo"), F.max(id_col).alias("_rb_hi")
    )
    # Exact integer arithmetic end-to-end: long `/` is DOUBLE division
    # (loses integer precision past 2^53 — a band boundary could round
    # a higher id into a lower band, silently violating the
    # monotonicity the cumsum depends on), and decimal `/` ROUNDS at
    # the result scale (1999999/2000000 -> 1.000000, floor 1 — off by
    # one band). The `div` operator is true integral division on
    # DECIMAL(38,0) operands: exact for the full int64 id domain, no
    # wrap on extreme spans. width = (hi-lo) div n + 1 == the exact
    # integer ceil((hi-lo+1)/n).
    dec = "decimal(38,0)"
    width = (
        F.expr(
            f"(cast(_rb_hi as {dec}) - cast(_rb_lo as {dec})) div {int(n_bands)}"
        )
        + F.lit(1)
    ).cast(dec)
    st = stats.select(
        *[F.col(c).alias(f"_s_{c}") for c in part_cols],
        "_rb_lo",
        width.alias("_rb_w"),
    )
    return (
        df.join(F.broadcast(st), _null_safe_match(part_cols, "_s_"))
        .withColumn(
            band_col,
            F.expr(
                f"(cast({id_col} as {dec}) - cast(_rb_lo as {dec})) div "
                f"cast(_rb_w as {dec})"
            ).cast("long"),
        )
        .drop("_rb_lo", "_rb_w", *[f"_s_{c}" for c in part_cols])
    )
