"""Banded two-phase running sums / ranks — the de-skewed form of
``SUM(x) OVER (PARTITION BY part ORDER BY key ROWS UNBOUNDED PRECEDING)``
and ``row_number() OVER (PARTITION BY part ORDER BY key)``.

Why: a window partitioned solely by a low-cardinality skewed key (the
curation family's per-language windows — reference parity
``processor.go``-style per-group folds) funnels the dominant group
through ONE task's sort at scale; an English-heavy corpus at 100 TB puts
~all the data in a single partition. The classic fix is the two-phase
parallel prefix sum:

1. **band** the ordering key into a *bounded, order-preserving* set of
   sub-partitions (caller supplies the band expression: md5 first-byte,
   ``floor(bits*32)``, doc_id ranges — each monotone in the window's
   ORDER BY and bounded by construction, not by data size);
2. aggregate per-(part, band) totals — a map-side-combinable groupBy,
   result is at most ``n_parts * n_bands`` tiny rows;
3. turn the totals into *exclusive prefix offsets* on the driver
   (bounded collect — the `unigram_perplexity_approx` cut-points
   precedent) and broadcast-join them back;
4. run the running sum INSIDE each (part, band) — every window
   partition is now ``1/n_bands`` of a group, and the plan contains no
   window keyed solely on the skewed column.

The result is bit-identical to the single-window form (integer sums,
same total order), so oracle agreement is preserved exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def banded_running_sum(
    spark: SparkSession,
    df: DataFrame,
    part_cols: list[str],
    band: Column,
    order_cols: list,
    value: Column,
    out_col: str,
    band_col: str = "_band",
    return_totals: bool = False,
):
    """Inclusive running sum of ``value`` over rows ordered by
    ``order_cols`` within ``part_cols``, computed without any window
    partitioned solely on ``part_cols``.

    ``band`` MUST be monotone non-decreasing in the ``order_cols``
    ordering within each part (equal order keys must band equally), and
    bounded in cardinality by construction. ``value`` must be integral
    (offsets accumulate exactly in int64).

    Returns ``df`` + ``band_col`` + ``out_col``; row count preserved.
    With ``return_totals`` also returns ``{part_key_tuple: sum(value)}``
    — free per-part totals from the already-collected band sums.
    """
    banded = df.withColumn(band_col, band.cast("long"))

    totals = (
        banded.groupBy(*part_cols, band_col)
        .agg(F.sum(value).alias("_band_sum"))
        .collect()
    )
    # Exclusive prefix offsets per part, in band order — driver-side
    # over a bounded (n_parts * n_bands) list, never corpus-sized.
    by_part: dict[tuple, list] = {}
    for r in totals:
        by_part.setdefault(tuple(r[c] for c in part_cols), []).append(
            (r[band_col], r["_band_sum"])
        )
    rows = []
    for key, lst in by_part.items():
        lst.sort(key=lambda t: t[0])
        acc = 0
        for band_val, s in lst:
            rows.append((*key, band_val, acc))
            acc += int(s)
    first = banded.select(*part_cols, band_col).schema
    schema = StructType(
        [*first.fields, StructField("_band_offset", LongType(), False)]
    )
    offsets = spark.createDataFrame(rows, schema)

    w = (
        Window.partitionBy(*part_cols, band_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        banded.join(F.broadcast(offsets), [*part_cols, band_col])
        .withColumn(out_col, (F.col("_band_offset") + F.sum(value).over(w)).cast("long"))
        .drop("_band_offset")
    )
    if return_totals:
        part_totals = {
            key: sum(int(s) for _, s in lst) for key, lst in by_part.items()
        }
        return out, part_totals
    return out


def banded_row_number(
    spark: SparkSession,
    df: DataFrame,
    part_cols: list[str],
    band: Column,
    order_cols: list,
    out_col: str,
    band_col: str = "_band",
    return_totals: bool = False,
):
    """``row_number() OVER (PARTITION BY part ORDER BY order_cols)``
    via the banded running sum of 1 — exact, de-skewed. With
    ``return_totals``, the totals are the per-part row counts."""
    return banded_running_sum(
        spark, df, part_cols, band, order_cols, F.lit(1), out_col, band_col,
        return_totals,
    )


def doc_range_band(
    df: DataFrame,
    part_cols: list[str],
    id_col: str,
    n_bands: int = 2048,
) -> Column:
    """Order-preserving band over an integer id column: per-part
    ``floor((id - min) / width)`` with width sized so the band count is
    bounded by ``n_bands`` regardless of id density. The per-part
    (min, max) pre-pass is a column-pruned scan + tiny agg, collected
    and folded into one codegen'd CASE expression (n_parts branches)."""
    stats = (
        df.groupBy(*part_cols)
        .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
        .collect()
    )
    band = F.lit(0).cast("long")
    for r in sorted(stats, key=lambda r: tuple(str(r[c]) for c in part_cols)):
        lo = int(r["_lo"])
        width = max(1, -(-(int(r["_hi"]) - lo + 1) // n_bands))
        cond = F.lit(True)
        for c in part_cols:
            cond = cond & (F.col(c) == r[c])
        band = F.when(cond, F.floor((F.col(id_col) - F.lit(lo)) / F.lit(width))).otherwise(
            band
        )
    return band.cast("long")
