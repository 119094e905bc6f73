"""Data-layout optimization: Z-order (Morton) clustering for parquet
data skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group/file pruning works off per-file min/max statistics,
and those are only tight if rows with similar key values are physically
co-located. A single-column sort tightens one column and destroys the
others; Z-ordering interleaves the bits of several columns' ranks so
every z-ordered file covers a small hyper-rectangle of the key space —
min/max stays tight on ALL clustered columns at once.

Spark-first: ranks come from `percent_rank` (or raw ints scaled), the
Morton code is pure codegen'd bit arithmetic, and the physical
clustering is `repartitionByRange(morton) + sortWithinPartitions` —
a single range shuffle, exactly what a `CLUSTER BY` would plan. No
Python in the hot path.

The reference has no layout story (it moves files verbatim); this is
part of the "what a training-data pipeline needs" extension surface.
Evidence: tests/test_layout.py measures per-file min/max spans
shrinking ~an order of magnitude on both clustered columns vs a
naive single-column sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

BITS = 16  # per-column resolution; 2 cols x 16 bits -> 32-bit morton


def _interleave(cols: list[Column], bits: int = BITS) -> Column:
    """Morton-interleave n fixed-point columns (each in [0, 2^bits)):
    output bit (i*n + j) = bit i of column j. Pure long arithmetic —
    whole-stage codegen, no UDF.

    n*bits must fit in the non-sign bits of a long: Spark's shiftleft
    masks the shift amount to 6 bits (Java semantics), so an
    out-of-range position would silently fold onto low bits, and bit
    63 would flip the key's sign and break range partitioning —
    rejected here instead."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} key bits; max 63 "
            "(lower bits= or cluster fewer columns)"
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftrightunsigned(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def zorder_key(cols: list[str], bits: int = BITS) -> Column:
    """Morton key over the given columns' rank space. percent_rank makes
    the key distribution-uniform (equal-depth), so range partitions are
    balanced regardless of skew in the raw values."""
    ranked = [
        (F.percent_rank().over(Window.orderBy(c)) * ((1 << bits) - 1)).cast("long")
        for c in cols
    ]
    return _interleave(ranked, bits)


def zorder_by(df: DataFrame, cols: list[str], n_files: int, bits: int = BITS) -> DataFrame:
    """Cluster `df` into `n_files` output partitions z-ordered on `cols`.

    One range shuffle on the Morton key; each output file then covers a
    compact hyper-rectangle -> parquet min/max prune on ANY of `cols`.

    Note on the global windows in `zorder_key`: percent_rank over an
    unpartitioned window is a single-partition sort — exact, but a
    bottleneck on a real cluster. `zorder_by_approx` below is the
    scale path: sampled quantile cut-points instead of exact ranks.
    """
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def zorder_by_approx(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    relative_error: float = 0.01,
) -> DataFrame:
    """Scale-path Z-order: equal-depth ranks from `approxQuantile`
    cut-points instead of an exact global sort.

    One sampling pass per column computes 2^bits - 1 cut-points
    (driver memory O(2^bits), Greenwald-Khanna sketch — no global
    sort anywhere); each row's rank is then `count(cuts <= v)` over
    the broadcast literal array — O(2^bits) codegen'd comparisons per
    row, no shuffle — and the Morton interleave + range shuffle is
    identical to the exact form. 8 bits/column resolves 256 quantile
    stripes, far finer than any realistic file count.
    """
    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (n_cuts + 1) for i in range(n_cuts)]
    # ONE sketch pass computes every column's cut-points together
    all_cuts = df.approxQuantile(cols, probs, relative_error)
    ranked = []
    for c, cuts in zip(cols, all_cuts):
        arr = F.array(*[F.lit(float(x)) for x in cuts])
        ranked.append(
            F.size(F.filter(arr, lambda x: x <= F.col(c).cast("double"))).cast("long")
        )
    keyed = df.withColumn("__z", _interleave(ranked, bits))
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
