"""Z-order layout: parquet min/max file pruning must work on BOTH
clustered columns — a 1-D sort prunes perfectly on its sort column and
not at all on the other; Z-order trades a little x-pruning for real
pruning on every clustered column. Measured from real parquet footers
by counting files a narrow range predicate cannot skip."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from etly_spark.operators.layout import zorder_by, zorder_key


def _files_hit(path_glob: str, col_idx: int, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files)."""
    hit = total = 0
    for p in glob.glob(path_glob):
        md = pq.ParquetFile(p).metadata
        fmin = min(
            md.row_group(i).column(col_idx).statistics.min
            for i in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(i).column(col_idx).statistics.max
            for i in range(md.num_row_groups)
        )
        total += 1
        if fmax >= lo and fmin <= hi:
            hit += 1
    return hit, total


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    n = 200_000
    full = 100_000
    df = spark.range(n).selectExpr(
        "cast(pmod(hash(id), 100000) as long) as x",
        "cast(pmod(hash(id + 7), 100000) as long) as y",
    )
    plain = str(tmp_path / "plain")
    zed = str(tmp_path / "zed")
    # baseline: cluster on x only (what a naive ORDER BY x write does)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(plain)
    zorder_by(df, ["x", "y"], n_files=16).write.parquet(zed)

    # a 2%-wide range predicate on each column
    lo, hi = 30_000, 32_000  # inside one rank quartile, away from z-quadrant edges
    pg, zg = plain + "/part-*.parquet", zed + "/part-*.parquet"
    plain_x_hit, plain_n = _files_hit(pg, 0, lo, hi)
    plain_y_hit, _ = _files_hit(pg, 1, lo, hi)
    zed_x_hit, zed_n = _files_hit(zg, 0, lo, hi)
    zed_y_hit, _ = _files_hit(zg, 1, lo, hi)
    assert plain_n == 16 and zed_n == 16

    # 1-D sort: perfect on x, useless on y (every file must be read)
    assert plain_x_hit <= 2
    assert plain_y_hit == 16
    # z-order: BOTH columns prune — a selective predicate on either
    # column skips most files. Tolerance 10/16 matches the approx twin:
    # file boundaries jitter with suite-order-dependent task scheduling
    # (full-suite runs measured 9 where solo runs measure 8).
    assert zed_x_hit <= 10, zed_x_hit
    assert zed_y_hit <= 10, zed_y_hit
    # and y goes from no pruning (16/16) to real pruning — same 10/16
    # tolerance as above, NOT plain_y_hit//2 == 8, which would
    # reintroduce the boundary-jitter flake the relaxation fixed
    assert zed_y_hit < plain_y_hit


def test_zorder_approx_prunes_like_exact(spark, tmp_path):
    """The sampled-quantile scale path must deliver the same pruning
    property as the exact-rank form: both clustered columns prune."""
    from etly_spark.operators.layout import zorder_by_approx

    df = spark.range(200_000).selectExpr(
        "cast(pmod(hash(id), 100000) as long) as x",
        "cast(pmod(hash(id + 7), 100000) as long) as y",
    )
    zed = str(tmp_path / "zedq")
    zorder_by_approx(df, ["x", "y"], n_files=16).write.parquet(zed)
    lo, hi = 30_000, 32_000
    zg = zed + "/part-*.parquet"
    x_hit, n = _files_hit(zg, 0, lo, hi)
    y_hit, _ = _files_hit(zg, 1, lo, hi)
    assert n == 16
    # approx cut-points jitter quadrant boundaries slightly vs the
    # exact ranks; the pruning property is "both columns skip a real
    # fraction of files", not an exact file count
    assert x_hit <= 10, x_hit
    assert y_hit <= 10, y_hit


def test_interleave_rejects_overflow(spark):
    import pytest

    from etly_spark.operators.layout import _interleave
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="max 63"):
        _interleave([F.lit(0)] * 5, bits=16)


def test_cluster_by_target_config(spark, tmp_path):
    """Z-order via the Transfer config surface: a parquet dataset sink
    with ClusterBy lands files whose footers prune on BOTH clustered
    columns (the reference's name-in-config contract over the layout
    operator)."""
    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    store = tmp_path / "store"
    spark.range(120_000).selectExpr(
        "id",
        "cast(pmod(hash(id), 100000) as long) as x",
        "cast(pmod(hash(id + 7), 100000) as long) as y",
    ).write.parquet(str(store / "facts.parquet"))
    t = Transfer(
        name="clustered-sink",
        source=Source(
            name="SELECT id, x, y FROM facts",
            type="datastore",
            ds_config={"DriverName": "parquet", "Parameters": {"url": f"file://{store}"}},
        ),
        target=Target(
            name=str(tmp_path / "out" / "clustered"),
            data_format="parquet",
            cluster_by=["x", "y"],
            cluster_files=16,
        ),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    glob_pat = str(tmp_path / "out" / "clustered" / "part-*.parquet")
    lo, hi = 30_000, 32_000
    x_hit, n = _files_hit(glob_pat, 1, lo, hi)
    y_hit, _ = _files_hit(glob_pat, 2, lo, hi)
    assert n >= 8
    assert x_hit <= n * 2 // 3, (x_hit, n)
    assert y_hit <= n * 2 // 3, (y_hit, n)
    # and nothing lost
    back = spark.read.parquet(str(tmp_path / "out" / "clustered"))
    assert back.count() == 120_000


def test_zorder_key_locality(spark):
    """Interleaving preserves order on equal coordinates: the key of
    (r, r) is strictly monotone in r, and distinct points get distinct
    keys."""
    df = spark.range(64).selectExpr("id as x", "id as y")
    rows = df.withColumn("z", zorder_key(["x", "y"])).orderBy("x").collect()
    zs = [r.z for r in rows]
    assert zs == sorted(zs)
    assert len(set(zs)) == len(zs)
