"""Incremental keyed-aggregate maintenance (operators/incremental_agg):
fold-equals-batch, replay idempotence, merge-aware compaction, and the
avg-via-two-partials pattern."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etly_spark.operators import incremental_agg as IA

KEYS = ["src"]
MERGES = {"n": "sum", "tot": "sum", "lo": "min", "hi": "max"}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "src string, v long")


def _partial(df):
    return df.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("tot"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )


def _current(spark, state):
    return {
        r["src"]: (r["n"], r["tot"], r["lo"], r["hi"])
        for r in IA.read(spark, state, keys=KEYS, merges=MERGES).collect()
    }


BATCHES = [
    [("a", 1), ("a", 5), ("b", 10)],
    [("a", 3), ("c", 7)],
    [("b", -2), ("c", 100), ("c", 0)],
]


def test_folds_equal_batch_aggregate(spark, tmp_path):
    state = str(tmp_path / "state")
    for i, rows in enumerate(BATCHES):
        assert IA.fold(state, _partial(_batch(spark, rows)), i, keys=KEYS, merges=MERGES)
    want = {
        r["src"]: (r["n"], r["tot"], r["lo"], r["hi"])
        for r in _partial(_batch(spark, sum(BATCHES, []))).collect()
    }
    assert _current(spark, state) == want
    assert want["c"] == (3, 107, 0, 100)


def test_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    for i, rows in enumerate(BATCHES):
        IA.fold(state, _partial(_batch(spark, rows)), i, keys=KEYS, merges=MERGES)
    before = _current(spark, state)
    # crash-replay of epoch 1 overwrites its own partial, not appends
    IA.fold(state, _partial(_batch(spark, BATCHES[1])), 1, keys=KEYS, merges=MERGES)
    assert _current(spark, state) == before


def test_compaction_preserves_values_and_skips_covered_replays(spark, tmp_path):
    state = str(tmp_path / "state")
    for i, rows in enumerate(BATCHES):
        IA.fold(state, _partial(_batch(spark, rows)), i, keys=KEYS, merges=MERGES)
    before = _current(spark, state)
    assert IA.compact(spark, state, keys=KEYS, merges=MERGES, threshold=1)
    assert _current(spark, state) == before
    # one base, no loose epochs
    names = os.listdir(state)
    assert [d for d in names if d.startswith("base-")] == ["base-000001"]
    assert not [d for d in names if d.startswith("epoch=")]
    # replaying a compacted epoch is a refused no-op (it is already
    # merged into the base — applying it again would double-count)
    assert not IA.fold(state, _partial(_batch(spark, BATCHES[0])), 0, keys=KEYS, merges=MERGES)
    assert _current(spark, state) == before
    # new epochs keep folding on top of the base
    IA.fold(state, _partial(_batch(spark, [("a", 100)])), 9, keys=KEYS, merges=MERGES)
    after = _current(spark, state)
    assert after["a"] == (before["a"][0] + 1, before["a"][1] + 100, before["a"][2], 100)
    # second compaction tier covers the union
    assert IA.compact(spark, state, keys=KEYS, merges=MERGES, threshold=0)
    assert _current(spark, state) == after
    assert not IA.fold(state, _partial(_batch(spark, BATCHES[1])), 1, keys=KEYS, merges=MERGES)


def test_below_threshold_compaction_is_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    IA.fold(state, _partial(_batch(spark, BATCHES[0])), 0, keys=KEYS, merges=MERGES)
    assert not IA.compact(spark, state, keys=KEYS, merges=MERGES, threshold=16)


def test_avg_via_two_partials(spark, tmp_path):
    """Algebraic aggregates decompose into mergeable partials: avg =
    folded sum / folded count — exact at any fold order for ints."""
    state = str(tmp_path / "avg")
    for i, rows in enumerate(BATCHES):
        IA.fold(
            state,
            _batch(spark, rows).groupBy("src").agg(
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
            ),
            i,
            keys=KEYS,
            merges={"s": "sum", "c": "sum"},
        )
    cur = IA.read(spark, state, keys=KEYS, merges={"s": "sum", "c": "sum"})
    got = {r["src"]: r["avg"] for r in cur.select("src", (F.col("s") / F.col("c")).alias("avg")).collect()}
    assert got == {"a": 3.0, "b": 4.0, "c": 107 / 3}


def test_read_empty_state_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        IA.read(spark, str(tmp_path / "nope"), keys=KEYS, merges=MERGES)
