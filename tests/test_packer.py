"""Materializing sequence packer (operators/packer.py): exact
concat-and-split semantics, reconstruction, partitioning invariance,
and the real-BPE end-to-end shard build."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etly_spark.operators.packer import pack_token_sequences


def _pack_reference(docs, seq_len):
    """Single-machine reference: concatenate in doc order, split."""
    stream = [t for _, ids in sorted(docs) for t in ids]
    return [stream[i : i + seq_len] for i in range(0, len(stream), seq_len)]


def test_pack_golden_straddle_and_tail(spark):
    docs = [(1, [10, 11, 12]), (2, [20]), (3, [30, 31, 32, 33, 34]), (4, [40, 41])]
    df = spark.createDataFrame(docs, "doc_id long, token_ids array<int>")
    got = sorted(pack_token_sequences(df, seq_len=4).collect(),
                 key=lambda r: r.seq_no)
    want = _pack_reference(docs, 4)  # [10,11,12,20],[30,31,32,33],[34,40,41]
    assert [list(r.token_ids) for r in got] == want
    assert [r.seq_no for r in got] == [0, 1, 2]
    assert [r.n_tokens for r in got] == [4, 4, 3]
    # seq 0 straddles docs 1+2; seq 1 is doc 3 only; seq 2 straddles 3+4
    assert [r.n_docs for r in got] == [2, 1, 2]


def test_pack_grouped_streams_are_independent(spark):
    docs = [
        (1, "en", [1, 2, 3]),
        (2, "de", [7, 8]),
        (3, "en", [4, 5]),
        (4, "de", [9]),
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, token_ids array<int>")
    got = {
        (r.lang, r.seq_no): list(r.token_ids)
        for r in pack_token_sequences(df, seq_len=4, group_cols=["lang"]).collect()
    }
    assert got == {
        ("en", 0): [1, 2, 3, 4],
        ("en", 1): [5],
        ("de", 0): [7, 8, 9],
    }


def test_pack_partitioning_invariance_and_reconstruction(spark):
    import random

    rng = random.Random(13)
    docs = [
        (i, [rng.randrange(1000) for _ in range(rng.randrange(0, 9))])
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, token_ids array<int>").repartition(17)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "41")
        rows = pack_token_sequences(df, seq_len=16).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    got = [list(r.token_ids) for r in sorted(rows, key=lambda r: r.seq_no)]
    assert got == _pack_reference(docs, 16)
    # exact reconstruction: flattening the sequences IS the doc stream
    flat = [t for s in got for t in s]
    assert flat == [t for _, ids in sorted(docs) for t in ids]


def test_pack_real_bpe_shard_build(spark):
    """The full shard build on the real corpus slice: trained-BPE
    encode -> pack -> every sequence full except the tail, and the
    token stream reconstructs exactly."""
    from etly_spark.io.tables import load_table
    from etly_spark.operators.bpe import bpe_encode, train_bpe

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(80)
    merges = train_bpe(d, n_merges=64)
    enc = bpe_encode(d.select("doc_id", "text"), merges)
    seqs = sorted(
        pack_token_sequences(enc, seq_len=128, ids_col="tokens").collect(),
        key=lambda r: r.seq_no,
    )
    assert seqs, "corpus slice must produce sequences"
    assert all(r.n_tokens == 128 for r in seqs[:-1])
    assert 0 < seqs[-1].n_tokens <= 128
    total = sum(r.n_tokens for r in seqs)
    want_total = enc.select(F.sum(F.size("tokens"))).collect()[0][0]
    assert total == want_total
