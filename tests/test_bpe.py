"""Real BPE: deterministic training, lossless round-trip, compression."""

from __future__ import annotations

from etly_spark.operators.bpe import _encode_word, bpe_encode, train_bpe


def test_train_merges_expected_pair(spark):
    # 'ab' appears everywhere -> the first merge must be (a, b)
    df = spark.createDataFrame([(i, "abab abxy abba") for i in range(4)], "doc_id long, text string")
    merges = train_bpe(df, n_merges=3)
    assert merges[0] == ("a", "b")
    # deterministic across invocations and partitioning
    assert merges == train_bpe(df.repartition(3), n_merges=3)


def test_encode_word_applies_rank_order():
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "</w>"): 2}
    assert _encode_word("abc", ranks) == ["abc", "</w>"]
    assert _encode_word("cab", ranks) == ["c", "ab", "</w>"]
    assert _encode_word("zzz", {}) == ["z", "z", "z", "</w>"]


def test_bpe_roundtrip_and_compression(spark):
    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the the the quick quick fox"),
        (2, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = train_bpe(df, n_merges=50)
    out = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    for doc_id, text in docs:
        toks = out[doc_id].tokens
        # lossless: stripping </w> markers and joining recovers the words
        words = "".join(toks).replace("</w>", " ").split()
        assert words == text.split()
        assert out[doc_id].n_bpe_tokens == len(toks)
    # trained merges compress: fewer tokens than characters for repeats
    assert 0 < out[1].n_bpe_tokens < len(docs[1][1])


def test_bpe_on_corpus_sample(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(df, n_merges=100)
    assert len(merges) == 100
    enc = bpe_encode(df.limit(50), merges)
    rows = enc.collect()
    assert len(rows) == 50
    # every doc's BPE token count is between word count and char count
    texts = {r.doc_id: r.text for r in df.limit(50).collect()}
    for r in rows:
        t = texts[r.doc_id]
        assert len(t.split()) <= r.n_bpe_tokens <= len(t) + len(t.split())
