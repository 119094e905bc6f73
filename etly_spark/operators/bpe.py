"""Real byte-pair encoding: train merges on a bounded corpus sample,
broadcast them, encode documents Arrow-batched.

The catalog's oracle-checked token counting uses a BPE-ish ceil(len/4)
chunk rule (SQL-expressible on both engines); THIS module is the real
thing for pipeline use — an actual trained merge table applied
greedily, the GPT-2 tokenizer algorithm shape.

Scale design: training reads a SAMPLE (tokenizers are always trained
on samples — the merge table converges long before the corpus ends)
with a hard byte budget, so driver memory is O(sample), never
O(corpus). Encoding broadcasts the merge ranks and runs as a pure
Arrow map — per-executor parallelism, no shuffle, word-level
caching inside each Arrow batch (natural-language corpora repeat
words; the cache turns per-word merging into a dict hit, and resetting
per batch bounds task memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_bytes: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a hash-deterministic sample.

    Words are whitespace tokens with a trailing end-of-word marker;
    symbols start as characters. Each round merges the most frequent
    adjacent symbol pair (ties broken lexicographically, so training
    is reproducible across runs/partitionings). Returns merges in
    application order.
    """
    # deterministic sample: docs by ascending md5(text) until the byte
    # budget — independent of partitioning and corpus order. Streamed
    # with toLocalIterator so the driver holds one partition of docs,
    # not the whole candidate set; per-doc contributions are clipped to
    # the remaining budget so one huge document cannot blow past it.
    it = (
        df.select(F.col(text_col).alias("t"))
        .withColumn("h", F.md5(F.col("t").cast("binary")))
        .orderBy("h")
        .limit(5000)
        .toLocalIterator()
    )
    corpus: dict[tuple[str, ...], int] = {}
    used = 0
    for row in it:
        if used >= sample_bytes:
            break
        text = (row.t or "")[: sample_bytes - used]
        used += len(text.encode("utf-8", "ignore"))
        for w in text.split():
            key = tuple(w) + ("</w>",)
            corpus[key] = corpus.get(key, 0) + 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, cnt in corpus.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_corpus: dict[tuple[str, ...], int] = {}
        for word, cnt in corpus.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and (word[i], word[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_corpus[key] = new_corpus.get(key, 0) + cnt
        corpus = new_corpus
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(word) + ["</w>"]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


BPE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bpe_tokens", LongType()),
        StructField("tokens", ArrayType(StringType())),
    ]
)


def bpe_encode(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Encode (doc_id, text) with the trained merges: real BPE token
    arrays + counts. Merges travel in the task closure (broadcast-sized:
    a few KB); encoding is a pure Arrow map with a per-batch word cache.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches):
        import pandas as pd

        for pdf in batches:
            # per-batch cache: bounded by the batch's vocabulary, reset
            # between Arrow batches so task memory never tracks the
            # whole partition's vocabulary
            cache: dict[str, list[str]] = {}
            counts, tokens = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                counts.append(len(toks))
                tokens.append(toks)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bpe_tokens": pd.array(counts, dtype="int64"),
                    "tokens": tokens,
                }
            )

    return df.select("doc_id", text_col).mapInPandas(run, BPE_SCHEMA)
