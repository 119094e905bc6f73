"""Crawl→training-shards capstone: ONE integrated measurement of the
full chain every real consumer of this engine runs (VERDICT r10 item 5).

    warc shards → WET main-text extraction          (config transfer)
      → C4 line dedup → quality gate → trained
        quality classifier + langid signals         (config transfer,
                                                     all builtins)
      → benchmark decontamination (4-gram overlap
        vs a broadcast eval-set)                    (script stage)
      → BPE train+encode → fixed-length sequence
        packing → parquet training shards           (script stage)

Every stage already exists and is independently oracle/pytest-gated;
this tool wires them into one DAG over a synthetic crawl built from the
REAL documents corpus (10x-scaled when available, so line/doc duplicate
density is the measured corpus's own) and reports per-stage and
end-to-end throughput: docs/s in→out and shard MB/s. The synthesis
distributes pages into .warc.gz shards executor-side (mapPartitions →
encode_warc), one gzip member per record — the Common Crawl shape where
the object is the unit of parallelism.

Usage: python tools/capstone_crawl.py [n_shards] [workdir]
Env:   CAPSTONE_SRC (default /tmp/etly_sf1.0_scaled, falling back to
       /root/testdata/sf0.1) — where documents.parquet comes from.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.config import TransferConfig  # noqa: E402
from etly_spark.pipeline import DONE, TransferService  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402
from etly_spark.streaming.chain import _doc_id as _chain_doc_id  # noqa: E402

DECONTAM_NGRAM = 4
DECONTAM_FRAC = 0.5  # drop docs with > 50% eval 4-gram overlap
BPE_MERGES = 128
SEQ_LEN = 512


def _src_dir() -> str:
    cand = os.environ.get("CAPSTONE_SRC", "/tmp/etly_sf1.0_scaled")
    if os.path.exists(os.path.join(cand, "documents.parquet")):
        return cand
    return "/root/testdata/sf0.1"


def synth_crawl(spark, src: str, crawl_dir: str, n_shards: int) -> dict:
    """documents.text → html pages → n_shards .warc.gz, executor-side."""
    os.makedirs(crawl_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet")).select(
        "doc_id", "text"
    )

    def build(it):
        from pyspark import TaskContext

        from etly_spark.operators.htmltext import escape_html_text
        from etly_spark.operators.warc import encode_warc

        # name the shard by PARTITION id: repartition hash-routes the
        # mod expression, so several mod-groups can share a partition —
        # naming by the first row's mod value would collide filenames
        shard_id = TaskContext.get().partitionId()
        recs = []
        for row in it:
            page = (
                "<!DOCTYPE html><html><head><title>doc "
                f"{row.doc_id}</title></head><body><div><p>"
                f"{escape_html_text(row.text or '')}</p></div></body></html>"
            ).encode()
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
                b"Content-Length: " + str(len(page)).encode() + b"\r\n\r\n" + page
            )
            recs.append(
                (
                    {
                        "WARC-Type": "response",
                        "WARC-Target-URI": (
                            f"https://news-{int(row.doc_id) % 7}.example.com"
                            f"/articles/{int(row.doc_id)}"
                        ),
                        "WARC-Record-ID": f"<urn:uuid:cap-{int(row.doc_id)}>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "Content-Type": "application/http; msgtype=response",
                    },
                    http,
                )
            )
        if recs:
            data = encode_warc(recs, per_record_gzip=True)
            path = os.path.join(crawl_dir, f"shard-{shard_id:05d}.warc.gz")
            with open(path, "wb") as f:
                f.write(data)
            yield (shard_id, len(recs), len(data))

    # round-robin, NOT repartition(n, doc_id % n): hashing n distinct
    # mod values into n buckets leaves ~n/e partitions empty (observed:
    # 20 shards of a requested 32), skewing the per-shard parallelism
    # this synthesis exists to exercise
    stats = docs.repartition(n_shards).rdd.mapPartitions(build).collect()
    return {
        "docs": sum(s[1] for s in stats),
        "bytes": sum(s[2] for s in stats),
        "shards": len(stats),
    }


CONFIG = {
    "Transfers": [
        {
            "Name": "capstone-wet-extract",
            "Source": {
                "Name": "<pwd>/crawl",
                "Type": "url",
                "DataFormat": "wet",
                "FilterRegExp": ".+\\.warc\\.gz$",
            },
            "Target": {"Name": "<pwd>/docs/part", "DataFormat": "parquet"},
            "Meta": {"Name": "<pwd>/_meta/docs.json"},
        },
        {
            "Name": "capstone-curate",
            "Source": {
                "Name": "<pwd>/docs",
                "Type": "url",
                "DataFormat": "parquet",
                "FilterRegExp": ".+\\.parquet$",
            },
            "Target": {"Name": "<pwd>/curated/part", "DataFormat": "parquet"},
            "Meta": {"Name": "<pwd>/_meta/curated.json"},
            "ContentEnricher": "etly.DedupLines",
            "Filter": "etly.QualityGate",
            "Transformer": "etly.TextQualitySignals",
        },
        {
            "Name": "capstone-classify",
            "Source": {
                "Name": "<pwd>/curated",
                "Type": "url",
                "DataFormat": "parquet",
                "FilterRegExp": ".+\\.parquet$",
            },
            "Target": {"Name": "<pwd>/scored/part", "DataFormat": "parquet"},
            "Meta": {"Name": "<pwd>/_meta/scored.json"},
            "Transformer": "etly.QualityScore",
        },
    ]
}


def main() -> None:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/etly_capstone"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("capstone-crawl")
    src = _src_dir()
    t = {}

    t0 = time.time()
    synth = synth_crawl(spark, src, os.path.join(work, "crawl"), n_shards)
    t["synth"] = round(time.time() - t0, 2)

    cfg_path = os.path.join(work, "transfer.json")
    with open(cfg_path, "w") as f:
        json.dump(CONFIG, f)
    os.chdir(work)  # <pwd> template anchor
    cfg = TransferConfig.from_json(cfg_path)
    svc = TransferService(spark)

    t0 = time.time()
    r = svc.run(cfg.transfers[0])
    assert r.status == DONE, r.error
    t["wet_extract"] = round(time.time() - t0, 2)

    t0 = time.time()
    r = svc.run(cfg.transfers[1])
    assert r.status == DONE, r.error
    t["curate"] = round(time.time() - t0, 2)

    t0 = time.time()
    r = svc.run(cfg.transfers[2])
    assert r.status == DONE, r.error
    t["classify"] = round(time.time() - t0, 2)
    curated = spark.read.parquet(os.path.join(work, "scored", "part")).where(
        (F.col("text") != "") & (~F.col("clf_flag"))
    )
    n_curated = curated.count()

    # --- decontamination: drop docs whose 4-gram overlap with the
    # broadcast eval-set exceeds DECONTAM_FRAC (the catalog's decontam
    # rule; eval set = base-corpus docs with doc_id % 41 == 0)
    t0 = time.time()
    from etly_spark.functions import text as T

    def grams(toks):
        return F.when(
            F.size(toks) >= DECONTAM_NGRAM,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - DECONTAM_NGRAM + 1),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(toks, i, DECONTAM_NGRAM)).cast("binary")
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    eval_docs = (
        spark.read.parquet(os.path.join(src, "documents.parquet"))
        .where(F.col("doc_id") % 41 == 0)
        .select(F.explode(grams(T.tokens("text"))).alias("g"))
        .distinct()
    )
    eval_set = {r_.g for r_ in eval_docs.collect()}
    b_eval = spark.sparkContext.broadcast(eval_set)

    # Arrow-batched pandas UDF (a row-at-a-time udf here would be the
    # banned BatchEvalPython hot path)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def overlap(gs_col):  # noqa: ANN001
        ev = b_eval.value
        return gs_col.map(
            lambda gs: (sum(1 for g in gs if g in ev) / len(gs)) if len(gs) else 0.0
        )

    doc_keyed = curated.withColumn(
        "doc_id", _chain_doc_id(F.col("uri"))
    )
    clean = doc_keyed.withColumn("_ov", overlap(grams(T.tokens("text")))).where(
        F.col("_ov") <= DECONTAM_FRAC
    )
    clean = clean.persist()
    n_clean = clean.count()
    t["decontam"] = round(time.time() - t0, 2)

    # --- ANN retrieval (r13 — verdict item 7): the PRODUCTION index
    # path inside the flagship chain. Retrieval-for-training (hard
    # negatives / near-dup audit) runs against the staged IVFPQ index:
    # cell-partitioned codes table probed with a pushed IN filter and
    # scored via ADC lookup tables — the exact plan a 100 TB deployment
    # serves, not the full-reconstruction scan. The embeddings corpus
    # rides beside the documents one (falls back to the base testdata
    # when the scaled workdir has no embeddings table).
    t0 = time.time()
    from etly_spark.queries.similarity import (
        sim_ivfpq_adc,
        sim_ivfpq_probe,
        sim_ivfpq_rerank,
    )

    emb_src = (
        src
        if os.path.isfile(os.path.join(src, "embeddings.parquet"))
        or os.path.isdir(os.path.join(src, "embeddings.parquet"))
        else "/root/testdata/sf0.1"
    )
    probe_pairs = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in sim_ivfpq_probe(spark, emb_src).collect()
    }
    adc_pairs = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in sim_ivfpq_adc(spark, emb_src).collect()
    }
    # the full production form (r13): ADC candidates refined by exact
    # re-scoring against the raw vector store before the final top-k
    rerank_pairs = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in sim_ivfpq_rerank(spark, emb_src).collect()
    }
    t["ann_retrieval"] = round(time.time() - t0, 2)

    # --- BPE train + encode + pack into fixed-length training shards
    t0 = time.time()
    from etly_spark.operators.bpe import bpe_encode, train_bpe
    from etly_spark.operators.packer import pack_token_sequences

    merges = train_bpe(clean, n_merges=BPE_MERGES)
    enc = bpe_encode(clean.select("doc_id", "text"), merges)
    seqs = pack_token_sequences(enc, seq_len=SEQ_LEN, ids_col="tokens")
    shard_dir = os.path.join(work, "shards")
    seqs.write.mode("overwrite").parquet(shard_dir)
    t["pack"] = round(time.time() - t0, 2)
    out = spark.read.parquet(shard_dir)
    n_seqs = out.count()
    n_tokens = out.agg(F.sum("n_tokens")).collect()[0][0]
    shard_bytes = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(shard_dir)
        for fn in fns
    )

    # --- datasheet: the release documentation ships WITH the shards
    # (r12 — operators/datasheet over the exact docs that were packed)
    t0 = time.time()
    from etly_spark.operators.datasheet import build_datasheet, write_datasheet

    sheet = build_datasheet(clean)
    write_datasheet(sheet, os.path.join(shard_dir, "_datasheet.json"))
    t["datasheet"] = round(time.time() - t0, 2)

    wall = sum(t.values())
    print(
        json.dumps(
            {
                "src": src,
                "docs_in": synth["docs"],
                "datasheet_sources": sheet["corpus"]["n_sources"],
                "crawl_mb": round(synth["bytes"] / 1e6, 1),
                "docs_curated": n_curated,
                "docs_clean": n_clean,
                "sequences": n_seqs,
                "tokens_packed": int(n_tokens),
                "ann_neighbors": len(probe_pairs),
                "ann_emb_src": emb_src,
                "ann_adc_identical": adc_pairs == probe_pairs,
                "ann_rerank_neighbors": len(rerank_pairs),
                "shard_mb": round(shard_bytes / 1e6, 1),
                "stage_s": t,
                "end_to_end_s": round(wall, 1),
                "docs_per_s": round(synth["docs"] / wall, 1),
                "shard_mb_per_s": round(shard_bytes / 1e6 / wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
