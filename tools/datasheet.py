"""Corpus datasheet: the per-source documentation artifact a dataset
release ships (Gebru et al., "Datasheets for Datasets") — composition,
language mix, quality, duplication and PII exposure, each computed by
the engine's existing oracle-gated primitives and rolled up per source
in TWO corpus scans (one token-level, one doc-level; every rollup is a
map-side-combinable aggregate keyed by the low-cardinality source
column, so the plan is scan + tiny shuffle at any corpus size).

Reported per source (plus a corpus-level roll-up):
- composition: docs, tokens, chars, token-length p50/p90
  (percentile_approx — the sketch, never a sort);
- language mix: predicted-language doc counts (functions/text.langid,
  the same classifier text_langid gates);
- quality: mean lexical diversity, mean non-stopword density,
  repetitive-doc fraction (the Gopher modal-token label from
  operators/quality.lr_features — text_quality's checked signals);
- duplication: exact-dup rate (1 - distinct(md5(normalized))/docs,
  dedup_exact's doc_norm rule) and prefix-fingerprint cluster rate
  (text_fingerprint's rule — the cheap near-dup screen);
- PII exposure: per-class match counts (functions/text.redact_pii —
  the etly.RedactPII stage's patterns) WITHOUT materializing redacted
  text.

Usage: python tools/datasheet.py [sf_dir] [out.json]
Writes the JSON document to out.json (default: stdout line only).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.functions import text as T  # noqa: E402
from etly_spark.io.tables import load_table  # noqa: E402
from etly_spark.operators.quality import lr_features  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def build_datasheet(spark, sf_dir: str) -> dict:
    d = load_table(spark, sf_dir, "documents")

    feats = lr_features(F.col("_t"))
    pii = T.redact_pii("text")
    pii_counts = {k: v for k, v in pii.items() if k != "text"}
    doc = d.select(
        "source",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        T.tokens("text").alias("_t"),
    ).select(
        "source",
        F.size("_t").alias("n_toks"),
        F.length("text").alias("n_chars"),
        T.langid(F.col("_t")).alias("pred_lang"),
        feats["r1"].alias("diversity"),
        feats["r2"].alias("non_stop"),
        feats["y"].alias("repetitive"),
        F.md5(T.normalize_text("text").cast("binary")).alias("norm_h"),
        F.md5(F.substring(T.normalize_text("text"), 1, 40).cast("binary")).alias("fp"),
        *[v.alias(f"pii_{k}") for k, v in pii_counts.items()],
    )

    pii_cols = [c for c in doc.columns if c.startswith("pii_")]
    per_source = (
        doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_toks").alias("tokens"),
            F.sum("n_chars").alias("chars"),
            F.percentile_approx("n_toks", 0.5).alias("toks_p50"),
            F.percentile_approx("n_toks", 0.9).alias("toks_p90"),
            F.round(F.avg("diversity"), 6).alias("mean_diversity"),
            F.round(F.avg("non_stop"), 6).alias("mean_non_stopword"),
            F.round(F.avg(F.col("repetitive").cast("double")), 6).alias(
                "repetitive_frac"
            ),
            F.countDistinct("norm_h").alias("_dn"),
            F.countDistinct("fp").alias("_dfp"),
            *[F.sum(c).alias(c) for c in pii_cols],
        )
        .withColumn(
            "exact_dup_rate",
            F.round(1 - F.col("_dn") / F.col("docs").cast("double"), 6),
        )
        .withColumn(
            "fingerprint_cluster_rate",
            F.round(1 - F.col("_dfp") / F.col("docs").cast("double"), 6),
        )
        .drop("_dn", "_dfp")
        .orderBy("source")
    )

    langs = (
        doc.groupBy("source", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source", "pred_lang")
        .collect()
    )
    lang_mix: dict[str, dict[str, int]] = {}
    for r in langs:
        lang_mix.setdefault(r["source"], {})[r["pred_lang"]] = r["n"]

    sources = []
    for r in per_source.collect():
        row = r.asDict()
        row["lang_mix"] = lang_mix.get(row["source"], {})
        row["pii"] = {c[4:]: row.pop(c) for c in pii_cols}
        sources.append(row)

    return {
        "sf_dir": os.path.abspath(sf_dir),
        "corpus": {
            "docs": sum(s["docs"] for s in sources),
            "tokens": sum(s["tokens"] for s in sources),
            "chars": sum(s["chars"] for s in sources),
            "n_sources": len(sources),
        },
        "sources": sources,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("datasheet")
    t0 = time.monotonic()
    sheet = build_datasheet(spark, sf_dir)
    sheet["build_s"] = round(time.monotonic() - t0, 2)
    if out:
        with open(out, "w") as fh:
            json.dump(sheet, fh, indent=1, default=str)
    print(
        json.dumps(
            {
                "corpus": sheet["corpus"],
                "build_s": sheet["build_s"],
                "sources": {
                    s["source"]: {
                        "docs": s["docs"],
                        "exact_dup_rate": s["exact_dup_rate"],
                        "repetitive_frac": s["repetitive_frac"],
                        "pii_total": sum(s["pii"].values()),
                    }
                    for s in sheet["sources"]
                },
            },
            default=str,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
