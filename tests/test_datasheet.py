"""tools/datasheet.py — the corpus documentation artifact: per-source
composition/quality/duplication/PII rollups, built from the engine's
oracle-gated primitives in two corpus scans."""

import importlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_datasheet_structure_and_pins(spark):
    ds = importlib.import_module("datasheet")
    sheet = ds.build_datasheet(spark, "/root/testdata/sf0.001")
    assert sheet["corpus"]["docs"] == 500
    assert sheet["corpus"]["n_sources"] == 20
    assert sheet["corpus"]["tokens"] == 27939  # tokenizer-determined
    s0 = next(s for s in sheet["sources"] if s["source"] == "src0")
    assert s0["docs"] == 25 and s0["toks_p50"] > 0
    assert set(s0["pii"]) == {"n_ssn", "n_email", "n_card", "n_ip", "n_phone"}
    assert sum(s0["lang_mix"].values()) == 25
    assert 0 <= s0["exact_dup_rate"] <= s0["fingerprint_cluster_rate"] <= 1


def test_datasheet_counts_planted_pii_and_dups(spark, tmp_path):
    ds = importlib.import_module("datasheet")
    rows = [
        (1, "contact me at alice@example.com or 192.168.0.1 soon", "en", "a", 0),
        (2, "totally unique text about spark and parquet files", "en", "a", 0),
        (3, "totally unique text about spark and parquet files", "en", "a", 0),
        (4, "ssn 123-45-6789 appears here", "en", "b", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sheet = ds.build_datasheet(spark, str(tmp_path))
    a = next(s for s in sheet["sources"] if s["source"] == "a")
    b = next(s for s in sheet["sources"] if s["source"] == "b")
    assert a["pii"]["n_email"] == 1 and a["pii"]["n_ip"] == 1
    assert b["pii"]["n_ssn"] == 1
    # docs 2 and 3 are exact duplicates: 3 docs, 2 distinct norms
    assert a["exact_dup_rate"] == round(1 - 2 / 3, 6)
