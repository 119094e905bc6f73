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


def test_datasheet_media_stats_with_planted_payloads(spark):
    """r12 (verdict item 7): per-source MEDIA stats from an opaque
    binary payload column — decodable fraction counts payloads a real
    decoder claims (magic-byte sniff over the engine's codec surface),
    codec mix tags them, absent/garbage payloads count correctly."""
    from etly_spark.operators.datasheet import build_datasheet, sniff_media_format

    ppm = b"P6\n2 2\n255\n" + bytes(12)
    gif = b"GIF89a" + (4).to_bytes(2, "little") + (3).to_bytes(2, "little") + bytes(10)
    wav = b"RIFF" + bytes(4) + b"WAVE" + bytes(8)
    flac = b"fLaC" + bytes(8)
    junk = b"\x00\x01 not a media file at all"
    assert sniff_media_format(ppm) == "ppm"
    assert sniff_media_format(gif) == "gif"
    assert sniff_media_format(wav) == "wav"
    assert sniff_media_format(flac) == "flac"
    assert sniff_media_format(junk) == "unknown"
    assert sniff_media_format(None) == "none"

    rows = [
        (1, "an image doc", "en", "imgs", 0, ppm),
        (2, "another image doc", "en", "imgs", 0, gif),
        (3, "a broken blob", "en", "imgs", 0, junk),
        (4, "text only", "en", "imgs", 0, None),
        (5, "a song", "en", "audio", 0, wav),
        (6, "a lossless song", "en", "audio", 0, flac),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long, payload binary",
    )
    sheet = build_datasheet(df)  # auto-detects the payload column
    imgs = next(s for s in sheet["sources"] if s["source"] == "imgs")
    audio = next(s for s in sheet["sources"] if s["source"] == "audio")
    assert imgs["n_media"] == 3  # null payload is not media
    assert imgs["media_decodable_frac"] == round(2 / 3, 6)
    assert imgs["codec_mix"] == {"gif": 1, "ppm": 1, "unknown": 1}
    assert audio["n_media"] == 2 and audio["media_decodable_frac"] == 1.0
    assert audio["codec_mix"] == {"flac": 1, "wav": 1}
    assert sheet["corpus"]["media_docs"] == 5


def test_transfer_ships_datasheet(spark, tmp_path):
    """r12 (verdict item 7): a Transfer carrying 'Datasheet': {'Name':
    ...} writes the JSON report beside its output, computed over the
    window's transferred (kept, post-transform) rows."""
    import json as _json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from etly_spark import registry
    from etly_spark.config import TransferConfig
    from etly_spark.pipeline import DONE, TransferService

    if "example.DocSrc" not in registry.schemas:
        registry.schemas.register(
            "example.DocSrc",
            StructType(
                [
                    StructField("doc_id", LongType()),
                    StructField("text", StringType()),
                    StructField("lang", StringType()),
                    StructField("source", StringType()),
                    StructField("n_chars", LongType()),
                ]
            ),
        )

    src = tmp_path / "in"
    src.mkdir()
    (src / "docs.log").write_text(
        "\n".join(
            _json.dumps(
                {
                    "doc_id": i,
                    "text": f"mail me at user{i}@example.com please" if i < 2
                    else f"plain document number {i}",
                    "lang": "en",
                    "source": "crawl" if i % 2 == 0 else "books",
                    "n_chars": 30,
                }
            )
            for i in range(6)
        )
        + "\n"
    )
    (tmp_path / "out").mkdir()
    cfg = {
        "Transfers": [
            {
                "Name": "ship-datasheet",
                "Source": {
                    "Name": "file://<pwd>/in",
                    "Type": "url",
                    "DataFormat": "ndjson",
                    "DataType": "example.DocSrc",
                },
                "Target": {
                    "Name": "file://<pwd>/out/part",
                    "DataFormat": "ndjson",
                },
                "Meta": {"Name": "file://<pwd>/out/meta.json"},
                "Datasheet": {"Name": "<pwd>/out/datasheet.json"},
            }
        ]
    }
    cfg_path = tmp_path / "transfer.json"
    cfg_path.write_text(_json.dumps(cfg))
    t = TransferConfig.from_json(str(cfg_path)).transfers[0]
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    report = _json.loads((tmp_path / "out" / "datasheet.json").read_text())
    assert report["transfer"] == "ship-datasheet"
    assert report["corpus"]["docs"] == 6
    assert {s["source"] for s in report["sources"]} == {"books", "crawl"}
    total_email = sum(s["pii"]["n_email"] for s in report["sources"])
    assert total_email == 2
