"""WARC ingestion scale stress: the Common-Crawl-shaped path at volume.

Measurements:
1. Shard synthesis + END-TO-END pipeline ingest — N .warc.gz shards
   (per-record gzip members, html response records with realistic
   markup: nested blocks, entities, script/style noise) run through a
   full Transfer (list → read → html extraction → routed ndjson sink →
   meta ledger). Reported as records/s and MB/s of compressed input.
   The read is one executor task per shard (binaryFile route) — at
   1000 executors the same plan is 1000 concurrent shard parses.
2. html_to_text throughput — the extractor alone over the synthesized
   page bodies, chars/s (it is the per-record hot loop).
3. warc→warc re-shard — the WET sink path over the same corpus,
   records/s (read + re-frame + per-record gzip members).

Usage: python tools/stress_warc.py [n_shards] [records_per_shard]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etly_spark.operators.htmltext import escape_html_text, html_to_text  # noqa: E402
from etly_spark.operators.warc import encode_warc  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def _page(i: int) -> bytes:
    body = " ".join(f"token{(i * 31 + k) % 997}" for k in range(120))
    return (
        "<!DOCTYPE html><html><head><title>Page "
        f"{i}</title><style>p{{margin:0}}</style>"
        "<script>var x = 1 < 2;</script></head><body>"
        f"<h1>Shard page {i}</h1>"
        f"<div><p>{escape_html_text(body)}</p>"
        f"<ul><li>alpha &amp; beta</li><li>entry {i}</li></ul></div>"
        "</body></html>"
    ).encode()


def _shard(shard: int, n_recs: int) -> bytes:
    recs = []
    for r in range(n_recs):
        i = shard * n_recs + r
        page = _page(i)
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(page)).encode() + b"\r\n\r\n" + page
        )
        recs.append(
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{i:032x}>",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "WARC-Target-URI": f"https://example.com/{shard}/{r}",
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
    return encode_warc(recs, per_record_gzip=True)


def main() -> None:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_recs = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark()
    work = tempfile.mkdtemp(prefix="etly_warc_stress_")
    out: dict[str, object] = {"n_shards": n_shards, "records": n_shards * n_recs}
    try:
        src = os.path.join(work, "in")
        os.makedirs(src)
        os.makedirs(os.path.join(work, "out"))
        t0 = time.time()
        total_bytes = 0
        for s in range(n_shards):
            data = _shard(s, n_recs)
            total_bytes += len(data)
            with open(os.path.join(src, f"crawl-{s:05d}.warc.gz"), "wb") as f:
                f.write(data)
        out["synth_s"] = round(time.time() - t0, 2)
        out["compressed_mb"] = round(total_bytes / 1e6, 1)

        from etly_spark.config import Resource, Source, Target, Transfer
        from etly_spark.pipeline import DONE, TransferService

        t = Transfer(
            name="warc-stress",
            source=Source(name=src, data_format="warc"),
            target=Target(name=os.path.join(work, "out", "<file>.jsonl")),
            meta=Resource(name=os.path.join(work, "out", "meta.json")),
            base_dir=work,
        )
        t1 = time.time()
        res = TransferService(spark).run(t)
        ingest_s = time.time() - t1
        assert res.status == DONE, res.error
        n = res.progress.record_processed
        out["ingest_s"] = round(ingest_s, 2)
        out["ingest_rec_s"] = int(n / ingest_s)
        out["ingest_mb_s"] = round(total_bytes / 1e6 / ingest_s, 1)
        out["records_ok"] = n == n_shards * n_recs

        # extractor hot loops alone (full-fidelity and main-text)
        from etly_spark.operators.htmltext import extract_main_text

        pages = [_page(i).decode() for i in range(2000)]
        total_chars = sum(len(p) for p in pages)
        t2 = time.time()
        chars = sum(len(html_to_text(p)) for p in pages)
        ex_s = time.time() - t2
        out["extract_mchars_s"] = round(total_chars / 1e6 / ex_s, 1)
        assert chars > 0
        t2b = time.time()
        chars_main = sum(len(extract_main_text(p)) for p in pages)
        out["extract_main_mchars_s"] = round(
            total_chars / 1e6 / (time.time() - t2b), 1
        )
        assert chars_main > 0

        # 'wet' format end-to-end (main-text extraction in the kernel)
        t2c = time.time()
        wet_cfg = Transfer(
            name="wet-stress",
            source=Source(name=src, data_format="wet"),
            target=Target(name=os.path.join(work, "out", "<file>.wet.jsonl")),
            meta=Resource(name=os.path.join(work, "out", "meta3.json")),
            base_dir=work,
        )
        res_wet = TransferService(spark).run(wet_cfg)
        wet_s = time.time() - t2c
        assert res_wet.status == DONE, res_wet.error
        out["wet_ingest_rec_s"] = int(res_wet.progress.record_processed / wet_s)

        # cdx random-access index over all shards
        t3b = time.time()
        cdx_cfg = Transfer(
            name="cdx-stress",
            source=Source(name=src, data_format="cdx"),
            target=Target(name=os.path.join(work, "out", "<file>.cdx.jsonl")),
            meta=Resource(name=os.path.join(work, "out", "meta4.json")),
            base_dir=work,
        )
        res_cdx = TransferService(spark).run(cdx_cfg)
        cdx_s = time.time() - t3b
        assert res_cdx.status == DONE, res_cdx.error
        out["cdx_index_rec_s"] = int(res_cdx.progress.record_processed / cdx_s)

        # warc -> warc re-shard (WET sink)
        t3 = time.time()
        t2cfg = Transfer(
            name="warc-reshard-stress",
            source=Source(name=src, data_format="warc"),
            target=Target(
                name=os.path.join(work, "out", "<file>.wet.warc.gz"),
                data_format="warc",
                compression="gzip",
            ),
            meta=Resource(name=os.path.join(work, "out", "meta2.json")),
            base_dir=work,
        )
        res2 = TransferService(spark).run(t2cfg)
        reshard_s = time.time() - t3
        assert res2.status == DONE, res2.error
        out["reshard_s"] = round(reshard_s, 2)
        out["reshard_rec_s"] = int(res2.progress.record_processed / reshard_s)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
