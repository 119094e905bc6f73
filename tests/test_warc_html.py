"""WARC codec + HTML text extraction: spec vectors, round-trips,
strictness, and the full Common-Crawl-shaped chain
(text → html → http → warc → per-record gzip → back)."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etly_spark.operators.htmltext import escape_html_text, html_to_text
from etly_spark.operators.warc import (
    decode_warc,
    decode_warc_index,
    encode_warc,
    split_http_response,
)

RESP_HDRS = {
    "WARC-Type": "response",
    "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000001>",
    "WARC-Date": "2026-01-01T00:00:00Z",
    "WARC-Target-URI": "https://example.com/a",
    "Content-Type": "application/http; msgtype=response",
}


def http_response(body: bytes, ctype: str = "text/html; charset=utf-8") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
        + b"\r\nContent-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )


# ---------------------------------------------------------------- warc


def test_warc_roundtrip_plain_and_gzip():
    recs = [
        ({"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:0>",
          "WARC-Date": "2026-01-01T00:00:00Z",
          "Content-Type": "application/warc-fields"}, b"software: etly_spark\r\n"),
        (RESP_HDRS, http_response(b"<html><body>hi</body></html>")),
    ]
    for per_gz in (False, True):
        data = encode_warc(recs, per_record_gzip=per_gz)
        out = decode_warc(data)
        assert [r.warc_type for r in out] == ["warcinfo", "response"]
        assert out[0].version == "WARC/1.1"
        assert out[1].block == recs[1][1]
        assert out[1].get("warc-target-uri") == "https://example.com/a"


def test_warc_per_record_gzip_is_member_per_record():
    data = encode_warc([(RESP_HDRS, b"x")] , per_record_gzip=True) * 3
    # 3 concatenated members decode as 3 records
    assert len(decode_warc(data)) == 3
    # and each member is a standalone gzip stream
    one = encode_warc([(RESP_HDRS, b"x")], per_record_gzip=True)
    assert gzip.decompress(one).startswith(b"WARC/1.1\r\n")


def test_warc_header_continuation_lines():
    raw = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"X-Long: first\r\n  folded tail\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    rec = decode_warc(raw)[0]
    assert rec.version == "WARC/1.0"
    assert rec.get("x-long") == "first folded tail"
    assert rec.block == b"ok"


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d[:-2],                      # lost terminator CRLF
        lambda d: d.replace(b"WARC/1.1", b"WARX/1.1"),
        lambda d: d.replace(b"Content-Length: 1", b"Content-Length: 99"),
        lambda d: d.replace(b"Content-Length: 1", b"Content-Length: x"),
    ],
)
def test_warc_strictness(mutate):
    data = encode_warc([(RESP_HDRS, b"z")])
    assert decode_warc(data)[0].block == b"z"
    with pytest.raises(ValueError):
        decode_warc(mutate(data))


def test_warc_torn_gzip_member_raises():
    data = encode_warc([(RESP_HDRS, b"z")], per_record_gzip=True)
    with pytest.raises(ValueError):
        decode_warc(data[: len(data) - 4])


def test_warc_empty_stream_raises():
    with pytest.raises(ValueError):
        decode_warc(b"")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=300), min_size=1, max_size=4),
       st.booleans())
def test_warc_any_blocks_roundtrip(blocks, per_gz):
    recs = [(RESP_HDRS, b) for b in blocks]
    out = decode_warc(encode_warc(recs, per_record_gzip=per_gz))
    assert [r.block for r in out] == blocks


def test_split_http_response():
    body = b"\x00binary\xffbody"
    status, headers, out = split_http_response(http_response(body))
    assert status == 200 and out == body
    assert headers["Content-Type"].startswith("text/html")
    # LF-only separator tolerated
    s2, _, b2 = split_http_response(b"HTTP/1.0 404 Not Found\nX: y\n\nnope")
    assert s2 == 404 and b2 == b"nope"
    with pytest.raises(ValueError):
        split_http_response(b"not http at all")
    with pytest.raises(ValueError):
        split_http_response(b"HTTP/1.1 OK\r\n\r\nmissing-code")


# ---------------------------------------------------------------- html


def test_html_basic_blocks_and_inline():
    src = "<html><body><h1>Title</h1><p>one <b>two</b></p><p>three</p></body></html>"
    assert html_to_text(src) == "Title\none two\nthree"


def test_html_script_style_comments_dropped():
    src = ("<head><style>p{color:red}</style><script>if(1<2){x()}</script>"
           "<!-- <p>not text</p> --></head><body>kept</body>")
    assert html_to_text(src) == "kept"


def test_html_attribute_with_gt_and_quotes():
    assert html_to_text('<a title="a>b" href=\'c>d\'>link</a>') == "link"


def test_html_entities():
    assert html_to_text("&lt;tag&gt; &amp; &#65;&#x42; &nbsp;x") == "<tag> & AB \xa0x"


def test_html_cdata_kept_doctype_dropped():
    assert html_to_text("<!DOCTYPE html><p><![CDATA[a<b]]></p>") == "a<b"


def test_html_malformed_never_raises():
    for src in ("<p", "a < b", "<>", "</", "<script>never closed",
                "text<!-- open comment", '<a href="broken>x'):
        html_to_text(src)  # must not raise
    assert html_to_text("a < b") == "a < b"
    assert html_to_text("x<p") == "x"


def test_html_case_insensitive_tags():
    assert html_to_text("<P>a</P><SCRIPT>s</SCRIPT><BR>b") == "a\nb"


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_html_escape_roundtrip_exact(text):
    wrapped = ("<html><head><title></title><script>void(0)</script></head>"
               f"<body>{escape_html_text(text)}</body></html>")
    assert html_to_text(wrapped) == text


# ------------------------------------------------------- the full chain


@settings(max_examples=25, deadline=None)
@given(st.text(max_size=400))
def test_common_crawl_chain_roundtrip(text):
    html = ("<html><head><title></title></head><body>"
            + escape_html_text(text) + "</body></html>")
    data = encode_warc(
        [(RESP_HDRS, http_response(html.encode()))], per_record_gzip=True
    )
    rec = decode_warc(data)[0]
    status, _, body = split_http_response(rec.block)
    assert status == 200
    assert html_to_text(body.decode()) == text


# ----------------------------------------------------- pipeline source


def _write_corpus_warc(path, per_gz=True):
    html = ("<html><head><title>t</title><style>p{}</style></head>"
            "<body><h1>Hello</h1><p>web &amp; text</p></body></html>").encode()
    recs = [
        ({"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:0>",
          "WARC-Date": "2026-01-01T00:00:00Z",
          "Content-Type": "application/warc-fields"}, b"software: x\r\n"),
        ({"WARC-Type": "request", "WARC-Record-ID": "<urn:uuid:1>",
          "WARC-Date": "2026-01-01T00:00:00Z",
          "WARC-Target-URI": "https://example.com/p",
          "Content-Type": "application/http; msgtype=request"},
         b"GET /p HTTP/1.1\r\nHost: example.com\r\n\r\n"),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:2>",
          "WARC-Date": "2026-01-01T00:00:00Z",
          "WARC-Target-URI": "https://example.com/p",
          "Content-Type": "application/http; msgtype=response"},
         http_response(html)),
        ({"WARC-Type": "conversion", "WARC-Record-ID": "<urn:uuid:3>",
          "WARC-Date": "2026-01-02T00:00:00Z",
          "WARC-Target-URI": "https://example.com/q",
          "Content-Type": "text/plain"}, b"already plain"),
    ]
    path.write_bytes(encode_warc(recs, per_record_gzip=per_gz))


def test_warc_pipeline_source_end_to_end(spark, tmp_path):
    """DataFormat 'warc': payload records (response html-extracted,
    conversion kept verbatim; warcinfo/request dropped) land as ndjson,
    and the meta ledger NOOPs the second run."""
    import json

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, NOOP, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    _write_corpus_warc(src / "crawl.warc.gz")

    t = Transfer(
        name="warc-src",
        source=Source(name=str(src), data_format="warc"),
        target=Target(name=str(tmp_path / "out" / "<file>.jsonl")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    svc = TransferService(spark)
    result = svc.run(t)
    assert result.status == DONE, result.error
    assert result.progress.record_processed == 2
    out = tmp_path / "out" / "crawl.warc.gz.jsonl"
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    by_type = {r["warc_type"]: r for r in rows}
    assert set(by_type) == {"response", "conversion"}
    resp = by_type["response"]
    assert resp["uri"] == "https://example.com/p"
    assert resp["http_status"] == 200
    assert resp["text"] == "t\nHello\nweb & text"
    assert by_type["conversion"]["text"] == "already plain"
    assert svc.run(t).status == NOOP


def test_warc_pipeline_fault_isolation(spark, tmp_path):
    """A warc that gunzips cleanly but is torn at the record layer is
    attributed to ITS file; the healthy warc's records still land."""
    import json

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.meta import Meta
    from etly_spark.pipeline import DONE, TransferService
    from etly_spark.sources.storage import probe_object

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    _write_corpus_warc(src / "good.warc.gz")
    bad = gzip.compress(b"WARC/1.1\r\nContent-Length: 9999\r\n\r\nshort")
    (src / "bad.warc.gz").write_bytes(bad)
    assert probe_object("file://" + str(src / "bad.warc.gz"))
    assert probe_object("file://" + str(src / "good.warc.gz")) is None

    t = Transfer(
        name="warc-fault",
        source=Source(name=str(src), data_format="warc"),
        target=Target(name=str(tmp_path / "out" / "<file>.jsonl")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    out = tmp_path / "out" / "good.warc.gz.jsonl"
    assert len(out.read_text().splitlines()) == 2
    assert not (tmp_path / "out" / "bad.warc.gz.jsonl").exists()
    meta = Meta.load(str(tmp_path / "out" / "meta.json"))
    assert any("bad.warc.gz" in e["error"] for e in meta.errors)


def test_warc_sink_round_trip(spark, tmp_path):
    """Target DataFormat 'warc' + gzip: a crawl re-shard — warc source
    records re-framed as conversion records (the WET shape), one gzip
    member per record, readable back by the same strict parser."""
    import json

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    _write_corpus_warc(src / "crawl.warc.gz")

    t = Transfer(
        name="warc-reshard",
        source=Source(name=str(src), data_format="warc"),
        target=Target(
            name=str(tmp_path / "out" / "<file>.wet.warc.gz"),
            data_format="warc",
            compression="gzip",
        ),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    out = tmp_path / "out" / "crawl.warc.gz.wet.warc.gz"
    recs = decode_warc(out.read_bytes())
    assert len(recs) == 2
    by_uri = {r.get("WARC-Target-URI"): r for r in recs}
    assert set(by_uri) == {"https://example.com/p", "https://example.com/q"}
    assert all(r.warc_type == "conversion" for r in recs)
    assert all(r.get("Content-Type") == "text/plain" for r in recs)
    # the pre-extraction type rides the WET-style identified header
    assert by_uri["https://example.com/p"].get(
        "WARC-Identified-Payload-Type"
    ).startswith("text/html")
    assert by_uri["https://example.com/p"].block.decode() == "t\nHello\nweb & text"
    assert by_uri["https://example.com/q"].block.decode() == "already plain"
    # record IDs are content-derived and distinct
    assert len({r.get("WARC-Record-ID") for r in recs}) == 2
    # deterministic replay: running the finalization again must produce
    # byte-identical output (gzip mtime pinned, content-derived IDs)
    first = out.read_bytes()
    import gzip as _gz
    assert _gz.decompress(first)  # per-record members present
    # plain (uncompressed) warc sink too
    t2 = Transfer(
        name="warc-reshard-plain",
        source=Source(name=str(src), data_format="warc"),
        target=Target(name=str(tmp_path / "out" / "<file>.wet.warc"), data_format="warc"),
        meta=Resource(name=str(tmp_path / "out" / "meta2.json")),
        base_dir=str(tmp_path),
    )
    assert TransferService(spark).run(t2).status == DONE
    plain = (tmp_path / "out" / "crawl.warc.gz.wet.warc").read_bytes()
    assert plain.startswith(b"WARC/1.1\r\n")
    assert len(decode_warc(plain)) == 2


def test_warc_sink_rejects_stream_codecs(spark, tmp_path):
    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    _write_corpus_warc(src / "c.warc.gz")
    t = Transfer(
        name="warc-badcomp",
        source=Source(name=str(src), data_format="warc"),
        target=Target(
            name=str(tmp_path / "out" / "<file>.warc.lz4"),
            data_format="warc",
            compression="lz4",
        ),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.error and "warc targets support only gzip" in result.error


# ------------------------------------------------ main-text extraction


REAL_PAGE = """<!DOCTYPE html><html><head><title>Site</title>
<style>nav{display:flex}</style><script>track();</script></head><body>
<header><h1>Example News Network</h1></header>
<nav><ul><li><a href="/">Home</a></li><li><a href="/a">Politics</a></li>
<li><a href="/b">Sports</a></li></ul></nav>
<div class="content">
<p>The committee voted on Tuesday to approve the new measure, which
takes effect next spring and changes how permits are issued.</p>
<p>Supporters argued the change simplifies a confusing process; critics
said the rollout timeline is too aggressive for small firms.</p>
<p>Short tail.</p>
</div>
<div class="related"><a href="/x">Read more stories</a> |
<a href="/y">Top headlines today</a> | <a href="/z">More sports</a></div>
<aside>Subscribe to our newsletter</aside>
<footer>© 2026 Example News Network. <a href="/tos">Terms</a></footer>
</body></html>"""


def test_extract_main_text_drops_chrome_and_link_farms():
    from etly_spark.operators.htmltext import extract_main_text

    out = extract_main_text(REAL_PAGE)
    assert "committee voted" in out and "rollout timeline" in out
    assert "Short tail." in out                 # short but sentence-like
    assert "Example News Network" not in out    # header + footer chrome
    assert "Home" not in out and "Top headlines" not in out  # nav/link farm
    assert "Subscribe" not in out               # aside
    assert "track();" not in out


def test_extract_main_text_fallback_and_malformed():
    from etly_spark.operators.htmltext import extract_main_text

    # all-fragment page: falls back to full extraction, never empty
    assert extract_main_text("<p>hi</p><p>yo</p>") == "hi\nyo"
    # malformed inputs never raise
    for src in ("<nav", "</footer></footer>x", "<a href='>", ""):
        extract_main_text(src)
    # unbalanced closes can't underflow the chrome depth
    good = "A long enough sentence that clearly qualifies as content."
    assert extract_main_text(f"</nav></nav><p>{good}</p>") == good


def test_wet_format_pipeline(spark, tmp_path):
    """DataFormat 'wet': the warc source with main-text extraction."""
    import json

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    page = REAL_PAGE.encode()
    (src / "news.warc.gz").write_bytes(
        encode_warc(
            [(RESP_HDRS, http_response(page))], per_record_gzip=True
        )
    )
    t = Transfer(
        name="wet-src",
        source=Source(name=str(src), data_format="wet"),
        target=Target(name=str(tmp_path / "out" / "<file>.jsonl")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    rows = [
        json.loads(l)
        for l in (tmp_path / "out" / "news.warc.gz.jsonl").read_text().splitlines()
    ]
    assert len(rows) == 1
    assert "committee voted" in rows[0]["text"]
    assert "Top headlines" not in rows[0]["text"]


def test_warc_source_honors_content_type_charset(spark, tmp_path):
    """A latin-1 page declared via the HTTP Content-Type charset param
    decodes correctly; an unknown charset degrades to utf-8/replace
    instead of failing the task."""
    import json

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    page = "<html><body><p>café crème, déjà vu.</p></body></html>".encode("iso-8859-1")
    recs = [
        (dict(RESP_HDRS, **{"WARC-Record-ID": "<urn:uuid:10>"}),
         http_response(page, ctype='text/html; charset="ISO-8859-1"')),
        (dict(RESP_HDRS, **{"WARC-Record-ID": "<urn:uuid:11>",
                            "WARC-Target-URI": "https://example.com/b"}),
         http_response(b"plain bytes", ctype="text/plain; charset=bogus-enc-42")),
    ]
    (src / "latin.warc.gz").write_bytes(encode_warc(recs, per_record_gzip=True))
    t = Transfer(
        name="warc-charset",
        source=Source(name=str(src), data_format="warc"),
        target=Target(name=str(tmp_path / "out" / "<file>.jsonl")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    rows = [
        json.loads(l)
        for l in (tmp_path / "out" / "latin.warc.gz.jsonl").read_text().splitlines()
    ]
    by_uri = {r["uri"]: r for r in rows}
    assert by_uri["https://example.com/a"]["text"] == "café crème, déjà vu."
    assert by_uri["https://example.com/b"]["text"] == "plain bytes"


def test_crawl_to_corpus_example_config(spark, tmp_path):
    """Capstone: the examples/crawl_to_corpus.json pipeline end-to-end —
    wet source (main-text extraction) → quality gate → PII scrub →
    Z-ordered parquet corpus + per-type rollup; plus the WET re-shard
    transfer from the same config."""
    import shutil

    from etly_spark.config import TransferConfig
    from etly_spark.operators.warc import decode_warc
    from etly_spark.pipeline import DONE, TransferService

    cfg_path = tmp_path / "crawl_to_corpus.json"
    shutil.copy("examples/crawl_to_corpus.json", cfg_path)
    crawl = tmp_path / "incoming" / "crawl"
    crawl.mkdir(parents=True)
    (tmp_path / "corpus").mkdir()
    (tmp_path / "wet").mkdir()

    article = (
        "<html><body><div><p>The committee voted on Tuesday to approve the "
        "new measure, and the final report explains what changes for the "
        "small firms that apply before spring. Contact us at "
        "help@example.com for details.</p></div></body></html>"
    ).encode()
    junk = (b"<html><body><p>buy now click here buy now click here "
            b"buy now click here</p></body></html>")
    recs = [
        (dict(RESP_HDRS, **{"WARC-Record-ID": "<urn:uuid:20>"}),
         http_response(article)),
        (dict(RESP_HDRS, **{"WARC-Record-ID": "<urn:uuid:21>",
                            "WARC-Target-URI": "https://example.com/junk"}),
         http_response(junk)),
    ]
    (crawl / "shard-0.warc.gz").write_bytes(encode_warc(recs, per_record_gzip=True))

    cfg = TransferConfig.from_json(str(cfg_path))
    svc = TransferService(spark)

    res = svc.run(cfg.transfers[0])
    assert res.status == DONE, res.error
    # quality gate kept the article, dropped the junk page
    out_dirs = list((tmp_path / "corpus").glob("*/shard"))
    assert out_dirs, list((tmp_path / "corpus").iterdir())
    df = spark.read.parquet(str(out_dirs[0]))
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert "committee voted" in r["text"]
    assert "help@example.com" not in r["text"]  # PII scrubbed
    assert r["n_pii"] >= 1

    (tmp_path / "cdx").mkdir()
    res_cdx = svc.run(cfg.transfers[1])
    assert res_cdx.status == DONE, res_cdx.error
    import json as _json
    cdx_rows = [
        _json.loads(l)
        for l in (tmp_path / "cdx" / "shard-0.warc.gz.cdx.jsonl")
        .read_text().splitlines()
    ]
    assert len(cdx_rows) == 2 and all(r["compressed"] for r in cdx_rows)

    res2 = svc.run(cfg.transfers[2])
    assert res2.status == DONE, res2.error
    wet_out = tmp_path / "wet" / "shard-0.warc.gz.wet.warc.gz"
    assert len(decode_warc(wet_out.read_bytes())) == 2


def test_robots_gated_corpus_config(spark, tmp_path):
    """The r9 compliance stage, config-only: the crawl shard carries the
    host's /robots.txt fetch alongside the pages; etly.AttachRobots
    (enricher) broadcast-joins the per-host policy from the batch
    itself, etly.RobotsAllowed (filter) evaluates RFC 9309 per row.
    Disallowed pages are dropped; pages from hosts with no policy pass
    (the spec default)."""
    import shutil

    from etly_spark.config import TransferConfig
    from etly_spark.pipeline import DONE, TransferService

    cfg_path = tmp_path / "crawl_to_corpus.json"
    shutil.copy("examples/crawl_to_corpus.json", cfg_path)
    crawl = tmp_path / "incoming" / "crawl"
    crawl.mkdir(parents=True)
    (tmp_path / "gated").mkdir()

    def resp(uri: str, body: bytes, ctype: str = "text/html; charset=utf-8"):
        hdrs = dict(RESP_HDRS, **{
            "WARC-Target-URI": uri,
            "WARC-Record-ID": f"<urn:uuid:rg-{abs(hash(uri)) % 10**8}>",
        })
        return (hdrs, http_response(body, ctype=ctype))

    robots = b"User-agent: *\nDisallow: /private/\nDisallow: /*.json$\n"
    recs = [
        resp("https://example.com/robots.txt", robots, ctype="text/plain"),
        resp("https://example.com/ok.html",
             b"<html><body><p>public page body</p></body></html>"),
        resp("https://example.com/private/secret.html",
             b"<html><body><p>hidden page body</p></body></html>"),
        resp("https://example.com/data/feed.json.json",
             b"{}", ctype="application/json"),
        # host with NO robots.txt in the crawl -> allowed by default
        resp("https://other.org/private/page.html",
             b"<html><body><p>other host body</p></body></html>"),
    ]
    (crawl / "shard-rg.warc.gz").write_bytes(encode_warc(recs, per_record_gzip=True))

    cfg = TransferConfig.from_json(str(cfg_path))
    t = cfg.transfers[3]
    assert t.content_enricher == "etly.AttachRobots"
    assert t.filter == "etly.RobotsAllowed"
    res = TransferService(spark).run(t)
    assert res.status == DONE, res.error
    uris = {
        r.uri for r in spark.read.parquet(str(tmp_path / "gated" / "shard")).collect()
    }
    assert "https://example.com/ok.html" in uris
    assert "https://other.org/private/page.html" in uris  # no policy -> allow
    assert "https://example.com/robots.txt" in uris  # policy itself not disallowed
    assert "https://example.com/private/secret.html" not in uris
    assert "https://example.com/data/feed.json.json" not in uris  # $-anchored


def test_warc_mutation_fuzz_only_valueerror():
    """Mutation + garbage fuzz (bounded CI slice of the 110k-call
    campaign): decode_warc/split_http_response raise ONLY ValueError on
    any corrupt input — a zlib error or strict-decode error leaking
    from a poisoned shard would dodge fault attribution. Also found:
    corrupted gzip members leaked zlib.error (fixed, now wrapped)."""
    import random

    from etly_spark.operators.htmltext import extract_main_text

    rng = random.Random(7)
    body = http_response(b"<html><body><p>seed &amp; body</p></body></html>")
    for per_gz in (False, True):
        base = encode_warc([(RESP_HDRS, body)], per_record_gzip=per_gz)
        for _ in range(1500):
            b = bytearray(base)
            for _ in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                for r in decode_warc(bytes(b)):
                    try:
                        split_http_response(r.block)
                    except ValueError:
                        pass
            except ValueError:
                pass
    for _ in range(1500):
        junk = bytes(rng.randrange(256) for _ in range(rng.randint(0, 120)))
        try:
            decode_warc(junk)
        except ValueError:
            pass
        src = "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randint(0, 200)))
        html_to_text(src)
        extract_main_text(src)


def test_warc_gzip_bomb_capped():
    """A small gzip that expands past the cap raises ValueError instead
    of materializing the bomb."""
    bomb = gzip.compress(b"\x00" * (1 << 22))  # 4 MiB of zeros, ~4 KB gz
    with pytest.raises(ValueError, match="exceeds"):
        decode_warc(bomb, max_decompressed=1 << 20)


def test_warc_sink_duplicate_records_get_distinct_ids(spark, tmp_path):
    """Two identical records (unchanged re-crawl) must land with
    DISTINCT WARC-Record-IDs (WARC 1.1 per-record uniqueness)."""
    from etly_spark.io.fs import concat_warc

    part = tmp_path / "part0"
    line = '{"uri":"https://e.com/x","text":"same"}'
    part.write_text(line + "\n" + line + "\n")
    dst = tmp_path / "dup.warc"
    concat_warc([f"file://{part}"], f"file://{dst}", per_record_gzip=False)
    recs = decode_warc(dst.read_bytes())
    assert len(recs) == 2
    ids = {r.get("WARC-Record-ID") for r in recs}
    assert len(ids) == 2


def test_streaming_warc_filter_excludes_sidecars(spark, tmp_path):
    """Review find: FilterRegExp must act BEFORE the parse in streaming
    mode — a non-warc sidecar in the source dir must not poison the
    micro-batch."""
    import json

    from etly_spark.config import Source, Target, Transfer
    from etly_spark.streaming import StreamingTransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    _write_corpus_warc(src / "good.warc.gz")
    (src / "manifest.json").write_text('{"not": "warc"}')
    t = Transfer(
        name="stream-warc-filter",
        source=Source(name=str(src), data_format="warc",
                      filter_reg_exp=r".+\.warc\.gz$"),
        target=Target(name=str(tmp_path / "out" / "b-$batchCount.jsonl")),
        base_dir=str(tmp_path),
    )
    q = StreamingTransferService(spark).start(t, available_now=True)
    q.awaitTermination(120)
    rows = [
        json.loads(l)
        for l in (tmp_path / "out" / "b-0.jsonl").read_text().splitlines()
    ]
    assert len(rows) == 2  # only the warc shard's records


# -------------------------------------------------- CDX random access


def test_decode_warc_index_range_get_property():
    """The whole point of the index: slicing data[offset:offset+length]
    out of a per-record-gzip shard and gunzipping it yields EXACTLY
    that record."""
    import base64
    import hashlib

    recs = []
    for i in range(5):
        body = http_response(f"<html><body><p>page {i}</p></body></html>".encode())
        recs.append(
            (dict(RESP_HDRS, **{
                "WARC-Record-ID": f"<urn:uuid:{i}>",
                "WARC-Target-URI": f"https://example.com/{i}"}), body)
        )
    data = encode_warc(recs, per_record_gzip=True)
    idx = decode_warc_index(data)
    assert len(idx) == 5
    assert all(e["compressed"] for e in idx)
    # contiguous, full coverage
    assert idx[0]["offset"] == 0
    assert idx[-1]["offset"] + idx[-1]["length"] == len(data)
    for i, e in enumerate(idx):
        member = data[e["offset"] : e["offset"] + e["length"]]
        rec = decode_warc(member)[0]          # the range-GET scenario
        assert rec.get("WARC-Target-URI") == f"https://example.com/{i}"
        want = ("sha1:"
                + base64.b32encode(hashlib.sha1(rec.block).digest()).decode())
        assert e["digest"] == want
    # plain (uncompressed) shard: spans in the stream itself
    plain = encode_warc(recs, per_record_gzip=False)
    pidx = decode_warc_index(plain)
    assert len(pidx) == 5 and not any(e["compressed"] for e in pidx)
    for i, e in enumerate(pidx):
        rec = decode_warc(plain[e["offset"] : e["offset"] + e["length"]])[0]
        assert rec.get("WARC-Target-URI") == f"https://example.com/{i}"


def test_cdx_pipeline_format(spark, tmp_path):
    """DataFormat 'cdx': the index lands as ndjson rows keyed by shard."""
    import json

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    _write_corpus_warc(src / "crawl.warc.gz")
    t = Transfer(
        name="cdx-index",
        source=Source(name=str(src), data_format="cdx"),
        target=Target(name=str(tmp_path / "out" / "<file>.cdx.jsonl")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    rows = [
        json.loads(l)
        for l in (tmp_path / "out" / "crawl.warc.gz.cdx.jsonl").read_text().splitlines()
    ]
    # ALL records indexed (warcinfo/request too - the index is access-
    # level, not payload-level)
    assert len(rows) == 4
    by_type = {}
    for r in rows:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert set(by_type) == {"warcinfo", "request", "response", "conversion"}
    resp = by_type["response"][0]
    assert resp["uri"] == "https://example.com/p"
    assert resp["compressed"] is True and resp["length"] > 0
    # the recorded range actually fetches the record from the shard
    shard = (src / "crawl.warc.gz").read_bytes()
    rec = decode_warc(shard[resp["offset"] : resp["offset"] + resp["length"]])[0]
    assert rec.get("WARC-Target-URI") == "https://example.com/p"


def test_decode_warc_index_whole_stream_gzip_degrades_correctly():
    """A whole-stream gzip (NOT per-record members) still indexes
    correctly: every record maps to the one member's full range -
    range-GETting it and gunzipping yields a stream containing the
    record (not selective, but never wrong)."""
    recs = [
        (dict(RESP_HDRS, **{"WARC-Record-ID": f"<urn:uuid:{i}>",
                            "WARC-Target-URI": f"https://e.com/{i}"}),
         http_response(f"<p>{i}</p>".encode()))
        for i in range(3)
    ]
    data = gzip.compress(encode_warc(recs, per_record_gzip=False), mtime=0)
    idx = decode_warc_index(data)
    assert len(idx) == 3
    assert all(e["offset"] == 0 and e["length"] == len(data) for e in idx)
    got = decode_warc(data[idx[1]["offset"] : idx[1]["offset"] + idx[1]["length"]])
    assert got[1].get("WARC-Target-URI") == "https://e.com/1"


def test_cdx_index_fuzz_only_valueerror():
    """Bounded slice of the 70k-call campaign: decode_warc_index (its
    own gzip member loop) raises ONLY ValueError on corrupt input."""
    import random

    rng = random.Random(3)
    body = http_response(b"body")
    for per_gz in (True, False):
        base = encode_warc([(RESP_HDRS, body)] * 3, per_record_gzip=per_gz)
        for _ in range(1200):
            b = bytearray(base)
            for _ in range(rng.randint(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                decode_warc_index(bytes(b))
            except ValueError:
                pass
    for _ in range(800):
        junk = bytes(rng.randrange(256) for _ in range(rng.randint(0, 150)))
        try:
            decode_warc_index(junk)
        except ValueError:
            pass


def test_read_record_at_serves_every_cdx_entry(tmp_path):
    """The consumer half of the CDX story: for EVERY index entry, a
    seek+bounded-read (the range-GET stand-in) plus fetch_indexed_record
    returns exactly the indexed record — per-record-gzip and plain
    shards, digest-verified."""
    import base64
    import hashlib

    from etly_spark.operators.warc import (
        decode_warc_index,
        fetch_indexed_record,
        read_record_at,
    )

    recs = [
        (dict(RESP_HDRS, **{"WARC-Record-ID": f"<urn:uuid:ra-{i}>",
                            "WARC-Target-URI": f"https://example.com/{i}"}),
         http_response(f"<html><body>page {i}</body></html>".encode()))
        for i in range(5)
    ]
    for per_gz, name in ((True, "gz.warc.gz"), (False, "plain.warc")):
        p = tmp_path / name
        p.write_bytes(encode_warc(recs, per_record_gzip=per_gz))
        idx = decode_warc_index(p.read_bytes())
        assert len(idx) == 5
        for e in idx:
            rec = read_record_at(
                str(p), e["offset"], e["length"], compressed=e["compressed"]
            )
            assert rec.get("warc-target-uri") == e["uri"]
            digest = "sha1:" + base64.b32encode(
                hashlib.sha1(rec.block).digest()
            ).decode("ascii")
            assert digest == e["digest"]
    # empty range -> clear error, not IndexError
    with pytest.raises(ValueError):
        fetch_indexed_record(b"", compressed=False)
