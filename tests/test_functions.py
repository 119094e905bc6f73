"""Unit tests for the column-function library and multimodal plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etly_spark.functions import hashing as H
from etly_spark.functions import text as T
from etly_spark.operators import multimodal as MM


def test_char_shingles_and_minhash(spark):
    df = spark.createDataFrame([("abcdef",)], "s string")
    row = df.select(
        H.char_shingles(F.col("s"), 3).alias("sh"),
        H.minhash_signature(H.char_shingles(F.col("s"), 3), 4).alias("sig"),
    ).first()
    assert row.sh == ["abc", "bcd", "cde", "def"]
    # permutation 0 of shingle 'abc' is md5(b"0:abc") — verify the min
    # really is the lexicographic min over all shingles.
    expect0 = min(hashlib.md5(f"0:{s}".encode()).hexdigest() for s in row.sh)
    assert row.sig[0] == expect0 and len(row.sig) == 4


def test_token_hash_matches_python(spark):
    df = spark.createDataFrame([("abcdef",)], "s string")
    row = df.select(H.token_hash(F.col("s"), 12).alias("h")).first()
    assert row.h == int(hashlib.md5(b"abcdef").hexdigest()[:12], 16)


def test_simhash48_deterministic_and_bounded(spark):
    df = spark.createDataFrame([("the quick brown fox",), ("the quick brown fox",)], "s string")
    rows = df.select(H.simhash48(T.tokens("s")).alias("h")).collect()
    assert rows[0].h == rows[1].h
    assert 0 <= rows[0].h < (1 << 48)


def test_hamming48(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(H.hamming48(F.col("a"), F.col("b")).alias("d")).first().d == 2


def test_tokens_and_quality(spark):
    df = spark.createDataFrame([("the the quick  fox",), ("",)], "text string")
    rows = df.select(
        T.token_count("text").alias("n"),
        T.quality_score("text").alias("q"),
        T.langid(T.tokens("text")).alias("lang"),
    ).collect()
    assert rows[0].n == 4
    assert 0.0 <= rows[0].q <= 1.0
    assert rows[0].lang == "en"
    assert rows[1].n == 0 and rows[1].lang == "und"


def test_modal_count_and_bigrams(spark):
    df = spark.createDataFrame(
        [("a b a c a b",), ("solo",), ("",), ("x x x x",)], "text string"
    )
    rows = df.select(
        T.modal_count(T.tokens("text")).alias("m"),
        T.modal_count(T.bigrams(T.tokens("text"))).alias("mb"),
        T.bigrams(T.tokens("text")).alias("bg"),
    ).collect()
    assert rows[0].m == 3  # 'a' x3
    assert rows[0].mb == 2  # 'a b' x2
    assert rows[0].bg == ["a b", "b a", "a c", "c a", "a b"]
    assert rows[1].m == 1 and rows[1].mb == 0 and rows[1].bg == []
    assert rows[2].m == 0 and rows[2].bg == []
    assert rows[3].m == 4 and rows[3].mb == 3  # 'x x' x3


def test_decode_real_raises_without_codec():
    if MM.HAVE_PIL:
        pytest.skip("PIL unexpectedly present")
    with pytest.raises(NotImplementedError):
        MM.decode_real(b"\x89PNG...")


def _bmp_bytes(w: int, h: int) -> bytes:
    """Minimal real BMP: 14-byte file header + 40-byte BITMAPINFOHEADER +
    one row of padded BGR pixels."""
    import struct

    row = (w * 3 + 3) & ~3
    pixels = b"\x00" * (row * h)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    return header + info + pixels


def _png_bytes(w: int, h: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def test_parse_image_header_real_bytes():
    """Real header decode of real bytes — no codec library (the PIL gate
    covers pixel decode only)."""
    assert MM.parse_image_header(_bmp_bytes(17, 9)) == ("bmp", 17, 9)
    assert MM.parse_image_header(_png_bytes(640, 480)) == ("png", 640, 480)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\0" * 3
    assert MM.parse_image_header(gif) == ("gif", 320, 200)
    ppm = b"P6\n# a comment\n  1024 768\n255\n" + b"\0" * 12
    assert MM.parse_image_header(ppm) == ("ppm", 1024, 768)
    assert MM.parse_image_header(b"not an image at all") is None
    assert MM.parse_image_header(b"") is None
    assert MM.parse_image_header(b"P6 \xff\xfe") is None  # truncated/garbled
    assert MM.parse_image_header(None) is None  # null payload is data
    # OS/2 BITMAPCOREHEADER: DIB size 12, uint16 dims — not int32 garbage
    import struct as _struct

    core = _struct.pack("<2sIHHI", b"BM", 26 + 12, 0, 0, 26) + _struct.pack(
        "<IHHHH", 12, 100, 50, 1, 24
    )
    assert MM.parse_image_header(core) == ("bmp", 100, 50)
    # unknown DIB variant: refuse rather than emit garbage dimensions
    odd = _struct.pack("<2sIHHI", b"BM", 40, 0, 0, 26) + _struct.pack("<I", 16) + b"\0" * 12
    assert MM.parse_image_header(odd) is None


def test_decode_image_headers_spark(spark):
    """The mapInPandas stage parses real image bytes inside Spark and
    yields nulls (not failures) for unrecognized payloads."""
    rows = [
        (1, _bmp_bytes(17, 9)),
        (2, _png_bytes(640, 480)),
        (3, b"P5 8 4 255 " + b"\0" * 32),
        (4, b"opaque-non-image-payload"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in MM.decode_image_headers(df).collect()}
    assert (got[1].format, got[1].width, got[1].height) == ("bmp", 17, 9)
    assert (got[2].format, got[2].width, got[2].height) == ("png", 640, 480)
    assert (got[3].format, got[3].width, got[3].height) == ("ppm", 8, 4)
    assert got[4].format is None and got[4].width is None


def test_decode_features_batch_shape(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "wxyz")], "doc_id long, text string")
    out = MM.decode_features(MM.attach_binary_payload(df))
    assert out.schema == MM.DECODED_SCHEMA
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].byte_len == 3 and got[1].byte_sum == sum(b"abc")
    assert got[2].width == 16 + 4 and got[2].height == 16 + 2
    assert got[2].mean_byte == round(sum(b"wxyz") / 4, 6)


def test_decode_rounding_is_half_up_like_sql(spark):
    """Regression for the sf1.0-only hash mismatch: a payload whose
    mean lands EXACTLY on a 6-dp half boundary (11861/128 =
    92.6640625) must round HALF_UP like SQL round (→ 92.664063), not
    half-to-even like numpy (→ 92.664062). The kernel emits the raw
    double; F.round on the result must match DuckDB bit-for-bit."""
    import duckdb
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    payload = bytes([93] * 127 + [50])  # sum 11861, len 128
    assert sum(payload) == 11861 and len(payload) == 128
    df = spark.createDataFrame(
        [(1, payload)],
        StructType([StructField("doc_id", LongType()), StructField("payload", BinaryType())]),
    )
    row = (
        MM.decode_features(df)
        .select(F.round("mean_byte", 6).alias("mean_byte"))
        .collect()[0]
    )
    sql_val = duckdb.sql("SELECT round(11861 / CAST(128 AS DOUBLE), 6)").fetchone()[0]
    assert row.mean_byte == sql_val == 92.664063


def test_cosine_similarity_identity(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<double>")
    val = df.select(H.cosine_similarity(F.col("v"), F.col("v")).alias("c")).first().c
    assert abs(val - 1.0) < 1e-12


def test_connected_components_converges_past_fixed_unroll(spark):
    """A duplicate chain of diameter 8 (0-1-2-...-8) must collapse to ONE
    cluster labeled 0 — the regression a fixed-K label-propagation unroll
    (K=6 in round 1) would silently get wrong. Plus a disjoint pair and
    the iteration count staying O(diameter)."""
    from etly_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(8)] + [(100, 101)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels = {r["doc_id"]: r["label"] for r in connected_components(pairs).collect()}
    assert {labels[i] for i in range(9)} == {0}
    assert labels[100] == 100 and labels[101] == 100
    assert len(labels) == 11


def test_url_functions(spark):
    from etly_spark.functions.url import url_host, url_path, url_query

    rows = [
        ("HTTPS://WWW.Example.COM:443/a/b?x=1&y=2#frag",),
        ("http://sub.example.org/path",),
        ("example.net:8080/q?a=b",),          # scheme-less
        ("ftp://files.example.io",),           # no path
        ("https://[2001:db8::1]:8443/v6",),    # IPv6 keeps brackets
    ]
    df = spark.createDataFrame(rows, ["u"])
    got = df.select(
        url_host("u").alias("h"), url_path("u").alias("p"), url_query("u").alias("q")
    ).collect()
    assert [r.h for r in got] == [
        "example.com", "sub.example.org", "example.net",
        "files.example.io", "[2001:db8::1]",
    ]
    assert [r.p for r in got] == ["/a/b", "/path", "/q", "", "/v6"]
    assert [r.q for r in got] == ["x=1&y=2", "", "a=b", "", ""]


def test_url_query_ignores_fragment_question_mark(spark):
    from etly_spark.functions.url import url_query

    df = spark.createDataFrame(
        [("https://app.example.com/#/path?x=1",),
         ("https://e.com/p?a=1#f?b=2",)], ["u"]
    )
    got = [r.q for r in df.select(url_query("u").alias("q")).collect()]
    assert got == ["", "a=1"]


def test_connected_components_deep_chain_fails_loudly(spark):
    """r14 (verdict item 7): a component whose diameter exceeds the
    max_iter rail must RAISE, not silently mislabel one cluster as
    several — min-label propagation needs (distance to the component's
    min-label node) rounds, so a 120-node path graph needs ~119 rounds
    while verified near-dup pair graphs converge in single digits."""
    import pytest as _pytest

    from etly_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=50)
    # the same graph converges (one component, labelled by its min)
    # once the rail covers the diameter
    labels = connected_components(chain, max_iter=130).collect()
    assert {r["label"] for r in labels} == {0}
    assert len(labels) == 121
