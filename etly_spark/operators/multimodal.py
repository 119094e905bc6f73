"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched pandas (mapInPandas).

The reference moves opaque bytes (gzipped ndjson blobs) without looking
inside them (transfer_object_service.go:89-109); here the binary column
is a first-class value with a decode stage. Decode comes in three tiers:

- REAL header parse (`parse_image_header`): BMP/PNG/GIF/PPM dims from
  actual bytes, no codec library.
- REAL pixel/audio/video decode (`decode_pixel_features` /
  `decode_audio_features` / `decode_video_features` over
  `operators.codecs`): BMP, PPM/PGM, PNG (stdlib zlib), GIF
  (pure-Python LZW) pixels, WAV PCM samples, Y4M video frames —
  pure numpy; luminance stats,
  perceptual hashes (ahash/dhash/vhash/audio fingerprint), waveform
  features; near-dup across all three modalities.
- Entropy-coded formats (JPEG/WebP, H.26x/VP9 video): gated on PIL
  (`decode_real`), absent in this container; `_decode_batch` is the
  deterministic byte-level featurizer stand-in so the full-pipeline
  plumbing (schema, Arrow batch shape, partition-parallel mapInPandas,
  no shuffle) stays oracle-checkable end-to-end.

Scale: mapInPandas streams Arrow batches per input partition — no
shuffle, no driver collection; at 100 TB the decode stage is a pure
map with per-executor codec parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

try:  # real codec path — not available in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _signed64(v: int) -> int:
    """uint64 bit pattern -> the int64 Spark stores (two's complement)."""
    return v - (1 << 64) if v >= (1 << 63) else v


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("byte_sum", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("resize_scale", DoubleType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal record: opaque binary payload + typed metadata.

    The payload here is the utf-8 text bytes (the container has no media
    fixtures); schema-wise it is exactly an image/audio blob column.
    """
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(F.col(text_col).cast("binary")).alias("n_bytes"),
            (F.lit(16) + F.col("doc_id") % 32).alias("height"),
            (F.lit(16) + F.octet_length(F.col(text_col).cast("binary")) % 64).alias("width"),
            (F.lit(1) + F.col("doc_id") % 8).alias("n_frames"),
        ),
    )


def decode_real(payload: bytes) -> dict:
    """Full pixel decode — requires PIL, absent here by design. Header
    metadata (format/dimensions) does NOT need PIL: `parse_image_header`
    below reads real bytes for BMP/PPM/PNG/GIF/JPEG. Full PIXEL decode
    does not need PIL either for self-contained formats OR baseline
    JPEG: `operators.codecs.decode_image_pixels` really decodes
    BMP/PPM/PGM/PNG/GIF (stdlib zlib + pure-Python LZW) and baseline
    JFIF (r8: pure-numpy Huffman + dequant + IDCT + YCbCr, with an
    `encode_baseline_jpeg` twin) AND progressive JPEG (r8: SOF2
    spectral selection + successive approximation per T.81 Annex G,
    with an `encode_progressive_jpeg` twin), `operators.codecs
    .decode_audio` WAV (PCM/G.711/ADPCM) + FLAC audio,
    `operators.codecs.decode_y4m` uncompressed video, lossless JPEG
    (SOF3) and lossless WebP (VP8L, `operators.webp`) — only
    hierarchical/arithmetic JPEG, lossy VP8, H.26x and psychoacoustic
    audio (MP3/OGG) remain gated."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "hierarchical/arithmetic JPEG and H.26x need a codec library "
            "absent in this container; BMP/PPM/PGM/PNG/GIF, baseline+"
            "progressive+lossless JPEG and lossless WebP pixels decode "
            "for real via operators.codecs.decode_image_pixels, and "
            "lossy VP8 WebP decodes via the platform libwebp "
            "(operators/libwebp) when present — r9"
        )
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Pure-Python header parse → (format, width, height), or None if the
    bytes are not a recognized image.

    Real decode of real bytes, no codec library: dimensions live at
    fixed/trivially-scanned offsets (BMP BITMAPINFOHEADER, PNG IHDR,
    GIF logical screen descriptor, PPM/PGM ASCII preamble, JPEG SOFn
    marker walk, WebP VP8X/VP8L/VP8 headers). Pixel decode of the
    arithmetic-coded formats (lossy VP8, H.26x) stays behind the PIL
    gate in `decode_real`.
    """
    import struct

    if payload is None:
        return None
    if len(payload) >= 26 and payload[:2] == b"BM":
        # dispatch on the DIB header size @14: BITMAPCOREHEADER (12)
        # carries uint16 dims, BITMAPINFOHEADER and its v4/v5 extensions
        # (>=40) carry int32 dims (height may be negative = top-down)
        (dib,) = struct.unpack_from("<I", payload, 14)
        if dib == 12:
            w, h = struct.unpack_from("<HH", payload, 18)
            return ("bmp", int(w), int(h))
        if dib >= 40:
            w, h = struct.unpack_from("<ii", payload, 18)
            return ("bmp", int(w), abs(int(h)))
        return None  # unknown DIB variant: don't emit garbage dims
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is always the first chunk: uint32 width @16, height @20 (BE)
        w, h = struct.unpack_from(">II", payload, 16)
        return ("png", int(w), int(h))
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        # JPEG: walk markers to the first SOFn (dims live there, not at
        # a fixed offset); entropy decode is NOT needed for metadata
        pos = 2
        while pos + 4 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                continue
            (seglen,) = struct.unpack_from(">H", payload, pos)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 7 > len(payload):
                    return None
                h, w = struct.unpack_from(">HH", payload, pos + 3)
                return ("jpeg", int(w), int(h))
            pos += seglen
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        # logical screen descriptor: uint16 width @6, height @8 (LE)
        w, h = struct.unpack_from("<HH", payload, 6)
        return ("gif", int(w), int(h))
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        # WebP: VP8X / VP8L / lossy VP8 dims, no entropy decode needed
        from etly_spark.operators.webp import parse_webp_header

        return parse_webp_header(payload)
    if len(payload) >= 8 and payload[:4] in (b"II*\x00", b"MM\x00*"):
        # TIFF: walk the first IFD for ImageWidth/ImageLength
        bo = "<" if payload[:2] == b"II" else ">"
        (ifd,) = struct.unpack_from(bo + "I", payload, 4)
        if ifd + 2 > len(payload):
            return None
        (n_tags,) = struct.unpack_from(bo + "H", payload, ifd)
        w = h = 0
        for t in range(n_tags):
            off = ifd + 2 + 12 * t
            if off + 12 > len(payload):
                return None
            tag, ttype, _count = struct.unpack_from(bo + "HHI", payload, off)
            if tag in (256, 257) and ttype in (3, 4):
                (v,) = struct.unpack_from(bo + ("H" if ttype == 3 else "I"), payload, off + 8)
                if tag == 256:
                    w = v
                else:
                    h = v
        return ("tiff", int(w), int(h)) if w and h else None
    if len(payload) >= 2 and payload[:1] == b"P" and payload[1:2] in b"123456":
        # Netpbm (PPM/PGM/PBM): ASCII "P6 <w> <h> <maxval>" with
        # whitespace/comments between tokens
        tokens: list[int] = []
        i = 2
        while len(tokens) < 2 and i < min(len(payload), 4096):
            c = payload[i : i + 1]
            if c == b"#":  # comment to end of line
                j = payload.find(b"\n", i)
                i = len(payload) if j < 0 else j + 1
            elif c.isspace():
                i += 1
            elif c.isdigit():
                j = i
                while j < len(payload) and payload[j : j + 1].isdigit():
                    j += 1
                tokens.append(int(payload[i:j]))
                i = j
            else:
                return None
        if len(tokens) == 2:
            return ("ppm", tokens[0], tokens[1])
    return None


IMAGE_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def decode_image_headers(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL header decode: (doc_id, payload) → format/dims.

    Same plumbing contract as `decode_features` (pure map, pruned input,
    one Arrow batch resident); unrecognized payloads yield nulls rather
    than failing the batch — corrupt media is data, not an exception,
    at 100 TB.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            parsed = [parse_image_header(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "format": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int64"
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int64"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, IMAGE_HEADER_SCHEMA)


def _decode_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic fake decode of one Arrow batch (vectorized numpy)."""
    import numpy as np
    import pandas as pd

    payloads = pdf["payload"]
    byte_len = payloads.map(len).astype("int64")
    byte_sum = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())).astype(
        "int64"
    )
    # RAW doubles — rounding happens Spark-side with F.round (HALF_UP,
    # matching SQL round). numpy's .round is half-to-EVEN: on an exact
    # 6-dp half-boundary (one row per ~10^5 at sf1.0 hit 92.6640625)
    # the two rules disagree and the cross-engine hash gate fails.
    mean_byte = byte_sum / byte_len.clip(lower=1)
    width = (16 + byte_len % 64).astype("int64")
    height = (16 + pdf["doc_id"] % 32).astype("int64")
    resize_scale = 32.0 / np.maximum(width, height)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "byte_len": byte_len,
            "byte_sum": byte_sum,
            "mean_byte": mean_byte,
            "width": width,
            "height": height,
            "n_frames": (1 + pdf["doc_id"] % 8).astype("int64"),
            "resize_scale": resize_scale,
        }
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract: (doc_id, payload) → features.

    Pure map over partitions — Catalyst prunes input columns to the two
    used, and the pandas iterator keeps peak memory to one Arrow batch.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return df.select("doc_id", "payload").mapInPandas(run, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# REAL pixel/audio decode operators (pure numpy + stdlib codecs)
# ---------------------------------------------------------------------------


def synthesize_ppm_payload(df: DataFrame, w: int = 16, h: int = 16, text_col: str = "text") -> DataFrame:
    """Build a REAL image payload column from text bytes: a valid binary
    PPM (P6) whose raster is the text space-padded/truncated to w*h*3
    bytes. The result decodes with any conformant Netpbm reader — and
    because the raster is pure byte arithmetic over the text, a SQL
    oracle can mirror every decoded statistic without a codec.
    """
    n = w * h * 3
    header = f"P6\n{w} {h}\n255\n"
    return df.withColumn(
        "payload",
        F.concat(
            F.lit(header.encode()),
            F.rpad(F.col(text_col), n, " ").cast("binary"),
        ),
    )


def entropy_roundtrip_features(
    df: DataFrame,
    w: int = 16,
    h: int = 16,
    every: int = 50,
    flac_offset: int = 25,
    warc_offset: int = 37,
) -> DataFrame:
    """ONE sampled pass for ALL entropy/container round-trip branches:
    docs with doc_id % every == 0 go through the VP8L pair, ==
    ``flac_offset`` through the FLAC pair, == ``warc_offset`` through
    the full web-corpus chain (text → escaped HTML → HTTP response →
    WARC record → per-record gzip → decode_warc → split_http_response
    → html_to_text — operators/warc.py, operators/htmltext.py).
    Fusing them keeps the sampled-branch overhead of
    `mm_binary_metadata` at one filter, one balance repartition, one
    Python-worker stage (measured ~0.5 s of the ~0.9 s two-stage cost
    at sf0.1 was worker round-trip, not codec).
    Columns are the superset: width/height carry image dims for webp
    rows, frames/channels for flac rows, and (http_status,
    records_parsed) for warc rows; ``hdr`` carries the parsed WARC
    version string (NULL elsewhere)."""
    n = w * h * 3
    nframes = n // 4
    sub = df.filter(
        (F.col("doc_id") % every == 0)
        | (F.col("doc_id") % every == flac_offset)
        | (F.col("doc_id") % every == warc_offset)
    ).select("doc_id", "text")
    sub = sub.repartition(sub.sparkSession.sparkContext.defaultParallelism)
    schema = (
        "variant string, doc_id long, enc_bytes long, payload_md5 string, "
        "width long, height long, mean_luma double, hdr string"
    )

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from etly_spark.operators import codecs as _codecs
        from etly_spark.operators import flac as _flac
        from etly_spark.operators import htmltext as _htmltext
        from etly_spark.operators import warc as _warc
        from etly_spark.operators import webp as _webp

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if int(did) % every == warc_offset:
                    body = (
                        "<html><head><title></title>"
                        "<script>void(0)</script></head><body>"
                        + _htmltext.escape_html_text(text or "")
                        + "</body></html>"
                    ).encode()
                    http = (
                        b"HTTP/1.1 200 OK\r\n"
                        b"Content-Type: text/html; charset=utf-8\r\n"
                        b"Content-Length: " + str(len(body)).encode()
                        + b"\r\n\r\n" + body
                    )
                    data = _warc.encode_warc(
                        [
                            (
                                {
                                    "WARC-Type": "warcinfo",
                                    "WARC-Record-ID": f"<urn:uuid:{int(did):032x}>",
                                    "WARC-Date": "2026-01-01T00:00:00Z",
                                    "Content-Type": "application/warc-fields",
                                },
                                b"software: etly_spark\r\n",
                            ),
                            (
                                {
                                    "WARC-Type": "response",
                                    "WARC-Record-ID": f"<urn:uuid:{int(did) + 1:032x}>",
                                    "WARC-Date": "2026-01-01T00:00:00Z",
                                    "WARC-Target-URI": f"https://example.com/doc/{int(did)}",
                                    "Content-Type": "application/http; msgtype=response",
                                },
                                http,
                            ),
                        ],
                        per_record_gzip=True,
                    )
                    recs = _warc.decode_warc(data)
                    assert recs[0].warc_type == "warcinfo"
                    resp = recs[1]
                    status, _hdrs, got_body = _warc.split_http_response(resp.block)
                    extracted = _htmltext.html_to_text(got_body.decode())
                    rows.append(
                        (
                            "warc",
                            int(did),
                            int(resp.get("Content-Length")),
                            hashlib.md5(extracted.encode()).hexdigest(),
                            int(status),
                            len(recs),
                            None,
                            resp.version,
                        )
                    )
                    continue
                raw = (text or "").encode()[:n].ljust(n, b" ")
                if int(did) % every == 0:
                    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
                    enc = _webp.encode_lossless_webp(arr, cache_bits=4)
                    fmt, pw, ph = parse_image_header(enc)
                    assert fmt == "webp"
                    dec = _codecs.decode_image_pixels(enc)
                    rows.append(
                        (
                            "webp",
                            int(did),
                            len(enc),
                            hashlib.md5(dec.tobytes()).hexdigest(),
                            int(pw),
                            int(ph),
                            float(int(dec.astype(np.int64).sum()) / n),
                            None,
                        )
                    )
                else:
                    pcm = np.frombuffer(raw, dtype="<i2").astype(np.int64).reshape(nframes, 2)
                    enc = _flac.encode_flac(pcm, 16000, bps=16, block_size=nframes)
                    out = _flac.decode_flac(enc)
                    assert out is not None
                    rate, dec, bps = out
                    assert rate == 16000 and bps == 16
                    back = dec.astype("<i2").tobytes()
                    rows.append(
                        (
                            "flac",
                            int(did),
                            len(enc),
                            hashlib.md5(back).hexdigest(),
                            int(dec.shape[0]),
                            int(dec.shape[1]),
                            float(
                                int(np.frombuffer(back, dtype=np.uint8).astype(np.int64).sum())
                                / n
                            ),
                            None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "variant", "doc_id", "enc_bytes", "payload_md5", "width",
                    "height", "mean_luma", "hdr",
                ],
            )

    return sub.mapInPandas(gen, schema)


PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_md5", StringType()),
        StructField("mean_luma", DoubleType()),
        StructField("std_luma", DoubleType()),
        StructField("ahash64", LongType()),
        StructField("dhash64", LongType()),
    ]
)


def decode_pixel_features(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL pixel decode: (doc_id, payload) → per-image
    features over actual decoded pixels (BMP/PPM/PGM/PNG — see
    `operators.codecs`). `pixel_md5` digests the decoded raster bytes,
    so a mismatch anywhere in the codec fails the oracle gate, not just
    the summary stats. ahash64/dhash64 are perceptual hashes (the image
    twin of simhash) used by the image near-dup operator.

    Unrecognized/corrupt payloads yield null features — bad media is
    data at 100 TB. Pure map: no shuffle, pruned input, one Arrow batch
    resident per thread.
    """
    import hashlib

    import pandas as pd

    from etly_spark.operators import codecs

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # vectorized fast path: a uniform-shape P6 batch (the
            # thumbnail-pipeline case) decodes as ONE reshape and
            # featurizes broadcast — bit-identical to the scalar loop
            stack = codecs.batch_uniform_p6(list(pdf["payload"]))
            if stack is not None:
                st = codecs.batch_image_stats(stack)
                n = stack.shape[0]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].astype("int64").to_numpy(),
                        "format": ["ppm"] * n,
                        "width": pd.array([st["width"]] * n, dtype="Int64"),
                        "height": pd.array([st["height"]] * n, dtype="Int64"),
                        "n_pixels": pd.array([st["n_pixels"]] * n, dtype="Int64"),
                        "pixel_md5": [
                            hashlib.md5(stack[i].tobytes()).hexdigest() for i in range(n)
                        ],
                        "mean_luma": pd.array(st["mean_luma"], dtype="float64"),
                        "std_luma": pd.array(st["std_luma"], dtype="float64"),
                        "ahash64": pd.array(
                            [_signed64(int(v)) for v in st["ahash64"]], dtype="Int64"
                        ),
                        "dhash64": pd.array(
                            [_signed64(int(v)) for v in st["dhash64"]], dtype="Int64"
                        ),
                    }
                )
                continue
            out: dict[str, list] = {k.name: [] for k in PIXEL_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                arr = codecs.decode_image_pixels(payload)
                if arr is None:
                    hdr = parse_image_header(payload)
                    out["format"].append(hdr[0] if hdr else None)
                    for k in (
                        "width",
                        "height",
                        "n_pixels",
                        "pixel_md5",
                        "mean_luma",
                        "std_luma",
                        "ahash64",
                        "dhash64",
                    ):
                        out[k].append(None)
                    continue
                hdr = parse_image_header(payload)
                st = codecs.image_stats(arr)
                out["format"].append(hdr[0] if hdr else "raw")
                out["width"].append(st["width"])
                out["height"].append(st["height"])
                out["n_pixels"].append(st["n_pixels"])
                out["pixel_md5"].append(hashlib.md5(arr.tobytes()).hexdigest())
                out["mean_luma"].append(st["mean_luma"])
                out["std_luma"].append(st["std_luma"])
                # perceptual hashes live in [0, 2^64); store as the
                # sign-wrapped int64 twin (bit pattern preserved)
                out["ahash64"].append(_signed64(st["ahash64"]))
                out["dhash64"].append(_signed64(st["dhash64"]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "format": out["format"],
                    "width": pd.array(out["width"], dtype="Int64"),
                    "height": pd.array(out["height"], dtype="Int64"),
                    "n_pixels": pd.array(out["n_pixels"], dtype="Int64"),
                    "pixel_md5": out["pixel_md5"],
                    "mean_luma": pd.array(out["mean_luma"], dtype="float64"),
                    "std_luma": pd.array(out["std_luma"], dtype="float64"),
                    "ahash64": pd.array(out["ahash64"], dtype="Int64"),
                    "dhash64": pd.array(out["dhash64"], dtype="Int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, PIXEL_SCHEMA)


def _band_table(feat: DataFrame, hash_col: str, bands: int) -> DataFrame:
    """(doc_id, h, b, band_key) rows: the 64-bit hash split into
    ``bands`` contiguous (64/bands)-bit keys — the single definition
    both the batch self-join and the incremental probe build on, so
    the two paths cannot diverge."""
    if 64 % bands != 0:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    mask = (1 << width) - 1
    h = feat.select("doc_id", F.col(hash_col).alias("h")).where(F.col("h").isNotNull())
    return h.select(
        "doc_id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftrightunsigned(F.col("h"), width * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "h", F.col("bk.b").alias("b"), F.col("bk.band_key").alias("band_key"))


def hash64_near_dup(
    feat: DataFrame,
    hash_col: str,
    max_hamming: int = 6,
    bucket_cap: int = 64,
    bands: int = 4,
) -> DataFrame:
    """Band-blocked near-dup self-join over ANY 64-bit perceptual hash
    column + hamming verify — the shared engine behind image
    (ahash64) and audio (afp64) near-dup, same plan shape as
    dedup_simhash, same hot-bucket cap contract.

    ``feat`` carries (doc_id, <hash_col>).
    ``bands`` x (64/bands)-bit bands of the 64-bit hash (image default
    4x16, audio 8x8). Recall contract:
    pigeonhole GUARANTEES a band collision only for hamming <= 3;
    above that it is probabilistic — a pair whose >=4 differing bits
    land one-per-band is missed. In practice near-dup thumbnails
    differ in spatially clustered cells, so measured recall at the
    default radius is ~99.9% (tools/stress_media.py: 4996/5000
    planted +-4-jitter pairs, zero false positives). Callers needing
    a hard guarantee at radius r must use >= r+1 bands (and accept
    coarser band keys -> more cap pressure).
    Buckets larger than ``bucket_cap`` are flat-color boilerplate
    (e.g. all-black frames), not duplication signal — dropped, same
    rationale as the MinHash/embedding caps. Returns (doc_a, doc_b,
    hamming) with doc_a < doc_b.

    Scale: the only shuffle is the band-key self-join, skew-bounded by
    the cap; hamming is codegen'd bit_count(xor) — no Python.
    """
    from pyspark.sql import Window

    band_rows = _band_table(feat, hash_col, bands)
    sized = band_rows.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("b", "band_key"))
    ).filter(F.col("bucket_n") <= bucket_cap)
    a, bb = sized.alias("a"), sized.alias("b")
    return (
        a.join(
            bb,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_near_dup(
    feat: DataFrame, max_hamming: int = 6, bucket_cap: int = 64
) -> DataFrame:
    """Perceptual image near-dup over ahash64 (see hash64_near_dup)."""
    return hash64_near_dup(feat, "ahash64", max_hamming, bucket_cap)


def audio_near_dup(
    feat: DataFrame, max_hamming: int = 7, bucket_cap: int = 64
) -> DataFrame:
    """Perceptual audio near-dup over the 64-bit energy-delta
    fingerprint (afp64 from decode_audio_features) — same band-join
    plan and cap contract as the image/text near-dup family; the
    fingerprint is gain-invariant, so re-encoded / re-levelled copies
    of the same recording pair up without waveform comparison.

    8x8-bit bands (vs the image default 4x16): noise flips
    energy-delta bits at SCATTERED frame positions (wherever adjacent
    energies are close), unlike image thumbnails where flips cluster
    spatially — so audio needs the pigeonhole guarantee (collision
    for hamming <= bands-1 = 7) rather than clustered-flip luck."""
    return hash64_near_dup(feat, "afp64", max_hamming, bucket_cap, bands=8)


def hash64_near_dup_incremental(
    new_feats: DataFrame,
    index_feats: DataFrame,
    hash_col: str,
    max_hamming: int = 6,
    bucket_cap: int = 64,
    bands: int = 4,
) -> DataFrame:
    """Incremental perceptual near-dup over ANY 64-bit hash column:
    band-probe a NEW batch of features against the full accumulated
    index (which includes the batch) — work is O(batch x density),
    never an index self-join. Same contract as the text/vector
    incremental paths (queries.dedup.lsh_incremental_pairs): bucket
    density is measured over the FULL band table so the hot-bucket cap
    sees true bucket size, and results provably equal the batch
    `hash64_near_dup` pairs restricted to new-involving rows (band
    membership of a hash is batch-independent). Returns
    (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    from pyspark.sql import Window

    full = _band_table(index_feats, hash_col, bands)
    sized = full.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("b", "band_key"))
    ).filter(F.col("bucket_n") <= bucket_cap)
    new_ids = new_feats.select("doc_id").distinct()
    new_side = sized.join(F.broadcast(new_ids), "doc_id").alias("n")
    fullb = sized.alias("f")
    return (
        new_side.join(
            fullb,
            (F.col("n.b") == F.col("f.b"))
            & (F.col("n.band_key") == F.col("f.band_key"))
            & (F.col("n.doc_id") != F.col("f.doc_id")),
        )
        .select(
            F.least("n.doc_id", "f.doc_id").alias("doc_a"),
            F.greatest("n.doc_id", "f.doc_id").alias("doc_b"),
            F.bit_count(F.col("n.h").bitwiseXOR(F.col("f.h"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_near_dup_incremental(
    new_feats: DataFrame,
    index_feats: DataFrame,
    max_hamming: int = 6,
    bucket_cap: int = 64,
) -> DataFrame:
    """Incremental image near-dup over ahash64 (4x16 bands)."""
    return hash64_near_dup_incremental(
        new_feats, index_feats, "ahash64", max_hamming, bucket_cap, bands=4
    )


def audio_near_dup_incremental(
    new_feats: DataFrame,
    index_feats: DataFrame,
    max_hamming: int = 7,
    bucket_cap: int = 64,
) -> DataFrame:
    """Incremental audio near-dup over afp64 (8x8 bands — see
    audio_near_dup for the band-width rationale)."""
    return hash64_near_dup_incremental(
        new_feats, index_feats, "afp64", max_hamming, bucket_cap, bands=8
    )


def video_near_dup_incremental(
    new_feats: DataFrame,
    index_feats: DataFrame,
    max_hamming: int = 7,
    bucket_cap: int = 64,
) -> DataFrame:
    """Incremental video near-dup over vhash64 (8x8 bands)."""
    return hash64_near_dup_incremental(
        new_feats, index_feats, "vhash64", max_hamming, bucket_cap, bands=8
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_cross_rate", DoubleType()),
        StructField("afp64", LongType()),
    ]
)


def decode_audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: (doc_id, payload) → waveform
    features over actual decoded PCM (`operators.codecs.decode_audio`:
    WAV incl. G.711/ADPCM families, and FLAC). Null row for
    undecodable payloads. Same plumbing contract as
    `decode_pixel_features`.
    """
    import pandas as pd

    from etly_spark.operators import codecs

    cols = [f.name for f in AUDIO_SCHEMA.fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                dec = codecs.decode_audio(payload)
                if dec is None:
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                st = codecs.audio_stats(*dec)
                st["afp64"] = _signed64(codecs.audio_fingerprint64(dec[1]))
                for k in cols[1:]:
                    out[k].append(st[k])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int64"),
                    "n_channels": pd.array(out["n_channels"], dtype="Int64"),
                    "n_samples": pd.array(out["n_samples"], dtype="Int64"),
                    "duration_s": pd.array(out["duration_s"], dtype="float64"),
                    "rms": pd.array(out["rms"], dtype="float64"),
                    "peak": pd.array(out["peak"], dtype="float64"),
                    "zero_cross_rate": pd.array(out["zero_cross_rate"], dtype="float64"),
                    "afp64": pd.array(out["afp64"], dtype="Int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_SCHEMA)


VIDEO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("fps", DoubleType()),
        StructField("duration_s", DoubleType()),
        StructField("mean_luma", DoubleType()),
        StructField("vhash64", LongType()),
        StructField("mid_ahash64", LongType()),
    ]
)


def decode_video_features(df: DataFrame, max_frames: int = 256) -> DataFrame:
    """Arrow-batched REAL video decode: (doc_id, payload) -> per-video
    features over actual decoded Y4M luma frames (operators.codecs.
    decode_y4m — YUV4MPEG2, the uncompressed container; entropy-coded
    video stays behind the PIL/codec gate). Emits geometry, duration,
    luminance, the temporal fingerprint (vhash64 — scene-brightness
    rise/fall curve, the video twin of the audio fingerprint) and the
    middle frame's spatial ahash. Null row for non-video payloads.
    Same plumbing contract as the image/audio decoders: pure map, one
    Arrow batch resident, max_frames bounds per-record memory.
    """
    import pandas as pd

    from etly_spark.operators import codecs

    cols = [f.name for f in VIDEO_SCHEMA.fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(int(doc_id))
                dec = codecs.decode_video(payload, max_frames=max_frames)
                if dec is None:
                    for k in cols[1:]:
                        out[k].append(None)
                    continue
                st = codecs.video_stats(*dec)
                st["vhash64"] = _signed64(st["vhash64"])
                st["mid_ahash64"] = _signed64(st["mid_ahash64"])
                for k in cols[1:]:
                    out[k].append(st[k])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "width": pd.array(out["width"], dtype="Int64"),
                    "height": pd.array(out["height"], dtype="Int64"),
                    "n_frames": pd.array(out["n_frames"], dtype="Int64"),
                    "fps": pd.array(out["fps"], dtype="float64"),
                    "duration_s": pd.array(out["duration_s"], dtype="float64"),
                    "mean_luma": pd.array(out["mean_luma"], dtype="float64"),
                    "vhash64": pd.array(out["vhash64"], dtype="Int64"),
                    "mid_ahash64": pd.array(out["mid_ahash64"], dtype="Int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, VIDEO_SCHEMA)


def video_near_dup(
    feat: DataFrame, max_hamming: int = 7, bucket_cap: int = 64
) -> DataFrame:
    """Perceptual video near-dup over the temporal fingerprint (vhash64
    from decode_video_features). Like audio, temporal rise/fall bits
    flip at scattered positions under noise, so 8x8-bit bands provide
    the pigeonhole recall guarantee at hamming <= 7. Candidates sharing
    a temporal band can be second-pass-verified on mid_ahash64 by the
    caller when temporal curves alone are too coarse (e.g. static
    scenes)."""
    return hash64_near_dup(feat, "vhash64", max_hamming, bucket_cap, bands=8)


def synthesize_y4m_payload(
    df: DataFrame, w: int = 8, h: int = 8, n_frames: int = 6, text_col: str = "text"
) -> DataFrame:
    """Build a REAL video payload column from text bytes: a valid
    YUV4MPEG2 stream whose frame lumas are consecutive w*h slices of
    the text space-padded to n_frames*w*h bytes (neutral 4:2:0 chroma).
    Decodes with any conformant Y4M reader, and every decoded frame
    statistic is mirrorable by byte arithmetic in a SQL oracle — the
    video twin of synthesize_ppm_payload."""
    luma = w * h
    padded = F.rpad(F.col(text_col), n_frames * luma, " ")
    header = F.lit(f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode())
    chroma = F.lit(b"\x80" * ((w // 2) * (h // 2) * 2))
    parts = [header]
    for f in range(n_frames):
        parts += [
            F.lit(b"FRAME\n"),
            F.substring(padded, f * luma + 1, luma).cast("binary"),
            chroma,
        ]
    return df.withColumn("payload", F.concat(*parts))


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("f_sum", LongType()),
    ]
)


def decode_frame_samples(
    df: DataFrame,
    step: int = 2,
    avi: dict | None = None,
) -> DataFrame:
    """Arrow-batched REAL frame sampling: decode each row's video
    payload (`operators.codecs.decode_video` — Y4M or AVI/MJPEG) and
    emit one row per SAMPLED frame (every ``step``-th) with that
    frame's decoded luma sum, tagged with the container variant.

    ``avi`` (dict: w, h, n_frames, every, offset) additionally runs
    the compressed-container round-trip for the 1-in-``every`` doc
    sample IN THE SAME Python stage: the sampled doc's text is packed
    into gray frames, wrapped in a REAL AVI container with
    lossless-JPEG (SOF3) frames (`codecs.encode_mjpeg_avi
    (lossless=True)`), and fully decoded back through the RIFF walk +
    JPEG entropy decoder — rows tagged 'avi'. Riding the existing
    stage instead of spawning its own saves the per-stage
    Python-worker round-trip that dominated the separate-operator
    form (~0.5 s of its 0.78 s at sf0.1 — same measurement as the
    entropy_roundtrip_features fusion).

    Pure map; per-record memory bounded by the decoder's frame cap;
    corrupt payloads contribute no rows (a count-level oracle catches
    silent drops)."""
    import pandas as pd

    from etly_spark.operators import codecs

    schema = StructType(
        [StructField("variant", StringType())] + list(FRAME_SAMPLE_SCHEMA.fields)
    )
    cols = ["doc_id", "payload"] + (["text"] if avi else [])
    # balance the CPU-heavy decode map across cores: the documents
    # scan is 1-2 files at small SFs, which would serialize the whole
    # per-doc codec work onto as many tasks (same rationale and knob
    # as entropy_roundtrip_features — a keyless shuffle of a slim
    # projected slice)
    df = df.select(*cols).repartition(df.sparkSession.sparkContext.defaultParallelism)

    def emit(out, variant, doc_id, frames):
        n, h, w = frames.shape
        for f in range(0, n, step):
            out["variant"].append(variant)
            out["doc_id"].append(int(doc_id))
            out["frame_no"].append(f)
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(n)
            out["f_sum"].append(int(frames[f].astype("int64").sum()))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in schema.fields}
            for row in pdf.itertuples(index=False):
                dec = codecs.decode_video(row.payload)
                if dec is not None:
                    emit(out, "y4m", row.doc_id, dec[1])
                if avi and int(row.doc_id) % avi["every"] == avi["offset"]:
                    total = avi["w"] * avi["h"] * avi["n_frames"]
                    raw = (row.text or "").encode()[:total].ljust(total, b" ")
                    frames = np.frombuffer(raw, dtype=np.uint8).reshape(
                        avi["n_frames"], avi["h"], avi["w"]
                    )
                    payload = codecs.encode_mjpeg_avi(frames, fps=10.0, lossless=True)
                    adec = codecs.decode_video(payload)
                    assert adec is not None and adec[1].shape == frames.shape
                    emit(out, "avi", row.doc_id, adec[1])
            ints = {f.name for f in FRAME_SAMPLE_SCHEMA.fields}
            yield pd.DataFrame(
                {
                    k: (pd.array(v, dtype="int64") if k in ints else v)
                    for k, v in out.items()
                }
            )

    return df.mapInPandas(run, schema)
