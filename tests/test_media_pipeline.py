"""End-to-end media curation: the operators compose into the pipeline a
multimodal training corpus needs — REAL decode -> quality gate on
decoded stats -> perceptual near-dup keep-one -> columnar dataset sink
-> read-back verification. No shuffle before the dedup band join; the
sink lands partitioned parquet."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etly_spark.operators.multimodal import decode_pixel_features, image_near_dup
from tests.test_codecs import encode_bmp, encode_png, rand_img


def test_config_driven_media_transfer(spark, tmp_path):
    """The media pipeline as a config-driven Transfer using only
    BUILT-IN registry names: datastore source over a parquet table of
    binary payloads -> 'etly.DecodableImage' filter (magic-byte gate)
    -> 'etly.DecodePixelFeatures' transformer (real codec) -> parquet
    dataset sink. The reference's name-in-config contract, media-native.
    """
    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    store = tmp_path / "store"
    img = rand_img(10, 10)
    rows = [
        (1, bytearray(encode_bmp(img))),
        (2, bytearray(encode_png(img))),
        (3, bytearray(b"not media at all")),  # gated by the filter
    ]
    spark.createDataFrame(rows, "doc_id long, payload binary").write.parquet(
        str(store / "media.parquet")
    )
    t = Transfer(
        name="media-decode",
        source=Source(
            name="SELECT doc_id, payload FROM media",
            type="datastore",
            ds_config={
                "DriverName": "parquet",
                "Parameters": {"url": f"file://{store}"},
            },
        ),
        target=Target(name=str(tmp_path / "out" / "features"), data_format="parquet"),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        filter="etly.DecodableImage",
        transformer="etly.DecodePixelFeatures",
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    back = spark.read.parquet(str(tmp_path / "out" / "features"))
    got = {r.doc_id: r for r in back.collect()}
    assert set(got) == {1, 2}  # non-media row filtered before decode
    import hashlib

    want_md5 = hashlib.md5(img.tobytes()).hexdigest()
    assert got[1].pixel_md5 == want_md5 and got[2].pixel_md5 == want_md5
    assert got[1].ahash64 == got[2].ahash64


def test_streaming_media_decode(spark, tmp_path):
    """The decode operator is a pure map, so it runs unchanged on a
    stream: a file-stream of binary payloads decodes micro-batch by
    micro-batch (the continuous-ingest shape for a media corpus)."""
    img = rand_img(16, 16)
    src = tmp_path / "mstream"
    src.mkdir()
    spark.createDataFrame(
        [(1, bytearray(encode_bmp(img))), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    ).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema("doc_id long, payload binary").parquet(
        str(src / "*.parquet")
    )
    q = (
        decode_pixel_features(stream)
        .writeStream.format("memory")
        .queryName("mdec_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM mdec_t").collect()}
    assert rows[1].format == "bmp" and rows[1].width == 16
    assert rows[2].pixel_md5 is None


def test_text_quality_signals_builtin(spark):
    from etly_spark import builtins  # noqa: F401
    from etly_spark import registry

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in registry.transformers.get("etly.TextQualitySignals")(df).collect()}
    assert 0.0 <= out[1].quality <= 1.0 and out[1].lang_pred == "en"
    assert out[2].lang_pred == "und"
    # shape contract: appends columns, keeps the record's own
    assert set(out[1].asDict()) == {"doc_id", "text", "quality", "lang_pred"}


def test_decodable_media_filter(spark):
    from etly_spark import builtins  # noqa: F401
    from etly_spark import registry
    from tests.test_codecs import encode_wav, encode_y4m

    wav = encode_wav(np.zeros((100, 1)), 8000)
    y4m = encode_y4m(np.zeros((2, 4, 4), dtype=np.uint8))
    rows = [
        (1, bytearray(encode_bmp(rand_img(4, 4)))),
        (2, bytearray(wav)),
        (3, bytearray(y4m)),
        (4, bytearray(b"plain text payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pred = registry.filters.get("etly.DecodableMedia")(df)
    kept = {r.doc_id for r in df.filter(pred).collect()}
    assert kept == {1, 2, 3}


def test_incremental_image_near_dup_equals_batch(spark, tmp_path):
    """Continuous-ingest image dedup: stream media batches into the
    perceptual-hash index (idempotent epoch folds), then band-probe a
    new batch against the accumulated index — incremental results must
    equal the batch self-join restricted to new-involving pairs."""
    import os

    from etly_spark.operators.multimodal import (
        image_near_dup,
        image_near_dup_incremental,
    )
    from etly_spark.streaming.dedup import start_pixel_index

    rng = np.random.default_rng(5)
    base_imgs = {i: rand_img(24, 24) for i in range(12)}
    corpus_rows = [(i, bytearray(encode_bmp(img))) for i, img in base_imgs.items()]
    # "new" batch: jittered copies of images 0..2 + one fresh image
    jitter = lambda im: np.clip(
        im.astype(np.int16) + rng.integers(-3, 4, im.shape), 0, 255
    ).astype(np.uint8)
    new_rows = [(100 + i, bytearray(encode_bmp(jitter(base_imgs[i])))) for i in range(3)]
    new_rows.append((199, bytearray(encode_bmp(rand_img(24, 24)))))

    # stream the corpus, then the new batch, into the index
    src = tmp_path / "media_in"
    src.mkdir()
    base = __import__("time").time() - 3600
    for i, rows in enumerate([corpus_rows, new_rows]):
        p = str(src / f"b{i}.parquet")
        spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(1).write.parquet(p)
        for dirpath, _d, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(dirpath, fn), (base + i, base + i))
    stream = spark.readStream.schema("doc_id long, payload binary").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "b*.parquet"))
    q = start_pixel_index(
        stream, str(tmp_path / "pix_index"), str(tmp_path / "pix_ckpt")
    )
    q.awaitTermination(120)

    index = spark.read.parquet(str(tmp_path / "pix_index")).drop("epoch")
    assert index.count() == len(corpus_rows) + len(new_rows)

    new_feats = index.filter(F.col("doc_id") >= 100)
    inc = {
        (r.doc_a, r.doc_b)
        for r in image_near_dup_incremental(new_feats, index, max_hamming=8).collect()
    }
    assert inc == {(0, 100), (1, 101), (2, 102)}

    # equivalence: batch pairs restricted to new-involving rows
    batch = {
        (r.doc_a, r.doc_b)
        for r in image_near_dup(index, max_hamming=8).collect()
        if r.doc_a >= 100 or r.doc_b >= 100
    }
    assert inc == batch


def test_media_curation_end_to_end(spark, tmp_path):
    rng = np.random.default_rng(11)
    rows = []
    originals = {}
    for i in range(20):
        img = rand_img(24, 24)
        originals[i] = img
        rows.append((i, bytearray(encode_bmp(img))))
    # near-dup copies of the first five (ids 100..104)
    for i in range(5):
        jit = np.clip(
            originals[i].astype(np.int16) + rng.integers(-3, 4, originals[i].shape),
            0,
            255,
        ).astype(np.uint8)
        rows.append((100 + i, bytearray(encode_png(jit))))
    # corrupt payloads that must be gated out, not crash anything
    rows.append((200, bytearray(b"definitely not an image")))
    rows.append((201, bytearray(encode_bmp(rand_img(8, 8))[:-30])))

    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = decode_pixel_features(df)

    # quality gate: decodable + sane dimensions
    good = feats.filter(
        F.col("pixel_md5").isNotNull() & (F.col("n_pixels") >= 64)
    )
    assert good.count() == 25  # 20 originals + 5 near-dups; corrupt gated

    # perceptual dedup: keep the lowest doc_id of each near-dup pair
    pairs = image_near_dup(good, max_hamming=8)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = good.join(drop, "doc_id", "left_anti")
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert kept_ids == set(range(20))  # every jittered copy dropped, originals kept

    # land on the dataset sink shape and read back
    out = str(tmp_path / "curated")
    kept.select("doc_id", "format", "width", "height", "mean_luma", "ahash64").write.partitionBy(
        "format"
    ).parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 20
    assert {r.format for r in back.select("format").distinct().collect()} == {"bmp"}
