"""Media-codec scale stress: REAL pixel decode throughput + perceptual
near-dup recall/containment at sf0.1 scale.

Two measurements:
1. Decode throughput — 20x the sf0.1 doc count of valid binary PPM
   containers decoded by the pure-numpy codec through the Arrow
   mapInPandas operator (the plan a 100 TB image corpus would run: a
   pure map, no shuffle; throughput scales with executor count).
2. Image near-dup — a diverse seeded-random image per sf0.1 document
   plus a jittered copy (+-4 per byte) fed to image_near_dup: the band
   join must recover ~every (original, jitter) pair WITHOUT comparing
   all pairs, with no false positives among the distinct images.
3. Audio/video — 2k synthesized WAV clips and Y4M videos (real
   containers), each with a re-levelled+noised copy: decode
   throughput + fingerprint near-dup recall per modality.

Usage: python tools/stress_media.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.operators.multimodal import (  # noqa: E402
    decode_audio_features,
    decode_pixel_features,
    decode_video_features,
    image_near_dup,
    synthesize_ppm_payload,
    video_near_dup,
)
from etly_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-media")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    # -- decode throughput over real PPM containers (32x32 = 3 KiB
    # raster), 20x the document count so Python-worker spin-up and
    # Arrow init amortize (at 5k images the wall clock measures worker
    # startup, not the codec). 64 partitions model the many-file layout
    # a real media corpus has.
    n_images = 20 * n_docs
    ids = spark.range(n_images).select(F.col("id").alias("doc_id"), F.lit("x").alias("text"))
    ppm = synthesize_ppm_payload(
        ids.withColumn("text", F.repeat(F.lit("abcdefgh"), 384)).repartition(64),
        w=32,
        h=32,
    )
    payload_bytes = ppm.select(F.sum(F.octet_length("payload"))).first()[0]
    t0 = time.monotonic()
    feats = decode_pixel_features(ppm)
    n_ok = feats.filter(F.col("pixel_md5").isNotNull()).count()
    sec_decode = time.monotonic() - t0
    assert n_ok == n_images, (n_ok, n_images)

    # -- near-dup: a DIVERSE image corpus (seeded-random 32x32 RGB per
    # doc — text-derived rasters are degenerate for perceptual hashing:
    # space padding makes every image "gray block on white" and 2000
    # docs collapse to 13 distinct ahashes) + one jittered copy per
    # image (+-4 per byte: survives area-resampled hashing, far beyond
    # exact-dup detection).
    import pandas as pd

    def gen_images(batches):
        import numpy as np

        for pdf in batches:
            out_id, out_pl = [], []
            hdr = b"P6\n32 32\n255\n"
            for doc_id in pdf["doc_id"]:
                rng = np.random.default_rng(int(doc_id))
                arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                out_id.append(int(doc_id))
                out_pl.append(hdr + arr.tobytes())
                jit = np.clip(
                    arr.astype(np.int16) + rng.integers(-4, 5, arr.shape), 0, 255
                ).astype(np.uint8)
                out_id.append(int(doc_id) + 10_000_000)
                out_pl.append(hdr + jit.tobytes())
            yield pd.DataFrame({"doc_id": out_id, "payload": out_pl})

    corpus = docs.select("doc_id").mapInPandas(gen_images, "doc_id long, payload binary")

    t0 = time.monotonic()
    feats2 = decode_pixel_features(corpus)
    pairs = image_near_dup(feats2, max_hamming=8)
    planted = pairs.filter(F.col("doc_b") - F.col("doc_a") == 10_000_000)
    n_pairs = pairs.count()
    n_planted = planted.count()
    sec_neardup = time.monotonic() - t0

    # -- audio + video: decode throughput and near-dup recall on
    # synthesized real containers (WAV sines / Y4M brightness curves),
    # one re-levelled+noised copy per original
    def gen_av(batches):
        import struct

        import numpy as np

        def wav_bytes(samples, rate=8000):
            data = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
            body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data)
            return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

        def y4m_bytes(frames):
            n, h, w = frames.shape
            out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode())
            cpl = (w // 2) * (h // 2) * 2
            for f in frames:
                out += b"FRAME\n" + f.tobytes() + b"\x80" * cpl
            return bytes(out)

        rate = 8000
        n_samp = rate // 2
        for pdf in batches:
            ids, pls, kinds = [], [], []
            for doc_id in pdf["doc_id"]:
                r = np.random.default_rng(int(doc_id))
                # random-walk energy envelope over 65 fingerprint frames:
                # rise/fall bits are i.i.d. across clips, the entropy a
                # real recording's energy curve has (smooth synthetic
                # sines collapse every band bucket past the cap — the
                # same degeneracy text rasters showed for image hashing)
                env = np.abs(np.cumsum(r.normal(0, 1, 65))) + 0.1
                env /= env.max()
                envelope = np.repeat(env, n_samp // 65 + 1)[:n_samp]
                carrier = r.normal(0, 0.2, n_samp)
                wave = envelope * carrier
                dup_w = 0.7 * wave + r.normal(0, 0.002, wave.shape)
                curve = np.clip(120 + np.cumsum(r.normal(0, 8, 60)), 10, 245)
                vid = np.clip(
                    np.repeat(curve[:, None, None], 16 * 16, axis=1).reshape(60, 16, 16)
                    + r.normal(0, 1.5, (60, 16, 16)),
                    0, 255,
                ).astype(np.uint8)
                dup_v = np.clip(vid.astype(np.float64) * 0.85 + 8, 0, 255).astype(np.uint8)
                for off, payload, kind in (
                    (0, wav_bytes(wave), "audio"),
                    (1_000_000, wav_bytes(dup_w), "audio"),
                    (2_000_000, y4m_bytes(vid), "video"),
                    (3_000_000, y4m_bytes(dup_v), "video"),
                ):
                    ids.append(int(doc_id) + off)
                    pls.append(payload)
                    kinds.append(kind)
            yield pd.DataFrame({"doc_id": ids, "payload": pls, "kind": kinds})

    n_av = min(n_docs, 2000)
    av = docs.select("doc_id").limit(2000).repartition(16).mapInPandas(
        gen_av, "doc_id long, payload binary, kind string"
    )
    t0 = time.monotonic()
    afeat = decode_audio_features(av.filter(F.col("kind") == "audio"))
    a_ok = afeat.filter(F.col("afp64").isNotNull()).count()
    sec_audio = time.monotonic() - t0
    t0 = time.monotonic()
    vfeat = decode_video_features(av.filter(F.col("kind") == "video"))
    v_ok = vfeat.filter(F.col("vhash64").isNotNull()).count()
    sec_video = time.monotonic() - t0

    from etly_spark.operators.multimodal import audio_near_dup

    a_pairs = audio_near_dup(afeat).filter(F.col("doc_b") - F.col("doc_a") == 1_000_000)
    v_pairs = video_near_dup(vfeat).filter(F.col("doc_b") - F.col("doc_a") == 1_000_000)
    a_recall = a_pairs.count() / n_av
    v_recall = v_pairs.count() / n_av

    # -- compressed containers (r8): FLAC clips and MJPEG AVIs through
    # the SAME feature operators (magic-byte dispatchers) — the
    # entropy-codec throughput a real mixed-media corpus pays
    def gen_compressed(batches):
        import numpy as np

        from etly_spark.operators import codecs as _codecs
        from etly_spark.operators import flac as _flac

        for pdf in batches:
            ids, pls, kinds = [], [], []
            for doc_id in pdf["doc_id"]:
                r = np.random.default_rng(int(doc_id))
                wave = (
                    3000 * np.sin(np.arange(4000) / (10 + int(doc_id) % 40))
                    + r.integers(-50, 50, 4000)
                ).astype(np.int64)
                ids.append(int(doc_id))
                pls.append(_flac.encode_flac(wave, 8000, block_size=1024))
                kinds.append("flac")
                vid = np.clip(
                    np.add.outer(np.arange(12) * 4, np.zeros(32 * 32)).reshape(12, 32, 32)
                    + r.integers(0, 160, (12, 32, 32)) // 8 * 8,
                    0, 255,
                ).astype(np.uint8)
                ids.append(int(doc_id) + 1_000_000)
                pls.append(_codecs.encode_mjpeg_avi(vid, fps=10.0, quality=85))
                kinds.append("mjpeg")
            yield pd.DataFrame({"doc_id": ids, "payload": pls, "kind": kinds})

    n_comp = min(n_docs, 500)
    comp = docs.select("doc_id").limit(n_comp).repartition(16).mapInPandas(
        gen_compressed, "doc_id long, payload binary, kind string"
    )
    t0 = time.monotonic()
    ffeat = decode_audio_features(comp.filter(F.col("kind") == "flac"))
    f_ok = ffeat.filter(F.col("afp64").isNotNull()).count()
    sec_flac = time.monotonic() - t0
    t0 = time.monotonic()
    mfeat = decode_video_features(comp.filter(F.col("kind") == "mjpeg"))
    m_ok = mfeat.filter(F.col("vhash64").isNotNull()).count()
    sec_mjpeg = time.monotonic() - t0

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_images_decoded": n_images,
                "payload_mb": round(payload_bytes / 1e6, 1),
                "sec_decode": round(sec_decode, 2),
                "decode_mb_per_sec": round(payload_bytes / 1e6 / sec_decode, 1),
                "n_images_neardup_corpus": 2 * n_docs,
                "sec_neardup": round(sec_neardup, 2),
                "n_pairs": n_pairs,
                "n_planted_recovered": n_planted,
                "planted_recall": round(n_planted / n_docs, 4),
                "n_audio_clips": 2 * n_av,
                "sec_audio_decode": round(sec_audio, 2),
                "audio_ok": a_ok,
                "audio_planted_recall": round(a_recall, 4),
                "n_videos": 2 * n_av,
                "sec_video_decode": round(sec_video, 2),
                "video_ok": v_ok,
                "video_planted_recall": round(v_recall, 4),
                "n_flac": n_comp,
                "sec_flac_decode": round(sec_flac, 2),
                "flac_ok": f_ok,
                "n_mjpeg": n_comp,
                "sec_mjpeg_decode": round(sec_mjpeg, 2),
                "mjpeg_ok": m_ok,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
