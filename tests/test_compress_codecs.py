"""Object-stream compression: pure-Python LZ4 + Snappy codecs and the
mixed-codec ingest/egress routes (io/compress.py, sources/storage.py
_read_lines, pipeline K1 python-codec finalization).

Evidence strategy (same as operators/flac.py, OPERATORS.md honesty
rule): both formats are fully structural — no empirical spec tables —
so hand-assembled spec vectors + externally-published checksum anchors
(xxh32(b"abc"), crc32c(b"123456789")) + encoder/decoder twin
round-trips + never-raise fuzz are the full proof surface available
without native libs.
"""

from __future__ import annotations

import gzip
import json
import lzma
import os
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etly_spark.io import compress as iocompress
from etly_spark.operators import lz4, snappy, zstd

# ------------------------------------------------------------ checksums


def test_xxh32_known_answers():
    # published vectors (xxHash reference implementation test suite)
    assert lz4.xxh32(b"") == 0x02CC5D05
    assert lz4.xxh32(b"abc") == 0x32D153FF


def test_crc32c_check_value():
    # the CRC catalogue's standard check input
    assert snappy.crc32c(b"123456789") == 0xE3069283
    assert snappy.crc32c(b"") == 0


# ------------------------------------------------------------ lz4 block


def test_lz4_hand_assembled_spec_vector():
    # token 0x44: 4 literals, match len 4+4=8; offset 4 → periodic copy
    blk = bytes([0x44]) + b"abcd" + bytes([0x04, 0x00]) + bytes([0x50]) + b"vwxyz"
    assert bytes(lz4.decompress_block(blk)) == b"abcdabcdabcd" + b"vwxyz"


def test_lz4_lsic_length_extension():
    # literal length 15 + 255 + 3 = 273 via the LSIC extension bytes
    data = bytes(range(256)) * 2
    lit = data[:273]
    blk = bytes([0xF0, 255, 3]) + lit
    assert bytes(lz4.decompress_block(blk)) == lit


def test_lz4_rejects_zero_and_oob_offset():
    assert lz4.decompress_block(bytes([0x44]) + b"abcd" + bytes([0x00, 0x00])) is None
    assert lz4.decompress_block(bytes([0x44]) + b"abcd" + bytes([0x09, 0x00])) is None


def test_lz4_output_cap_blocks_bombs():
    # 4-byte seed then a huge RLE match must stop at max_bytes, not OOM
    blk = bytes([0x4F]) + b"aaaa" + bytes([0x01, 0x00]) + bytes([255] * 200) + bytes([200])
    assert lz4.decompress_block(blk, max_bytes=10_000) is None


def test_lz4_frame_roundtrip_shapes():
    random.seed(3)
    for kind in range(4):
        for n in (0, 1, 100, 70_000):
            data = {
                0: os.urandom(n),
                1: (b"json line 42\n" * (n // 13 + 1))[:n],
                2: b"\x00" * n,
                3: bytes(random.choice(b"ab") for _ in range(n)),
            }[kind]
            for bc in (False, True):
                f = lz4.compress_frame(data, block_max=1 << 16, block_checksum=bc)
                assert lz4.decompress_frame(f) == data


def test_lz4_frame_multiframe_and_skippable():
    two = (
        lz4.compress_frame(b"hello ")
        + struct.pack("<I", 0x184D2A50)
        + struct.pack("<I", 3)
        + b"pad"
        + lz4.compress_frame(b"world")
    )
    assert lz4.decompress_frame(two) == b"hello world"


def test_lz4_frame_linked_blocks_cross_window():
    """Hand-built block-LINKED frame (B.Indep=0): block 2's match
    reaches back into block 1's output — the running-buffer decode
    contract."""
    flg = (0b01 << 6) | 0  # version, linked, no checksums/size
    bd = 4 << 4
    desc = bytes([flg, bd])
    hdr = struct.pack("<I", 0x184D2204) + desc + bytes([(lz4.xxh32(desc) >> 8) & 0xFF])
    b1 = bytes([0x60]) + b"abcdef"  # 6 literals, no match
    # block 2: 0 literals, match offset 6 len 6 → repeats "abcdef"
    b2 = bytes([0x02, 0x06, 0x00]) + bytes([0x10]) + b"Z"
    frame = hdr
    for body in (b1, b2):
        frame += struct.pack("<I", len(body)) + body
    frame += b"\x00\x00\x00\x00"
    out = lz4.decompress_frame(frame)
    assert out is not None and out.startswith(b"abcdefabcdef")


def test_lz4_frame_bad_content_checksum_rejected():
    f = bytearray(lz4.compress_frame(b"payload bytes here"))
    f[-1] ^= 0xFF
    assert lz4.decompress_frame(bytes(f)) is None


def test_lz4_frame_dict_id_rejected():
    flg = (0b01 << 6) | (1 << 5) | 1  # version, indep, DictID
    desc = bytes([flg, 4 << 4]) + struct.pack("<I", 77)
    hdr = struct.pack("<I", 0x184D2204) + desc + bytes([(lz4.xxh32(desc) >> 8) & 0xFF])
    assert lz4.decompress_frame(hdr + b"\x00\x00\x00\x00") is None


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lz4_any_input_roundtrips(data):
    assert bytes(lz4.decompress_block(lz4.compress_block(data))) == data
    assert lz4.decompress_frame(lz4.compress_frame(data)) == data


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_lz4_decode_never_raises_on_garbage(data):
    lz4.decompress_block(data, max_bytes=1 << 20)
    lz4.decompress_frame(struct.pack("<I", 0x184D2204) + data, max_bytes=1 << 20)


def test_lz4_truncation_safe():
    f = lz4.compress_frame(b"the quick brown fox " * 200)
    for cut in range(0, len(f), 7):
        assert lz4.decompress_frame(f[:cut]) in (None,)  # prefix never valid


# --------------------------------------------------------------- snappy


def test_snappy_hand_assembled_vectors():
    # ulen=11; literal 'snappy' (tag (6-1)<<2); copy-1 len 5 offset 6
    hand = bytes([0x0B, 0x14]) + b"snappy" + bytes([0x05, 0x06])
    assert snappy.decompress_raw(hand) == b"snappysnapp"
    # copy-2: 16-bit offset form
    hand2 = bytes([0x08, 0x0C]) + b"abcd" + bytes([((4 - 1) << 2) | 2, 0x04, 0x00])
    assert snappy.decompress_raw(hand2) == b"abcdabcd"


def test_snappy_rejects_bad_streams():
    assert snappy.decompress_raw(b"") is None
    # declared length ≠ produced length
    assert snappy.decompress_raw(bytes([0x05, 0x14]) + b"snappy"[:6]) is None
    # zero offset
    assert snappy.decompress_raw(bytes([0x08, 0x0C]) + b"abcd" + bytes([0x0E, 0, 0])) is None
    # declared-length bomb is rejected before allocation
    assert snappy.decompress_raw(b"\xff\xff\xff\xff\x7f" + b"x", max_bytes=1 << 20) is None


def test_snappy_framed_crc_enforced():
    f = bytearray(snappy.compress_framed(b"payload" * 100))
    f[len(snappy._STREAM_ID) + 4] ^= 0x01  # flip a CRC byte
    assert snappy.decompress_framed(bytes(f)) is None


def test_snappy_framed_concatenation_and_padding():
    a = snappy.compress_framed(b"hello ")
    b = snappy.compress_framed(b"world")
    pad = bytes([0xFE, 3, 0, 0]) + b"xyz"  # skippable padding chunk
    assert snappy.decompress_framed(a + pad + b) == b"hello world"


def test_snappy_framed_reserved_unskippable_rejected():
    bad = snappy._STREAM_ID + bytes([0x02, 1, 0, 0, 0])
    assert snappy.decompress_framed(bad) is None


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_snappy_any_input_roundtrips(data):
    assert snappy.decompress_raw(snappy.compress_raw(data)) == data
    assert snappy.decompress_framed(snappy.compress_framed(data)) == data


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_snappy_decode_never_raises_on_garbage(data):
    snappy.decompress_raw(data, max_bytes=1 << 20)
    snappy.decompress_framed(snappy._STREAM_ID + data, max_bytes=1 << 20)


def test_snappy_long_match_chunking():
    data = b"abcdefgh" * 5000  # 40k: forces >64-length matches chunked to ops
    c = snappy.compress_raw(data)
    assert len(c) < len(data) // 10
    assert snappy.decompress_raw(c) == data


# ----------------------------------------------------------- registry


def test_registry_routing():
    assert iocompress.jvm_line_readable("x/a.jsonl")
    assert iocompress.jvm_line_readable("x/a.jsonl.gz")
    assert iocompress.jvm_line_readable("x/a.jsonl.bz2")
    assert not iocompress.jvm_line_readable("x/a.jsonl.xz")
    assert not iocompress.jvm_line_readable("x/a.jsonl.lz4")
    assert not iocompress.jvm_line_readable("x/a.jsonl.sz")
    assert not iocompress.jvm_line_readable("x/a.jsonl.snappy")
    assert not iocompress.jvm_line_readable("x/a.jsonl.zst")
    assert not iocompress.is_gated("x/a.jsonl.zst")  # libzstd present here


def test_zstd_gate_raises_when_no_libzstd(monkeypatch):
    """On a host without libzstd the honest refusal stays (the codec is
    never reimplemented from memory) — simulated by blanking the
    loaded-library cache."""
    monkeypatch.setattr(zstd, "_LIB", None)
    monkeypatch.setattr(zstd, "_TRIED", True)
    assert not zstd.available()
    with pytest.raises(NotImplementedError, match="zstd.*gated|gated.*zstd"):
        iocompress.decompress_object(b"\x28\xb5\x2f\xfd", "x/a.jsonl.zst")
    assert iocompress.is_gated("x/a.jsonl.zst")


def test_zstd_real_library_round_trip_and_strictness():
    """This container ships libzstd — the ctypes binding must round-trip
    (including multi-frame concatenation, the sink's per-part-member
    finalization shape) and raise ValueError on every corrupt shape so
    fault isolation attributes poisoned .zst files."""
    assert zstd.available(), "container libzstd expected"
    data = b'{"k":1}\n' * 5000
    enc = zstd.compress(data)
    assert len(enc) < len(data) // 10
    assert zstd.decompress(enc) == data
    assert zstd.decompress(enc + zstd.compress(b"tail")) == data + b"tail"
    for bad in (b"", b"\x28\xb5\x2f\xfd", enc[:-3], b"garbage", enc + b"junk"):
        with pytest.raises(ValueError):
            zstd.decompress(bad)


def test_zstd_drain_boundary_truncation_message():
    """ADVICE r10 pin: a frame whose decoded size lands exactly on the
    128 KiB output-buffer boundary, truncated mid-frame, must surface
    the 'truncated frame' diagnostic — the drain branch's follow-up
    call with empty input breaks out (outb.pos < chunk) to the final
    ret!=0 raise, it must NOT fall into 'no progress (corrupt
    stream)'. Covers 1/2/4-buffer decoded sizes and off-boundary."""
    assert zstd.available(), "container libzstd expected"
    for n in (1 << 17, (1 << 17) * 2, (1 << 17) * 4, (1 << 17) + 1):
        enc = zstd.compress(b"a" * n, level=19)
        for cut in (1, 2, 3):
            with pytest.raises(ValueError, match="truncated frame"):
                zstd.decompress(enc[:-cut])


def test_zstd_truncation_after_exact_boundary_complete_frame():
    """ADVICE r11 item 2 pin, the exact adversarial alignment: a
    COMPLETE first frame whose decoded size exactly fills the 128 KiB
    output buffer (so the input-exhausted call CAN end with
    outb.pos == chunk and ret != 0 from the started second frame),
    followed by a truncated second frame. The drain branch's follow-up
    call flushes nothing and must reach 'truncated frame' — never loop
    forever, never 'no progress'. Also: the same full-buffer frame with
    NO trailing fragment must decode cleanly (no false truncation)."""
    assert zstd.available(), "container libzstd expected"
    for n in (1 << 17, (1 << 17) * 2):
        full = bytes(range(256)) * (n // 256)  # exactly n bytes
        f1 = zstd.compress(full)
        assert zstd.decompress(f1) == full  # clean exact-boundary decode
        f2 = zstd.compress(b"second frame payload " * 64)
        assert zstd.decompress(f1 + f2).startswith(full)
        for cut_to in (4, 8, len(f2) - 1):
            with pytest.raises(ValueError, match="truncated frame"):
                zstd.decompress(f1 + f2[:cut_to])


@pytest.mark.skipif(not os.path.exists("/root/miniconda/bin/zstd"),
                    reason="no zstd CLI for external validation")
def test_zstd_external_cli_interop(tmp_path):
    """External validation both directions against the real zstd CLI:
    frames we write decode with the reference tool, frames the
    reference tool writes decode with our binding."""
    import subprocess

    data = b"interop payload \xf0\x9f\x8c\x8d " * 2000
    ours = tmp_path / "ours.zst"
    ours.write_bytes(zstd.compress(data))
    out = subprocess.run(["/root/miniconda/bin/zstd", "-d", "-c", str(ours)],
                         capture_output=True)
    assert out.returncode == 0 and out.stdout == data
    raw = tmp_path / "theirs.txt"
    raw.write_bytes(data)
    subprocess.run(["/root/miniconda/bin/zstd", "-q", "-f", str(raw)], check=True)
    assert zstd.decompress((tmp_path / "theirs.txt.zst").read_bytes()) == data


def test_decompress_object_all_codecs():
    payload = b'{"k":1}\n{"k":2}\n'
    cases = {
        "a.jsonl": payload,
        "a.jsonl.gz": gzip.compress(payload),
        "a.jsonl.xz": lzma.compress(payload),
        "a.jsonl.lz4": lz4.compress_frame(payload),
        "a.jsonl.sz": snappy.compress_framed(payload),
        "a.jsonl.zst": zstd.compress(payload),
    }
    for url, data in cases.items():
        assert iocompress.decompress_object(data, url) == payload


# ------------------------------------------------- spark ingest / egress


def _write_corpus(d, payload: bytes) -> list[str]:
    files = {
        "a.jsonl": payload,
        "b.jsonl.gz": gzip.compress(payload),
        "c.jsonl.xz": lzma.compress(payload),
        "d.jsonl.lz4": lz4.compress_frame(payload),
        "e.jsonl.sz": snappy.compress_framed(payload),
        "f.jsonl.zst": zstd.compress(payload),
    }
    out = []
    for name, data in files.items():
        p = d / name
        p.write_bytes(data)
        out.append(f"file://{p}")
    return sorted(out)


def test_read_lines_mixed_codecs(spark, tmp_path):
    from etly_spark.sources.storage import FILE, RAW, _read_lines

    lines = [json.dumps({"i": i}) for i in range(40)]
    payload = ("\n".join(lines) + "\n").encode()
    paths = _write_corpus(tmp_path, payload)
    df = _read_lines(spark, paths)
    rows = df.collect()
    assert len(rows) == 40 * 6
    by_file: dict[str, list[str]] = {}
    for r in rows:
        assert r[FILE].startswith("file:///"), r[FILE]  # normalized URL shape
        by_file.setdefault(r[FILE].rsplit("/", 1)[-1], []).append(r[RAW])
    assert set(by_file) == {"a.jsonl", "b.jsonl.gz", "c.jsonl.xz", "d.jsonl.lz4", "e.jsonl.sz", "f.jsonl.zst"}
    for name, vals in by_file.items():
        assert sorted(vals) == sorted(lines), name


def test_probe_object_attributes_corrupt_lz4(tmp_path):
    from etly_spark.sources.storage import probe_object

    good = tmp_path / "ok.jsonl.lz4"
    good.write_bytes(lz4.compress_frame(b'{"a":1}\n'))
    assert probe_object(f"file://{good}") is None
    bad = tmp_path / "bad.jsonl.lz4"
    bad.write_bytes(lz4.compress_frame(b'{"a":1}\n')[:-3])
    err = probe_object(f"file://{bad}")
    assert err is not None and "lz4" in err


def test_pipeline_lz4_source_end_to_end(spark, tmp_path):
    """Full transfer over a .lz4 source object — the reference's
    gzip-ingest path (transfer_object_service.go:89-109) generalized
    to the python-route codecs."""
    import tests.test_pipeline_e2e  # noqa: F401 — registers test.Log1 schemas

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    body = b'{"Id":7,"Name":"lzfour","Type":"z"}\n{"Id":8,"Name":"x","Type":"y"}\n'
    (src / "data.log.lz4").write_bytes(lz4.compress_frame(body))

    t = Transfer(
        name="lz4-smoke",
        source=Source(name=str(src), data_type="test.Log1"),
        target=Target(name=str(tmp_path / "out" / "<file>.out")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="test.Log1ToLog2",
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    assert result.progress.record_processed == 2
    out = tmp_path / "out" / "data.log.lz4.out"
    got = {json.loads(ln)["Key"] for ln in out.read_text().splitlines()}
    assert got == {7, 8}


@pytest.mark.parametrize("comp,reader", [
    ("lz4", lambda b: lz4.decompress_frame(b)),
    ("snappy", lambda b: snappy.decompress_framed(b)),
    ("xz", lambda b: lzma.decompress(b)),
    ("zstd", lambda b: zstd.decompress(b)),
])
def test_pipeline_python_codec_sink(spark, tmp_path, comp, reader):
    """K1 sink with a python-route codec: staging stays plain, the
    finalization byte-job compresses per-part members — output is a
    spec-valid stream of the target format."""
    import tests.test_pipeline_e2e  # noqa: F401

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "d.log").write_text('{"Id":1,"Name":"n","Type":"t"}\n{"Id":2,"Name":"m","Type":"u"}\n')
    t = Transfer(
        name=f"sink-{comp}",
        source=Source(name=str(src), data_type="test.Log1"),
        target=Target(name=str(tmp_path / "out" / f"<file>.{comp}.out"), compression=comp),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="test.Log1ToLog2",
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    out = tmp_path / "out" / f"d.log.{comp}.out"
    data = reader(out.read_bytes())
    assert data is not None
    got = {json.loads(ln)["Key"] for ln in data.decode().splitlines()}
    assert got == {1, 2}


# ------------------------------------------------------------ archives


def _make_zip(members: dict[str, bytes]) -> bytes:
    import io as _io
    import zipfile

    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in members.items():
            z.writestr(name, data)
    return buf.getvalue()


def _make_tar(members: dict[str, bytes], mode: str = "w:gz") -> bytes:
    import io as _io
    import tarfile

    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
    return buf.getvalue()


def test_read_lines_archive_members(spark, tmp_path):
    """zip + tar.gz expand per member (nested member codecs included);
    FILE keeps the ARCHIVE url — the ledger contract."""
    from etly_spark.sources.storage import FILE, RAW, _read_lines

    lines = [json.dumps({"i": i}) for i in range(10)]
    payload = ("\n".join(lines) + "\n").encode()
    z = tmp_path / "a.zip"
    z.write_bytes(_make_zip({
        "one.jsonl": payload,
        "sub/two.jsonl.gz": gzip.compress(payload),
        "three.jsonl.lz4": lz4.compress_frame(payload),
        "__MACOSX/._one.jsonl": b"junk",      # hidden: skipped
        ".DS_Store": b"junk",
    }))
    tgz = tmp_path / "b.tar.gz"
    tgz.write_bytes(_make_tar({"x.jsonl": payload, "y.jsonl.xz": lzma.compress(payload)}))
    df = _read_lines(spark, [f"file://{z}", f"file://{tgz}"])
    rows = df.collect()
    by_file: dict[str, list[str]] = {}
    for r in rows:
        by_file.setdefault(r[FILE].rsplit("/", 1)[-1], []).append(r[RAW])
    assert set(by_file) == {"a.zip", "b.tar.gz"}
    assert sorted(by_file["a.zip"]) == sorted(lines * 3)
    assert sorted(by_file["b.tar.gz"]) == sorted(lines * 2)


def test_probe_object_attributes_corrupt_archive(tmp_path):
    from etly_spark.sources.storage import probe_object

    ok = tmp_path / "ok.zip"
    ok.write_bytes(_make_zip({"a.jsonl": b'{"x":1}\n'}))
    assert probe_object(f"file://{ok}") is None
    # valid zip central directory, torn member codec
    badm = tmp_path / "badmember.zip"
    badm.write_bytes(_make_zip({"a.jsonl.lz4": lz4.compress_frame(b'{"x":1}\n')[:-3]}))
    assert probe_object(f"file://{badm}") is not None
    # torn container
    badz = tmp_path / "torn.tar.gz"
    badz.write_bytes(_make_tar({"a.jsonl": b'{"x":1}\n' * 100})[:-40])
    assert probe_object(f"file://{badz}") is not None


def test_pipeline_zip_source_end_to_end(spark, tmp_path):
    """A .zip of ndjson members ingests as ONE ledger object."""
    import tests.test_pipeline_e2e  # noqa: F401 — registers test.Log1 schemas

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, NOOP, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "batch.zip").write_bytes(_make_zip({
        "p1.jsonl": b'{"Id":1,"Name":"a","Type":"t"}\n',
        "p2.jsonl.gz": gzip.compress(b'{"Id":2,"Name":"b","Type":"u"}\n'),
    }))
    t = Transfer(
        name="zip-smoke",
        source=Source(name=str(src), data_type="test.Log1"),
        target=Target(name=str(tmp_path / "out" / "<file>.out")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="test.Log1ToLog2",
        base_dir=str(tmp_path),
    )
    svc = TransferService(spark)
    result = svc.run(t)
    assert result.status == DONE, result.error
    assert result.progress.record_processed == 2
    out = tmp_path / "out" / "batch.zip.out"
    got = {json.loads(ln)["Key"] for ln in out.read_text().splitlines()}
    assert got == {1, 2}
    assert svc.run(t).status == NOOP


def test_pipeline_deflate_multipart_roll_single_stream(spark, tmp_path):
    """Review find: raw zlib streams do NOT concatenate — a multi-part
    deflate roll must come out as ONE stream, and every record must
    survive read-back (per-part-then-concat silently drops all but the
    first part)."""
    import zlib

    import tests.test_pipeline_e2e  # noqa: F401

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    # many input files -> many staged parts for the single target key
    for i in range(6):
        (src / f"d{i}.log").write_text(
            f'{{"Id":{i},"Name":"n{i}","Type":"t"}}\n'
        )
    t = Transfer(
        name="deflate-roll",
        source=Source(name=str(src), data_type="test.Log1"),
        target=Target(name=str(tmp_path / "out" / "all.deflate"),
                      compression="deflate"),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="test.Log1ToLog2",
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    data = zlib.decompress((tmp_path / "out" / "all.deflate").read_bytes())
    got = {json.loads(ln)["Key"] for ln in data.decode().splitlines()}
    assert got == set(range(6))


def test_source_compression_without_extension(spark, tmp_path):
    """Reference parity (transfer_object_service.go:97-103): when
    Source.Compression says gzip, extension-less objects decompress by
    CONFIG, not extension — previously these bytes were read raw as
    garbage lines. Extension-carrying files in the same source keep
    extension routing."""
    import tests.test_pipeline_e2e  # noqa: F401

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    # gzip bytes, but no .gz in the name (common: hashed object names)
    (src / "part-000").write_bytes(
        gzip.compress(b'{"Id":1,"Name":"a","Type":"t"}\n')
    )
    (src / "part-001.gz").write_bytes(
        gzip.compress(b'{"Id":2,"Name":"b","Type":"u"}\n')
    )
    t = Transfer(
        name="forced-gzip",
        source=Source(name=str(src), data_type="test.Log1", compression="gzip"),
        target=Target(name=str(tmp_path / "out" / "<file>.out")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="test.Log1ToLog2",
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    assert result.progress.record_processed == 2
    got = set()
    for name in ("part-000.out", "part-001.gz.out"):
        got |= {json.loads(ln)["Key"]
                for ln in (tmp_path / "out" / name).read_text().splitlines()}
    assert got == {1, 2}


def test_forced_codec_corruption_is_fault_isolated(spark, tmp_path):
    """Review find: a corrupt extension-less object under
    Source.Compression must be attributed by the probe (which now
    speaks the forced codec) - error ledger entry, healthy files land,
    second run NOOPs."""
    import tests.test_pipeline_e2e  # noqa: F401

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.meta import Meta
    from etly_spark.pipeline import DONE, NOOP, TransferService
    from etly_spark.sources.storage import probe_object

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "part-good").write_bytes(
        gzip.compress(b'{"Id":1,"Name":"a","Type":"t"}\n')
    )
    whole = gzip.compress(b'{"Id":9,"Name":"x","Type":"t"}\n' * 200)
    (src / "part-bad").write_bytes(whole[: len(whole) // 2])

    assert probe_object(f"file://{src / 'part-bad'}", ".gz") is not None
    assert probe_object(f"file://{src / 'part-good'}", ".gz") is None
    # without the forced ext the same bytes read as "healthy" raw
    assert probe_object(f"file://{src / 'part-bad'}") is None

    t = Transfer(
        name="forced-gzip-fault",
        source=Source(name=str(src), data_type="test.Log1", compression="gzip"),
        target=Target(name=str(tmp_path / "out" / "<file>.out")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="test.Log1ToLog2",
        base_dir=str(tmp_path),
    )
    svc = TransferService(spark)
    result = svc.run(t)
    assert result.status == DONE, result.error
    assert (tmp_path / "out" / "part-good.out").exists()
    assert not (tmp_path / "out" / "part-bad.out").exists()
    meta = Meta.load(str(tmp_path / "out" / "meta.json"))
    assert any("part-bad" in e["error"] for e in meta.errors)
    assert svc.run(t).status == NOOP


def test_csv_source_rejects_compression(spark, tmp_path):
    """Review find: a codec Spark's extension-routed csv/parquet
    readers would silently ignore must be refused loudly."""
    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "d.csv").write_text("a,b\n1,2\n")
    t = Transfer(
        name="csv-comp",
        source=Source(name=str(src), data_format="csv", compression="gzip"),
        target=Target(name=str(tmp_path / "out" / "<file>.out")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.error and "not supported for format" in result.error


def test_zstd_mutation_fuzz_never_crashes():
    """Bounded mutation fuzz over the ctypes boundary: every corrupt
    shape must come back as ValueError (fault attribution), never a
    segfault or a foreign exception — the binding only ever hands
    libzstd library-reported buffer sizes, and this pins it."""
    import random

    if not zstd.available():
        pytest.skip("no libzstd")
    rng = random.Random(42)
    base = zstd.compress(b'{"k":%d}\n' % 7 * 500)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        cut = rng.randrange(0, len(b))
        for payload in (bytes(b), bytes(b[:cut])):
            try:
                zstd.decompress(payload)
            except ValueError:
                pass
    # pure garbage
    for n in (1, 7, 64, 4096):
        try:
            zstd.decompress(rng.randbytes(n))
        except ValueError:
            pass
