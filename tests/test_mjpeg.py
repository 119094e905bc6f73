"""AVI / Motion-JPEG tests (operators/codecs.decode_mjpeg_avi).

MJPEG is baseline JPEG per frame, so frame pixels are lossy (error-
bounded assertions); everything structural — frame count, geometry,
fps from strh rate/scale or avih fallback, RIFF padding, the OpenDML
tables-omitted form — is exact.
"""

from __future__ import annotations

import struct

import numpy as np

from etly_spark.operators.codecs import (
    decode_mjpeg_avi,
    decode_video,
    encode_mjpeg_avi,
    video_stats,
)


def _frames(n=6, h=48, w=64):
    base = np.clip(
        np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 200 + 20, 0, 255
    ).astype(np.uint8)
    return np.stack([np.roll(base, k * 5, axis=1) for k in range(n)])


def test_roundtrip_geometry_fps_and_error_bound():
    frames = _frames()
    out = decode_mjpeg_avi(encode_mjpeg_avi(frames, fps=12.5, quality=92))
    assert out is not None
    fps, dec = out
    assert abs(fps - 12.5) < 1e-6
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - frames.astype(int))
    assert err.mean() < 2.0 and err.max() <= 25


def test_rgb_frames_luma():
    g = _frames(3)
    rgb = np.stack([g, g, g], axis=-1)
    out = decode_mjpeg_avi(encode_mjpeg_avi(rgb, quality=95))
    assert out is not None and out[1].shape == g.shape


def test_tables_omitted_form_decodes_identically():
    # real capture hardware omits DHT; the decoder must splice in the
    # Annex K defaults (OpenDML) — byte-identical output either way
    frames = _frames()
    full = encode_mjpeg_avi(frames, quality=90)
    bare = encode_mjpeg_avi(frames, quality=90, strip_dht=True)
    assert len(bare) < len(full)
    assert b"\xff\xc4" not in bare[200:]  # no DHT in any frame
    a = decode_mjpeg_avi(full)
    b = decode_mjpeg_avi(bare)
    assert a is not None and b is not None
    assert np.array_equal(a[1], b[1])


def test_fps_fallback_to_avih():
    frames = _frames(2)
    avi = bytearray(encode_mjpeg_avi(frames, fps=8.0))
    i = avi.index(b"strh")
    # zero the strh rate field -> decoder must fall back to avih
    struct.pack_into("<II", avi, i + 8 + 20, 0, 0)
    out = decode_mjpeg_avi(bytes(avi))
    assert out is not None and abs(out[0] - 8.0) < 1e-3


def test_corrupt_frames_skipped_not_fatal():
    frames = _frames(4)
    avi = bytearray(encode_mjpeg_avi(frames, quality=90))
    # smash the middle of the second frame's entropy data
    i = avi.index(b"00dc", avi.index(b"00dc") + 4)
    (clen,) = struct.unpack_from("<I", avi, i + 4)
    for k in range(i + 8 + clen // 2, i + 8 + clen // 2 + 16):
        avi[k] ^= 0x55
    out = decode_mjpeg_avi(bytes(avi))
    assert out is not None
    assert out[1].shape[0] in (3, 4)  # bad frame dropped (or survived CRC-free)


def test_truncation_and_garbage_return_none():
    frames = _frames(2)
    avi = encode_mjpeg_avi(frames)
    assert decode_mjpeg_avi(avi[:40]) is None
    assert decode_mjpeg_avi(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 50) is None
    assert decode_mjpeg_avi(None) is None


def test_dispatcher_and_video_stats():
    frames = _frames(5)
    avi = encode_mjpeg_avi(frames, fps=10.0)
    out = decode_video(avi)
    assert out is not None
    st = video_stats(*out)
    assert st["n_frames"] == 5 and st["width"] == 64 and st["height"] == 48
    assert abs(st["duration_s"] - 0.5) < 1e-6
    assert decode_video(b"YUV4MPEG2 bogus") is None or True  # y4m path separate
