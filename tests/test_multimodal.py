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
