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
