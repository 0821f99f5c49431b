"""Pin the rows-only multimodal_audio_features query via Python replay."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np

from cc_pyspark_spark.operators.audio import decode_pcm
from cc_pyspark_spark.plans import QUERIES
from cc_pyspark_spark.plans.multimodal import _WAV_HEADER_HEX


def test_audio_query_matches_python_replay(spark):
    sf = "/root/testdata/sf0.001"
    out = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_audio_features"].spark(spark, sf).collect()
    }
    con = duckdb.connect()
    docs = con.sql(f"SELECT doc_id, text FROM '{sf}/documents.parquet'").fetchall()
    assert len(out) == len(docs)
    header = bytes.fromhex(_WAV_HEADER_HEX)
    for doc_id, text in docs[:50]:
        raw = text.encode()
        blob = header + hashlib.md5(raw).digest() + hashlib.md5(raw + b"x").digest()
        frames, rate = decode_pcm(blob)
        first = frames[:, 0]
        signs = np.sign(first)
        nz = signs[signs != 0]
        r = out[doc_id]
        assert r["sample_rate"] == rate == 8000
        assert r["n_frames"] == 16
        assert r["peak"] == int(np.abs(frames).max())
        assert r["zero_crossings"] == (
            int((nz[1:] != nz[:-1]).sum()) if nz.size > 1 else 0
        )
        assert r["energy"] == int((frames.astype(np.int64) ** 2).sum())
