"""Audio tier: real WAV/PCM decode, features, window sampling."""

from __future__ import annotations

import struct

import numpy as np

from cc_pyspark_spark.operators.audio import (
    audio_features,
    audio_features_batch,
    decode_pcm,
    parse_wav_header,
    sample_audio_windows,
)


def make_wav(samples, rate=8000, channels=1, bits=16, extra_chunk=None):
    """Byte-build a RIFF/WAVE PCM file from a list of int samples."""
    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes((s + 128) & 0xFF for s in samples)
    fmt = struct.pack(
        "<HHIIHH",
        1,
        channels,
        rate,
        rate * channels * bits // 8,
        channels * bits // 8,
        bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        cid, body = extra_chunk
        chunks += cid + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_wav_header_walks_chunks():
    wav = make_wav([0, 100, -100], rate=16000, extra_chunk=(b"LIST", b"junk!"))
    hdr = parse_wav_header(wav)
    assert hdr["audio_format"] == 1
    assert hdr["channels"] == 1
    assert hdr["sample_rate"] == 16000
    assert hdr["bits_per_sample"] == 16
    assert hdr["data_len"] == 6
    assert parse_wav_header(b"RIFFxxxxNOPE" + b"\x00" * 40) is None
    assert parse_wav_header(b"\x00" * 50) is None


def test_decode_pcm_int16_exact_roundtrip():
    samples = [0, 1, -1, 32767, -32768, 12345]
    frames, rate = decode_pcm(make_wav(samples))
    assert rate == 8000
    assert frames.shape == (6, 1)
    assert frames[:, 0].tolist() == samples


def test_decode_pcm_8bit_unsigned_centering():
    frames, _ = decode_pcm(make_wav([-128, 0, 127], bits=8))
    assert frames[:, 0].tolist() == [-128, 0, 127]


def test_decode_pcm_stereo_interleaving():
    # interleaved L R L R
    wav = make_wav([10, -20, 30, -40], channels=2)
    frames, _ = decode_pcm(wav)
    assert frames.shape == (2, 2)
    assert frames.tolist() == [[10, -20], [30, -40]]


def test_decode_pcm_rejects_non_pcm_and_truncated():
    wav = bytearray(make_wav([1, 2, 3]))
    wav[20] = 3  # audio_format = IEEE float
    assert decode_pcm(bytes(wav)) is None
    assert decode_pcm(b"ID3\x03" + b"\x00" * 60) is None  # mp3-ish


def test_audio_features_integer_math():
    import pandas as pd

    # square-ish wave: +1000 x2, -1000 x2, repeated
    samples = ([1000, 1000, -1000, -1000] * 4)[:-1]
    out = audio_features_batch(pd.Series([make_wav(samples, rate=1000)]))
    r = out.iloc[0]
    assert r["n_frames"] == 15
    assert r["duration_ms"] == 15
    assert r["peak"] == 1000
    assert r["zero_crossings"] == 7
    assert r["energy"] == 15 * 1000 * 1000


def test_audio_features_spark_end_to_end(spark):
    blobs = [
        (1, make_wav([0, 500, -500, 500])),
        (2, make_wav([-128, 127], bits=8)),
        (3, b"OggS" + b"\x00" * 60),  # compressed: degrades, no abort
    ]
    df = spark.createDataFrame(blobs, "blob_id long, blob binary").repartition(2)
    out = {r["blob_id"]: r for r in audio_features(df).collect()}
    assert out[1]["n_frames"] == 4 and out[1]["peak"] == 500
    assert out[2]["n_frames"] == 2 and out[2]["peak"] == 128
    assert out[3]["n_frames"] == 0 and out[3]["sample_rate"] is None


def test_sample_audio_windows_expansion(spark):
    rng = np.random.default_rng(7)
    samples = rng.integers(-3000, 3000, size=1000).tolist()
    df = spark.createDataFrame(
        [(1, make_wav(samples)), (2, b"junk")], "blob_id long, blob binary"
    )
    rows = sorted(
        sample_audio_windows(df, window_frames=256, max_windows=16).collect(),
        key=lambda r: (r["blob_id"], r["window_idx"]),
    )
    assert [r["blob_id"] for r in rows] == [1, 1, 1]  # 1000 // 256 = 3 full
    arr = np.array(samples)
    for i, r in enumerate(rows):
        w = arr[i * 256 : (i + 1) * 256]
        assert r["peak"] == int(np.abs(w).max())
        assert r["energy"] == int((w.astype(np.int64) ** 2).sum())
