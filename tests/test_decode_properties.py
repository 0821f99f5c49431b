"""Property-based round-trips for the pure-Python decoders (hypothesis):
encode a random image/audio payload with an independent byte-builder,
decode with the engine, and require exact pixel/sample recovery."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cc_pyspark_spark.operators.audio import decode_pcm
from cc_pyspark_spark.operators.multimodal import (
    decode_pixels,
    resize_nearest,
)

dims = st.integers(min_value=1, max_value=17)


def _bmp(arr: np.ndarray, top_down: bool) -> bytes:
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = arr if top_down else arr[::-1]
    raster = b"".join(
        bytes(int(v) for px in row for v in px[::-1]) + pad for row in rows
    )
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return header + dib + raster


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**31 - 1), top=st.booleans())
def test_bmp_pixels_roundtrip(w, h, seed, top):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = decode_pixels(_bmp(arr, top))
    assert got is not None and (got == arr).all()


@settings(max_examples=25, deadline=None)
@given(w=dims, h=dims, seed=st.integers(0, 2**31 - 1))
def test_ppm_pixels_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    blob = f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()
    got = decode_pixels(blob)
    assert got is not None and (got == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    w=dims, h=dims, w2=dims, h2=dims, seed=st.integers(0, 2**31 - 1)
)
def test_resize_identity_and_bounds(w, h, w2, h2, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_nearest(arr, w2, h2)
    assert out.shape == (h2, w2, 3)
    # every output pixel is a source pixel
    assert set(map(tuple, out.reshape(-1, 3))) <= set(
        map(tuple, arr.reshape(-1, 3))
    )
    # identity resize is exact
    assert (resize_nearest(arr, w, h) == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 200),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_pcm16_roundtrip(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n * ch, dtype=np.int64)
    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 28 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    frames, got_rate = decode_pcm(blob)
    assert got_rate == rate
    assert frames.shape == (n, ch)
    assert frames.reshape(-1).tolist() == samples.tolist()
