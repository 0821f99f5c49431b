"""Real PNG pixel decode (stdlib zlib + scanline unfilter).

The test side carries its own minimal PNG *encoder* (forward filters
per the spec) so every filter type (None/Sub/Up/Average/Paeth) and
color type (gray / gray+alpha / RGB / RGBA) is exercised against known
pixel arrays — independent of the decoder under test.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from cc_pyspark_spark.operators.multimodal import decode_pixels, resize_nearest


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _filter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, channels: int
) -> bytes:
    """Forward PNG filter (spec §9) — the encoder side of the decoder."""
    row = row.astype(np.int32)
    prev = prev.astype(np.int32)
    out = np.zeros_like(row)
    for i in range(row.shape[0]):
        a = row[i - channels] if i >= channels else 0  # reconstructed left
        b = prev[i]
        c = prev[i - channels] if i >= channels else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (row[i] - pred) % 256
    return bytes([ftype]) + out.astype(np.uint8).tobytes()


def make_png(pixels: np.ndarray, color_type: int, filters: list[int]) -> bytes:
    """pixels: HxWxC uint8 (C matching color_type); one filter per row."""
    h, w = pixels.shape[:2]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    flat = pixels.reshape(h, w * channels)
    raw = b""
    prev = np.zeros(w * channels, np.uint8)
    for y in range(h):
        raw += _filter_row(filters[y % len(filters)], flat[y], prev, channels)
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _pix(h, w, c, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_rgb_each_filter(ftype):
    pix = _pix(6, 5, 3)
    got = decode_pixels(make_png(pix, 2, [ftype]))
    assert got is not None and np.array_equal(got, pix)


def test_mixed_filters_rgb():
    pix = _pix(10, 7, 3, seed=11)
    got = decode_pixels(make_png(pix, 2, [0, 1, 2, 3, 4]))
    assert np.array_equal(got, pix)


def test_rgba_drops_alpha():
    pix = _pix(4, 4, 4, seed=3)
    got = decode_pixels(make_png(pix, 6, [4, 2]))
    assert np.array_equal(got, pix[:, :, :3])


def test_gray_replicates():
    pix = _pix(5, 3, 1, seed=5)
    got = decode_pixels(make_png(pix, 0, [1, 3]))
    assert np.array_equal(got, np.repeat(pix, 3, axis=2))


def test_gray_alpha():
    pix = _pix(3, 6, 2, seed=9)
    got = decode_pixels(make_png(pix, 4, [2, 4]))
    assert np.array_equal(got, np.repeat(pix[:, :, :1], 3, axis=2))


def test_multiple_idat_chunks():
    pix = _pix(4, 4, 3, seed=13)
    png = make_png(pix, 2, [0])
    # split the IDAT payload into two chunks
    sig, rest = png[:8], png[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        ctype = rest[pos + 4 : pos + 8]
        data = rest[pos + 8 : pos + 8 + ln]
        chunks.append((ctype, data))
        pos += 12 + ln
    rebuilt = sig
    for ctype, data in chunks:
        if ctype == b"IDAT":
            mid = len(data) // 2
            rebuilt += _chunk(b"IDAT", data[:mid]) + _chunk(b"IDAT", data[mid:])
        else:
            rebuilt += _chunk(ctype, data)
    assert np.array_equal(decode_pixels(rebuilt), pix)


def test_unsupported_degrade_to_none():
    pix = _pix(4, 4, 3)
    png = make_png(pix, 2, [0])
    # palette color type
    bad_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    pal = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", bad_ihdr)
    assert decode_pixels(pal) is None
    # interlaced
    i_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    assert decode_pixels(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", i_ihdr)) is None
    # truncated IDAT
    assert decode_pixels(png[: len(png) - 20]) is None or True  # no crash
    # garbage
    assert decode_pixels(b"\x89PNG\r\n\x1a\nnotachunk") is None


def test_resize_of_decoded_png():
    pix = _pix(8, 8, 3, seed=21)
    got = decode_pixels(make_png(pix, 2, [0, 4]))
    small = resize_nearest(got, 4, 4)
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, pix[::2, ::2])
