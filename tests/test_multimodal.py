"""Multimodal decode-stage plumbing tests (stubbed codec)."""

from __future__ import annotations

import hashlib

import pytest

from cc_pyspark_spark.operators.multimodal import decode_image_batch, decode_images


def test_decode_unknown_degrades_to_unknown_row():
    """Unknown formats must NOT abort the batch (skip-and-count, like
    the reference's ArchiveLoadFailed handling): real corpora contain
    ICO/SVG/AVIF blobs the header parser doesn't cover."""
    import pandas as pd

    out = decode_image_batch(pd.Series([b"xx"]))
    assert out["format"].tolist() == ["unknown"]
    assert out["width"].isna().all() and out["height"].isna().all()


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


def test_decode_non_image_mixed_batch_survives(spark):
    """One odd blob among real images: the batch completes, the odd row
    degrades, the real rows decode."""
    import pandas as _pd

    from cc_pyspark_spark.operators.multimodal import decode_image_batch

    out = decode_image_batch(
        _pd.Series([_make_png(3, 2), b"plain text bytes", _make_gif(4, 5)])
    )
    assert out["format"].tolist() == ["image/png", "unknown", "image/gif"]
    assert out["n_bytes"].tolist()[1] == len(b"plain text bytes")
    out_fake = decode_image_batch(_pd.Series([b"plain text bytes"]), fake=True)
    assert out_fake["format"].tolist() == ["fake/raw"]


def _make_webp_lossy(w, h):
    import struct as _s

    vp8 = b"\x00" * 3 + b"\x9d\x01\x2a" + _s.pack("<HH", w, h) + b"\x00" * 8
    riff = b"WEBP" + b"VP8 " + _s.pack("<I", len(vp8)) + vp8
    return b"RIFF" + _s.pack("<I", len(riff)) + riff


def _make_webp_lossless(w, h):
    import struct as _s

    bits = (w - 1) | ((h - 1) << 14)
    vp8l = bytes([0x2F]) + _s.pack("<I", bits) + b"\x00" * 4
    riff = b"WEBP" + b"VP8L" + _s.pack("<I", len(vp8l)) + vp8l
    return b"RIFF" + _s.pack("<I", len(riff)) + riff


def _make_webp_vp8x(w, h):
    import struct as _s

    vp8x = b"\x00" * 4 + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    riff = b"WEBP" + b"VP8X" + _s.pack("<I", len(vp8x)) + vp8x
    return b"RIFF" + _s.pack("<I", len(riff)) + riff


def _make_tiff(w, h, endian="<"):
    import struct as _s

    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    # IFD at offset 8: two SHORT tags (256=width, 257=height)
    ifd = _s.pack(f"{endian}H", 2)
    ifd += _s.pack(f"{endian}HHI", 256, 3, 1) + _s.pack(f"{endian}H", w) + b"\x00\x00"
    ifd += _s.pack(f"{endian}HHI", 257, 3, 1) + _s.pack(f"{endian}H", h) + b"\x00\x00"
    ifd += _s.pack(f"{endian}I", 0)
    return magic + _s.pack(f"{endian}I", 8) + ifd


def test_parse_webp_tiff_headers():
    from cc_pyspark_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_make_webp_lossy(320, 240)) == {
        "format": "image/webp", "width": 320, "height": 240}
    assert parse_image_header(_make_webp_lossless(33, 65)) == {
        "format": "image/webp", "width": 33, "height": 65}
    assert parse_image_header(_make_webp_vp8x(1920, 1080)) == {
        "format": "image/webp", "width": 1920, "height": 1080}
    assert parse_image_header(_make_tiff(640, 480)) == {
        "format": "image/tiff", "width": 640, "height": 480}
    assert parse_image_header(_make_tiff(31, 17, ">")) == {
        "format": "image/tiff", "width": 31, "height": 17}


def test_parse_jpeg_with_fill_bytes():
    """Valid JPEGs may pad with 0xFF fill bytes before markers
    (ITU T.81 B.1.1.2) — the segment walk must skip them."""
    import struct as _s

    from cc_pyspark_spark.operators.multimodal import parse_image_header

    sof = b"\xff\xff\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", 9, 13) + b"\x01\x11\x00"
    jpg = b"\xff\xd8" + b"\xff\xff\xe0" + _s.pack(">H", 4) + b"JF" + sof + b"\xff\xd9"
    assert parse_image_header(jpg) == {
        "format": "image/jpeg", "width": 13, "height": 9}


# ---------------------------------------- real pixel decode + resize

def _make_bmp_pixels(rows_rgb, top_down=False):
    """24-bit BI_RGB BMP from a list of rows of (r, g, b) tuples."""
    import struct as _s

    h = len(rows_rgb)
    w = len(rows_rgb[0])
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    # file stores rows bottom-up unless height is negative
    stored = rows_rgb if top_down else rows_rgb[::-1]
    raster = b"".join(
        b"".join(bytes([b, g, r]) for (r, g, b) in row) + pad
        for row in stored
    )
    header = b"BM" + _s.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    dib = _s.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    return header + dib + raster


PIX = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
]


def test_decode_pixels_bmp_bottom_up_and_top_down():
    import numpy as np

    from cc_pyspark_spark.operators.multimodal import decode_pixels

    want = np.array(PIX, dtype=np.uint8)
    for top_down in (False, True):
        arr = decode_pixels(_make_bmp_pixels(PIX, top_down=top_down))
        assert arr is not None and arr.shape == (2, 3, 3)
        assert (arr == want).all(), f"top_down={top_down}"


def test_decode_pixels_ppm_with_comment_and_pgm_gray():
    import numpy as np

    from cc_pyspark_spark.operators.multimodal import decode_pixels

    flat = bytes(v for row in PIX for px in row for v in px)
    ppm = b"P6 # a comment\n3 2\n255\n" + flat
    arr = decode_pixels(ppm)
    assert arr is not None and arr.shape == (2, 3, 3)
    assert (arr == np.array(PIX, dtype=np.uint8)).all()

    pgm = b"P5\n2 2\n255\n" + bytes([0, 85, 170, 255])
    gray = decode_pixels(pgm)
    assert gray.shape == (2, 2, 3)
    assert (gray[:, :, 0] == gray[:, :, 1]).all()
    assert gray[0, 1, 0] == 85 and gray[1, 1, 2] == 255


def test_decode_pixels_rejects_compressed_and_truncated():
    import numpy as np

    from cc_pyspark_spark.operators.multimodal import decode_pixels

    assert decode_pixels(_make_jpeg(4, 4)) is None
    # PNG decodes for real since r6 (stdlib zlib + unfilter) — the
    # all-zero fixture comes back as a 4x4 black RGB image.
    png = decode_pixels(_make_png(4, 4))
    assert png is not None and png.shape == (4, 4, 3) and not png.any()
    bmp = _make_bmp_pixels(PIX)
    assert decode_pixels(bmp[: len(bmp) - 5]) is None  # truncated raster
    assert decode_pixels(b"P6 3 2 255 ") is None


def test_resize_nearest_exact_index_math():
    import numpy as np

    from cc_pyspark_spark.operators.multimodal import resize_nearest

    arr = np.array(PIX, dtype=np.uint8)
    up = resize_nearest(arr, 6, 4)
    assert up.shape == (4, 6, 3)
    # each source pixel becomes a 2x2 block under exact //-index math
    assert (up[0:2, 0:2] == arr[0, 0]).all()
    assert (up[2:4, 4:6] == arr[1, 2]).all()
    down = resize_nearest(up, 3, 2)
    assert (down == arr).all()


def test_parse_image_header_netpbm():
    from cc_pyspark_spark.operators.multimodal import parse_image_header

    hdr = parse_image_header(b"P6 # c\n37 19\n255\n" + b"\x00" * 10)
    assert hdr == {"format": "image/x-portable-pixmap", "width": 37, "height": 19}
    hdr = parse_image_header(b"P5 8 4 255 " + b"\x00" * 32)
    assert hdr == {"format": "image/x-portable-graymap", "width": 8, "height": 4}


def test_resize_images_real_path_spark(spark):
    import numpy as np

    from cc_pyspark_spark.operators.multimodal import (
        resize_images,
        resize_nearest,
    )

    flat = bytes(v for row in PIX for px in row for v in px)
    blobs = [
        (1, _make_bmp_pixels(PIX)),
        (2, b"P6 3 2 255 " + flat),
        (3, _make_jpeg(4, 4)),  # compressed: degrades to null, no abort
    ]
    df = spark.createDataFrame(blobs, "blob_id long, blob binary")
    out = {r["blob_id"]: r for r in resize_images(df, 6, 4).collect()}
    want = resize_nearest(np.array(PIX, dtype=np.uint8), 6, 4).tobytes()
    assert out[1]["resized"] == want
    assert out[2]["resized"] == want
    assert out[3]["resized"] is None
    assert out[3]["width"] == 6 and out[3]["height"] == 4


def test_multimodal_decode_resize_query_matches_python_replay(spark):
    """Triple agreement: the registry query (numpy path) must match a
    plain Python/numpy replay here, and (since r6) the driver also
    checks it against an independent SQL rearrangement oracle."""
    import duckdb

    from cc_pyspark_spark.operators.multimodal import (
        decode_pixels,
        resize_nearest,
    )
    from cc_pyspark_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    out = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_decode_resize"].spark(spark, sf).collect()
    }
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    assert len(out) == len(docs)
    for doc_id, text in docs[:50]:
        raw = text.encode()
        raster = (
            hashlib.md5(raw).digest()
            + hashlib.md5(raw + b"x").digest()
            + hashlib.md5(raw + b"y").digest()
        )[:36]
        arr = decode_pixels(b"P6 4 3 255 " + raster)
        want = resize_nearest(arr, 8, 6).tobytes().hex()
        assert out[doc_id]["resized_hex"] == want, doc_id


def test_image_ahash_matches_python_reference(spark):
    """aHash over random P6 rasters equals a pure-Python recompute,
    and re-encoding the same raster as BMP does not change the hash
    (container independence — the property image dedup relies on)."""
    import random
    import struct

    from cc_pyspark_spark.operators.multimodal import image_ahash

    rng = random.Random(9)
    rows = []
    expected = {}
    for i in range(40):
        w, h = rng.randint(2, 6), rng.randint(2, 6)
        raster = bytes(rng.randrange(256) for _ in range(w * h * 3))
        p6 = f"P6 {w} {h} 255 ".encode() + raster
        rows.append((2 * i, bytearray(p6)))
        # same raster as BMP (bottom-up rows, BGR, padded) — hash must match
        rowsz = (w * 3 + 3) // 4 * 4
        px = b""
        for y in range(h - 1, -1, -1):
            line = b""
            for x in range(w):
                r, g, b = raster[(y * w + x) * 3:(y * w + x) * 3 + 3]
                line += bytes([b, g, r])
            px += line + b"\x00" * (rowsz - len(line))
        bmp = (
            b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                          2835, 2835, 0, 0)
            + px
        )
        rows.append((2 * i + 1, bytearray(bmp)))
        g = [
            sum(raster[p * 3:p * 3 + 3]) // 3 for p in range(w * h)
        ]
        n, tot = len(g), sum(g)
        want = 0
        for p, v in enumerate(g):
            if v * n > tot:
                want |= 1 << p
        expected[2 * i] = want
        expected[2 * i + 1] = want
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    got = {r["blob_id"]: r["phash"] for r in image_ahash(df).collect()}
    assert got == expected


def test_image_ahash_production_64_pixel_shape(spark):
    """The PRODUCTION raster shape — 8x8 = 64 pixels — must hash without
    task failure: r7 packed bit 63 as a plain `1 << 63` int, overflowing
    signed int64 at the pandas->Arrow boundary. Bit 63 now wraps into
    the sign bit (two's complement, the 64-bit SimHash convention), and
    >64-pixel rasters XOR-fold onto the 64 lanes. Expected values are an
    independent pure-Python recompute of the same rule."""
    import random

    from cc_pyspark_spark.operators.multimodal import image_ahash

    rng = random.Random(17)
    rows, expected = [], {}
    # 8x8 (the resize_images target), plus 9x8 and 16x16 fold cases
    for i, (w, h) in enumerate([(8, 8), (8, 8), (9, 8), (16, 16)]):
        raster = bytes(rng.randrange(256) for _ in range(w * h * 3))
        rows.append((i, bytearray(f"P6 {w} {h} 255 ".encode() + raster)))
        g = [sum(raster[p * 3 : p * 3 + 3]) // 3 for p in range(w * h)]
        n, tot = len(g), sum(g)
        want = 0
        for p, v in enumerate(g):
            if v * n > tot:
                want ^= 1 << (p & 63)
        if want & (1 << 63):
            want -= 1 << 64
        expected[i] = want
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    got = {r["blob_id"]: r["phash"] for r in image_ahash(df).collect()}
    assert got == expected
    # the wrap must actually be exercised: with 4 random 64+-pixel
    # rasters the odds every sign bit stays clear are 1/16 per seed;
    # seed 17 produces at least one negative hash (pinned, determinist)
    assert any(v < 0 for v in got.values()), "sign-bit wrap not exercised"


# ---------------------------------------------------------------------------
# Container probe (r9): ISO-BMFF box walk + MPEG1 Layer III frame walk.


def _bmff(typ: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + typ + body


def _trak(handler: bytes) -> bytes:
    hdlr = _bmff(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"\x00")
    return _bmff(b"trak", _bmff(b"mdia", hdlr))


_FTYP = _bmff(b"ftyp", b"isom" + (0x200).to_bytes(4, "big") + b"isommp42")


def _mvhd_v0(ts: int, dur: int) -> bytes:
    return _bmff(
        b"mvhd",
        b"\x00" * 12 + ts.to_bytes(4, "big") + dur.to_bytes(4, "big")
        + b"\x00" * 80,
    )


def test_parse_mp4_v0_two_tracks_largesize_mdat():
    from cc_pyspark_spark.operators.multimodal import parse_mp4

    moov = _bmff(b"moov", _mvhd_v0(1000, 2333) + _trak(b"vide") + _trak(b"soun"))
    payload = b"\xab" * 7
    mdat = (
        (1).to_bytes(4, "big") + b"mdat"
        + (16 + len(payload)).to_bytes(8, "big") + payload
    )
    blob = _FTYP + moov + _bmff(b"free", b"\x00" * 8) + mdat
    assert parse_mp4(blob) == {
        "major_brand": "isom",
        "timescale": 1000,
        "duration_units": 2333,
        "n_tracks": 2,
        "handlers": ["vide", "soun"],
        "payload_bytes": 7,
    }


def test_parse_mp4_v1_mvhd_64bit_duration():
    from cc_pyspark_spark.operators.multimodal import parse_mp4

    # v1 widens creation/modification to 8 bytes and duration to 8.
    mvhd = _bmff(
        b"mvhd",
        b"\x01" + b"\x00" * 3 + b"\x00" * 16
        + (90000).to_bytes(4, "big") + (2**33).to_bytes(8, "big")
        + b"\x00" * 80,
    )
    blob = _FTYP + _bmff(b"moov", mvhd + _trak(b"vide"))
    m = parse_mp4(blob)
    assert m["duration_units"] == 2**33
    assert m["timescale"] == 90000
    assert m["n_tracks"] == 1


def test_parse_mp4_rejects_corruption():
    from cc_pyspark_spark.operators.multimodal import parse_mp4

    good = _FTYP + _bmff(b"moov", _mvhd_v0(600, 5) + _trak(b"vide"))
    assert parse_mp4(good) is not None
    # child box overruns its enclosure
    assert parse_mp4(_FTYP + (200).to_bytes(4, "big") + b"moov") is None
    # wrong magic, truncation mid-box
    assert parse_mp4(b"junkjunkjunkjunk") is None
    assert parse_mp4(good[:30]) is None
    # moov without mvhd -> no timescale -> None, not a garbage row
    assert parse_mp4(_FTYP + _bmff(b"moov", _trak(b"vide"))) is None


_F44 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 413  # 417 B
_F48 = bytes([0xFF, 0xFB, 0x94, 0x00]) + b"\x00" * 380  # 384 B
_F32 = bytes([0xFF, 0xFB, 0x98, 0x00]) + b"\x00" * 572  # 576 B


def test_parse_mp3_frame_walk_padding_and_truncation():
    from cc_pyspark_spark.operators.multimodal import parse_mp3

    fpad = bytes([0xFF, 0xFB, 0x92, 0x00]) + b"\x00" * 414  # padding bit
    m = parse_mp3(_F44 * 3 + fpad)
    assert m == {
        "sample_rate": 44100,
        "bitrate_kbps": 128,
        "n_frames": 4,
        "duration_units": 4 * 1152,
        "payload_bytes": 3 * 417 + 418,
    }
    # a truncated final frame is not counted
    t = parse_mp3((_F44 * 3 + fpad)[:-10])
    assert t["n_frames"] == 3 and t["payload_bytes"] == 3 * 417
    # per-rate frame lengths straight from the header indices
    assert parse_mp3(_F48 * 2)["payload_bytes"] == 768
    assert parse_mp3(_F32)["payload_bytes"] == 576
    assert parse_mp3(b"\xff\xe0junk") is None


def test_probe_containers_sniffs_and_skips(spark):
    from cc_pyspark_spark.operators.multimodal import probe_containers

    moov = _bmff(b"moov", _mvhd_v0(600, 1200) + _trak(b"vide"))
    rows = [
        (1, _FTYP + moov),
        (2, _F48 * 2),
        (3, b"not a container at all"),
    ]
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    got = {r["blob_id"]: r.asDict() for r in probe_containers(df).collect()}
    assert got[1]["container"] == "mp4"
    assert got[1]["duration_ms"] == 2000  # 1200 units @ 600/s
    assert got[1]["handlers"] == "vide"
    assert got[2]["container"] == "mp3"
    assert got[2]["duration_ms"] == 2 * 1152 * 1000 // 48000
    assert got[2]["n_tracks"] == 1
    assert got[3]["container"] is None  # skip-and-count, row kept
    assert got[3]["payload_bytes"] is None


def test_container_parsers_never_crash_on_fuzz():
    """Crawl blobs are hostile: both walkers must return a dict or
    None on ARBITRARY bytes — never raise. Deterministic fuzz corpus:
    md5-chained bytes, plus adversarial mutations of valid blobs
    (every prefix truncation, single-byte flips at structural
    offsets)."""
    import hashlib

    from cc_pyspark_spark.operators.multimodal import parse_mp3, parse_mp4

    blobs = []
    seed = b"fuzz"
    for i in range(64):
        seed = hashlib.md5(seed).digest()
        blobs.append(seed * (i % 7 + 1))
    valid_mp4 = (
        _FTYP
        + _bmff(b"moov", _mvhd_v0(1000, 999) + _trak(b"vide"))
        + (1).to_bytes(4, "big") + b"mdat" + (21).to_bytes(8, "big")
        + b"xxxxx"
    )
    valid_mp3 = _F44 * 2 + _F48
    for base in (valid_mp4, valid_mp3):
        blobs += [base[:k] for k in range(len(base))]
        for off in (0, 1, 3, 4, 5, 8, 12, 16, 20, 30, len(base) - 1):
            mutated = bytearray(base)
            mutated[off] ^= 0xFF
            blobs.append(bytes(mutated))
    for b in blobs:
        for parser in (parse_mp4, parse_mp3):
            out = parser(b)
            assert out is None or isinstance(out, dict)
    # the unmutated blobs must still parse (the fuzz loop would pass
    # trivially if the fixtures were junk)
    assert parse_mp4(valid_mp4)["payload_bytes"] == 5
    assert parse_mp3(valid_mp3)["n_frames"] == 3
