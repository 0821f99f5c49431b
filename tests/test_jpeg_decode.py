"""Baseline JPEG decoder vs an independent test-side encoder.

The encoder below is written from the T.81 spec directly (flat 8-bit
canonical Huffman tables, unit quantization, explicit float DCT) and
shares no code with operators/jpeg.py — so a round-trip agreement is a
genuine two-implementation cross-check, same discipline as the PNG
(r6) and GIF (r7) decoders. Unit quant bounds reconstruction error to
DCT/IDCT float rounding (<= 2 gray levels), which the tests assert.
"""

from __future__ import annotations

import numpy as np
import pytest

from cc_pyspark_spark.operators.jpeg import decode_jpeg

# independent copy of the T.81 zigzag (flat index of the k-th coef)
ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for u in range(8)
        ]
        for x in range(8)
    ]
)

DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _flat_table(symbols):
    """All-8-bit canonical Huffman: code of symbols[i] is i."""
    counts = [0] * 16
    counts[7] = len(symbols)
    codes = {s: (i, 8) for i, s in enumerate(symbols)}
    return counts, bytes(symbols), codes

DC_COUNTS, DC_BYTES, DC_CODES = _flat_table(DC_SYMS)
AC_COUNTS, AC_BYTES, AC_CODES = _flat_table(AC_SYMS)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-bit pad


def _size_cat(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw, block, pred):
    """block: 8x8 int spatial samples. Returns new DC predictor."""
    coef = A.T @ (block.astype(np.float64) - 128.0) @ A
    q = np.round(coef).astype(np.int64)
    seq = [int(q.flat[ZZ[k]]) for k in range(64)]
    dc = seq[0]
    diff = dc - pred
    s = _size_cat(diff)
    code, ln = DC_CODES[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    k = 1
    run = 0
    last_nz = max((i for i in range(1, 64) if seq[i]), default=0)
    while k <= last_nz:
        if seq[k] == 0:
            run += 1
            k += 1
            continue
        while run >= 16:
            code, ln = AC_CODES[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _size_cat(seq[k])
        code, ln = AC_CODES[(run << 4) | s]
        bw.put(code, ln)
        v = seq[k]
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        k += 1
    if last_nz < 63:
        code, ln = AC_CODES[0x00]
        bw.put(code, ln)
    return dc


def _pad_to(plane, bh, bw_):
    h, w = plane.shape
    ph = (h + bh - 1) // bh * bh
    pw = (w + bw_ - 1) // bw_ * bw_
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _segments(w, h, comps, restart=0):
    """SOI..SOS headers for unit quant + flat Huffman tables."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT tq=0, all ones
    for tc, th, counts, syms in [
        (0, 0, DC_COUNTS, DC_BYTES),
        (1, 0, AC_COUNTS, AC_BYTES),
    ]:
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + syms)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comps))
    for cid, ch, cv in comps:
        sof.extend([cid, (ch << 4) | cv, 0])
    seg(0xC0, bytes(sof))
    if restart:
        seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytearray([len(comps)])
    for cid, _, _ in comps:
        sos.extend([cid, 0x00])  # dc table 0, ac table 0
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))
    return out


def rgb_to_ycbcr(rgb):
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [np.round(p).clip(0, 255) for p in (y, cb, cr)]


def encode_jpeg(rgb, sampling="444", restart=0):
    """Baseline encoder: unit quant, flat tables, 4:4:4 or 4:2:0."""
    h, w = rgb.shape[:2]
    y, cb, cr = rgb_to_ycbcr(rgb)
    if sampling == "444":
        comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
        planes = [y, cb, cr]
        mw, mh = 8, 8
    elif sampling == "422":  # horizontal-only chroma subsampling
        comps = [(1, 2, 1), (2, 1, 1), (3, 1, 1)]

        def down_h(p):
            p = _pad_to(p, 1, 2)
            return np.round((p[:, 0::2] + p[:, 1::2]) / 2.0)

        planes = [y, down_h(cb), down_h(cr)]
        mw, mh = 16, 8
    else:  # 420
        comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]

        def down(p):
            p = _pad_to(p, 2, 2)
            return np.round(
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
                / 4.0
            )

        planes = [y, down(cb), down(cr)]
        mw, mh = 16, 16
    out = _segments(w, h, comps, restart)
    bw = BitWriter()
    mcus_x = (w + mw - 1) // mw
    mcus_y = (h + mh - 1) // mh
    # pad each plane to its MCU-aligned size (edge replication)
    padded = [
        _pad_to(p, mcus_y * cv * 8, mcus_x * ch * 8)[
            : mcus_y * cv * 8, : mcus_x * ch * 8
        ]
        for p, (_, ch, cv) in zip(planes, comps)
    ]
    preds = [0, 0, 0]
    count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and count and count % restart == 0:
                bw.align()
                bw.out.extend([0xFF, 0xD0 + ((count // restart - 1) % 8)])
                preds = [0, 0, 0]
            for ci, (p, (_, ch, cv)) in enumerate(zip(padded, comps)):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        preds[ci] = _encode_block(
                            bw, p[y0 : y0 + 8, x0 : x0 + 8], preds[ci]
                        )
            count += 1
    bw.align()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_gray_jpeg(gray, restart=0):
    h, w = gray.shape
    out = _segments(w, h, [(1, 1, 1)], restart)
    bw = BitWriter()
    mcus_x = (w + 7) // 8
    mcus_y = (h + 7) // 8
    p = _pad_to(gray.astype(np.float64), mcus_y * 8, mcus_x * 8)[
        : mcus_y * 8, : mcus_x * 8
    ]
    pred = 0
    count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and count and count % restart == 0:
                bw.align()
                bw.out.extend([0xFF, 0xD0 + ((count // restart - 1) % 8)])
                pred = 0
            pred = _encode_block(
                bw, p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], pred
            )
            count += 1
    bw.align()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_idct_basis_is_orthogonal():
    assert np.allclose(A.T @ A, np.eye(8), atol=1e-12)


def test_solid_color_roundtrip():
    rgb = np.full((8, 8, 3), 0, np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 80, 40
    got = decode_jpeg(encode_jpeg(rgb))
    assert got is not None and got.shape == (8, 8, 3)
    assert int(np.abs(got.astype(int) - rgb.astype(int)).max()) <= 2


def test_random_rgb_444_roundtrip():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(rgb))
    assert got is not None and got.shape == rgb.shape
    # unit quant: error only from color transform + DCT rounding
    assert int(np.abs(got.astype(int) - rgb.astype(int)).max()) <= 4


def test_random_gray_roundtrip_and_replication():
    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, (13, 9)).astype(np.uint8)  # odd dims: crop path
    got = decode_jpeg(encode_gray_jpeg(g))
    assert got is not None and got.shape == (13, 9, 3)
    assert (got[..., 0] == got[..., 1]).all() and (
        got[..., 1] == got[..., 2]
    ).all()
    assert int(np.abs(got[..., 0].astype(int) - g.astype(int)).max()) <= 2


def test_chroma_420_subsampling():
    """Decoded 4:2:0 RGB equals an independent reference reconstruction
    (2x2-mean chroma, pixel replication up, JFIF inverse transform) up
    to DCT rounding — the whole subsample/upsample path verified."""
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (32, 16, 3)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(rgb, sampling="420"))
    assert got is not None and got.shape == rgb.shape
    y, cb, cr = rgb_to_ycbcr(rgb)

    def down_up(p):
        ds = np.round(
            (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
            / 4.0
        )
        return np.repeat(np.repeat(ds, 2, axis=0), 2, axis=1)

    cbr, crr = down_up(cb), down_up(cr)
    r = y + 1.402 * (crr - 128.0)
    g = y - 0.344136 * (cbr - 128.0) - 0.714136 * (crr - 128.0)
    b = y + 1.772 * (cbr - 128.0)
    ref = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255)
    assert float(np.abs(got.astype(float) - ref).max()) <= 4.0


def test_chroma_422_subsampling():
    """4:2:2 (horizontal-only chroma subsampling — the claimed third
    sampling mode): decoded RGB equals the independent reference
    (2x1-mean chroma, horizontal replication, JFIF inverse) up to DCT
    rounding."""
    rng = np.random.RandomState(19)
    rgb = rng.randint(0, 256, (16, 32, 3)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(rgb, sampling="422"))
    assert got is not None and got.shape == rgb.shape
    y, cb, cr = rgb_to_ycbcr(rgb)

    def down_up(p):
        ds = np.round((p[:, 0::2] + p[:, 1::2]) / 2.0)
        return np.repeat(ds, 2, axis=1)

    cbr, crr = down_up(cb), down_up(cr)
    r = y + 1.402 * (crr - 128.0)
    g = y - 0.344136 * (cbr - 128.0) - 0.714136 * (crr - 128.0)
    b = y + 1.772 * (cbr - 128.0)
    ref = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255)
    assert float(np.abs(got.astype(float) - ref).max()) <= 4.0


def test_restart_markers_match_unrestarted():
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(rgb))
    b = decode_jpeg(encode_jpeg(rgb, restart=2))
    assert a is not None and b is not None
    assert (a == b).all(), "RST path must not change decoded pixels"


def test_progressive_returns_none():
    rgb = np.zeros((8, 8, 3), np.uint8)
    blob = bytearray(encode_jpeg(rgb))
    i = blob.find(bytes([0xFF, 0xC0]))
    blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    assert decode_jpeg(bytes(blob)) is None


def test_truncated_and_garbage_return_none():
    rgb = np.zeros((8, 8, 3), np.uint8)
    blob = encode_jpeg(rgb)
    assert decode_jpeg(blob[: len(blob) // 3]) is None or True  # no raise
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg(b"not a jpeg at all") is None


def test_decode_pixels_dispatches_jpeg():
    from cc_pyspark_spark.operators.multimodal import decode_pixels

    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, (8, 16, 3)).astype(np.uint8)
    arr = decode_pixels(encode_jpeg(rgb))
    assert arr is not None and arr.shape == rgb.shape
    assert int(np.abs(arr.astype(int) - rgb.astype(int)).max()) <= 4


def test_ahash_container_independence_p6_vs_jpeg(spark):
    """High-contrast rasters: JPEG's <=2-level reconstruction error
    cannot flip an aHash bit, so the perceptual hash matches the
    lossless P6 encoding of the SAME raster exactly — the container
    independence the image near-dup operator relies on, now including
    the lossy container."""
    from cc_pyspark_spark.operators.multimodal import image_ahash

    rng = np.random.RandomState(23)
    rows = []
    want_pairs = []
    for i in range(6):
        # block pattern: each 4x4 cell solid 30 or 220 -> far from mean
        cells = rng.choice([30, 220], size=(2, 3))
        raster = np.repeat(np.repeat(cells, 4, axis=0), 4, axis=1)
        rgb = np.stack([raster] * 3, axis=2).astype(np.uint8)
        p6 = f"P6 {rgb.shape[1]} {rgb.shape[0]} 255 ".encode() + rgb.tobytes()
        rows.append((2 * i, bytearray(p6)))
        rows.append((2 * i + 1, bytearray(encode_jpeg(rgb))))
        want_pairs.append((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    got = {r["blob_id"]: r["phash"] for r in image_ahash(df).collect()}
    for a, b in want_pairs:
        assert got[a] == got[b], f"hash mismatch P6 vs JPEG for pair {a}/{b}"


# ---------------------------------------- MJPEG AVI frame sampling


def _avi(frames, rec_nested=False):
    """Minimal MJPEG AVI: RIFF(AVI )/LIST hdrl + LIST movi with 00dc
    chunks (each a JPEG); optionally nests the chunks one level inside
    a 'rec ' record list, as interleaved AVIs do."""

    def chunk(fourcc, payload):
        out = fourcc + len(payload).to_bytes(4, "little") + payload
        if len(payload) & 1:
            out += b"\x00"  # RIFF chunks are word-aligned
        return out

    def lst(ltype, payload):
        return chunk(b"LIST", ltype + payload)

    avih = chunk(b"avih", bytes(56))
    hdrl = lst(b"hdrl", avih)
    dcs = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", lst(b"rec ", dcs) if rec_nested else dcs)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _frame_rasters(n, w=16, h=8):
    rng = np.random.RandomState(41)
    return [
        rng.randint(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)
    ]


def test_mjpeg_avi_frames_walks_container():
    from cc_pyspark_spark.operators.multimodal import mjpeg_avi_frames

    rasters = _frame_rasters(5)
    jpegs = [encode_jpeg(r) for r in rasters]
    assert mjpeg_avi_frames(_avi(jpegs)) == jpegs
    assert mjpeg_avi_frames(_avi(jpegs, rec_nested=True)) == jpegs
    assert mjpeg_avi_frames(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert mjpeg_avi_frames(b"garbage") is None
    # odd-length frame exercises word-alignment padding
    odd = jpegs[0] + b"\x00" if len(jpegs[0]) % 2 == 0 else jpegs[0]
    assert mjpeg_avi_frames(_avi([odd])) == [odd]


def test_sample_frames_real_mjpeg_path(spark):
    """The real (fake=False) frame-sampling path: MJPEG AVI blobs
    expand to decodable JPEG frame rows with even stride; non-AVI
    blobs contribute no rows (skip-and-count)."""
    from cc_pyspark_spark.operators.multimodal import (
        decode_pixels,
        sample_frames,
    )

    rasters = _frame_rasters(5)
    avi = _avi([encode_jpeg(r) for r in rasters])
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"not a video"))],
        "blob_id long, blob binary",
    )
    rows = sample_frames(df, max_frames=8).collect()
    assert {r["blob_id"] for r in rows} == {1}
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [
        0, 1, 2, 3, 4,
    ]
    for r in rows:
        arr = decode_pixels(bytes(r["frame"]))
        ref = rasters[r["frame_idx"]]
        assert arr is not None and arr.shape == ref.shape
        assert int(np.abs(arr.astype(int) - ref.astype(int)).max()) <= 4

    two = sample_frames(df, max_frames=2).collect()
    assert sorted(r["frame_idx"] for r in two) == [0, 3]  # stride ceil(5/2)


def test_decoder_never_raises_on_mutations():
    """Skip-and-count discipline: arbitrary corruption — truncation,
    byte flips, random tails — must yield None or a valid array, never
    an exception (one corrupt image cannot kill a 10-hour job)."""
    import random

    rng = random.Random(99)
    base = bytearray(encode_jpeg(_frame_rasters(1)[0]))
    for trial in range(300):
        blob = bytearray(base)
        kind = trial % 3
        if kind == 0:  # truncate
            blob = blob[: rng.randrange(2, len(blob))]
        elif kind == 1:  # flip 1-4 bytes
            for _ in range(rng.randrange(1, 5)):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        else:  # random tail after SOI
            blob = blob[:2] + bytearray(
                rng.randrange(256) for _ in range(rng.randrange(4, 200))
            )
        out = decode_jpeg(bytes(blob))
        assert out is None or (
            out.ndim == 3 and out.shape[2] == 3 and out.dtype == np.uint8
        )


# ---------------------------------------------------------------- r9 fixes


def test_bitreader_acc_stays_bounded():
    """The accumulator must trim consumed bits in _fill: without the
    mask it grows a bignum over the entire entropy stream and every
    read_bit shift becomes O(bytes consumed) — O(n^2) per image, i.e.
    tens of minutes for a ~1 MB crawl JPEG inside mapInPandas."""
    from cc_pyspark_spark.operators.jpeg import _BitReader

    data = bytes([0xAB, 0xCD] * 5000)  # no 0xFF: all bytes consumable
    br = _BitReader(data, 0)
    bits = []
    for i in range(8 * len(data)):
        bits.append(br.read_bit())
        if i % 997 == 0:
            assert br.acc.bit_length() <= br.nbits + 8
    assert br.acc.bit_length() <= 8
    # value correctness survives the masking
    want = []
    for b in data:
        want.extend((b >> k) & 1 for k in range(7, -1, -1))
    assert bits == want


def test_large_decode_is_linear_time():
    """~65k entropy-coded blocks of noise must decode in seconds, not
    minutes (the pre-fix bignum reader measured 9.3 s at 256px and
    scaled ~13x per 4x data)."""
    import time

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, (256, 256, 3)).astype(np.uint8)
    blob = encode_jpeg(rgb)
    t0 = time.monotonic()
    out = decode_jpeg(blob)
    dt = time.monotonic() - t0
    assert out is not None and out.shape == (256, 256, 3)
    assert dt < 5.0, f"256px decode took {dt:.2f}s — bit reader is superlinear"


def test_truncated_mid_entropy_returns_none_not_garbage():
    """receive() must signal mid-magnitude truncation (None frame),
    never return a partial value that _extend turns into a garbage DC
    diff — truncated JPEGs are routine in crawl data."""
    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    blob = encode_jpeg(rgb)
    sos = blob.find(bytes([0xFF, 0xDA]))
    assert sos > 0
    entropy_start = sos + 2 + int.from_bytes(blob[sos + 2 : sos + 4], "big")
    # cut at several points strictly inside the entropy segment: bits
    # for later MCUs are missing, so the frame must fail, not decode.
    for frac in (0.25, 0.5, 0.75, 0.9):
        cut = entropy_start + int((len(blob) - 2 - entropy_start) * frac)
        assert decode_jpeg(blob[:cut]) is None, f"cut at {frac}"


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 allows any number of 0xFF pad bytes before a
    marker; 0xFF 0xFF must not be misread as marker id 0xFF with the
    following bytes as a segment length."""
    rng = np.random.RandomState(17)
    rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    blob = encode_jpeg(rgb)
    want = decode_jpeg(blob)
    assert want is not None
    for marker in (0xDB, 0xC4, 0xC0, 0xDA):
        i = blob.find(bytes([0xFF, marker]))
        assert i > 0
        padded = blob[:i] + b"\xff" * 3 + blob[i:]
        got = decode_jpeg(padded)
        assert got is not None, f"fill bytes before FF{marker:02X} broke decode"
        assert (got == want).all()
