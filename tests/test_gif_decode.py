"""GIF LZW pixel decode (operators/multimodal.py:_decode_gif).

The fixtures are byte-built here with a real GIF-flavor LZW ENCODER
(dictionary growth, variable code width, clear handling) so the
decoder is exercised by round-trip against independently-constructed
archives, not by decoding its own output.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cc_pyspark_spark.operators.multimodal import (
    _decode_gif,
    decode_pixels,
    parse_image_header,
)


class _Bits:
    """LSB-first code packer (GIF Appendix F bit order)."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, code: int, width: int):
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def lzw_encode(indices: list[int], mcs: int) -> bytes:
    """Real GIF LZW: emit CLEAR, compress with a growing dictionary
    (early width change at table==2^width, reset at 4096), emit EOI."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = _Bits()
    width = mcs + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    bits.put(clear, width)
    run: tuple[int, ...] = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        bits.put(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            bits.put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        run = (px,)
    if run:
        bits.put(table[run], width)
    bits.put(eoi, width)
    return bits.done()


def build_gif(
    pal: bytes,
    indices: list[int],
    w: int,
    h: int,
    mcs: int,
    interlaced: bool = False,
    local_table: bool = False,
    with_extension: bool = False,
) -> bytes:
    """Assemble a single-frame GIF89a from palette + pixel indices."""
    n_colors = len(pal) // 3
    size_bits = max(1, (n_colors - 1).bit_length()) - 1
    assert 3 * (1 << (size_bits + 1)) == len(pal), "pad palette to 2^k"
    out = bytearray(b"GIF89a")
    gflag = 0 if local_table else 0x80 | size_bits
    out += struct.pack("<HHBBB", w, h, gflag, 0, 0)
    if not local_table:
        out += pal
    if with_extension:  # graphic control extension — must be skipped
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    iflag = (0x80 | size_bits if local_table else 0) | (
        0x40 if interlaced else 0
    )
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflag)
    if local_table:
        out += pal
    out.append(mcs)
    data = lzw_encode(indices, mcs)
    for at in range(0, len(data), 255):
        chunk = data[at : at + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _rand_case(rng, w, h, n_colors):
    pal_colors = 1 << max(1, (n_colors - 1).bit_length())
    pal = bytes(rng.integers(0, 256, 3 * pal_colors, dtype=np.uint8))
    idx = [int(v) for v in rng.integers(0, n_colors, w * h)]
    mcs = max(2, (pal_colors - 1).bit_length())
    return pal, idx, mcs


@pytest.mark.parametrize(
    "w,h,n_colors",
    [(4, 3, 12), (16, 16, 64), (40, 25, 200), (7, 1, 2), (1, 9, 5)],
)
def test_gif_roundtrip(w, h, n_colors):
    rng = np.random.default_rng(w * 1000 + h * 10 + n_colors)
    pal, idx, mcs = _rand_case(rng, w, h, n_colors)
    blob = build_gif(pal, idx, w, h, mcs, with_extension=(n_colors % 2 == 0))
    arr = _decode_gif(blob)
    assert arr is not None and arr.shape == (h, w, 3)
    expect = np.frombuffer(pal, np.uint8).reshape(-1, 3)[
        np.asarray(idx).reshape(h, w)
    ]
    assert (arr == expect).all()
    # dispatch + header parser agree
    assert (decode_pixels(blob) == expect).all()
    hdr = parse_image_header(blob)
    assert (hdr["width"], hdr["height"]) == (w, h)


def test_gif_width_growth_and_dict_reuse():
    """A long low-entropy stream forces dictionary hits AND several
    code-width increases — the paths a trivial fixture never touches."""
    rng = np.random.default_rng(7)
    w, h = 64, 48
    pal, _, mcs = _rand_case(rng, w, h, 16)
    idx = [(i // 7) % 16 for i in range(w * h)]  # long runs → deep dict
    blob = build_gif(pal, idx, w, h, mcs)
    arr = _decode_gif(blob)
    expect = np.frombuffer(pal, np.uint8).reshape(-1, 3)[
        np.asarray(idx).reshape(h, w)
    ]
    assert (arr == expect).all()


def test_gif_local_color_table_wins():
    rng = np.random.default_rng(11)
    pal, idx, mcs = _rand_case(rng, 5, 4, 8)
    blob = build_gif(pal, idx, 5, 4, mcs, local_table=True)
    arr = _decode_gif(blob)
    expect = np.frombuffer(pal, np.uint8).reshape(-1, 3)[
        np.asarray(idx).reshape(4, 5)
    ]
    assert (arr == expect).all()


def test_gif_rejects_interlace_truncation_and_bad_codes():
    rng = np.random.default_rng(13)
    pal, idx, mcs = _rand_case(rng, 6, 6, 8)
    assert _decode_gif(build_gif(pal, idx, 6, 6, mcs, interlaced=True)) is None
    blob = build_gif(pal, idx, 6, 6, mcs)
    assert _decode_gif(blob[: len(blob) // 2]) is None
    # a corrupted code stream must fail cleanly (None or a valid
    # array), never raise
    bad = bytearray(build_gif(pal, [7] * 36, 6, 6, mcs))
    bad[-4] ^= 0x5A
    try:
        out = _decode_gif(bytes(bad))
    except Exception as ex:  # pragma: no cover - the regression itself
        pytest.fail(f"tampered GIF raised {ex!r}")
    assert out is None or out.shape == (6, 6, 3)
