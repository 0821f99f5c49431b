"""Multimodal column plumbing: opaque binary blobs + typed metadata.

Design (beyond-reference, 100 TB LLM-pipeline): image/audio/video
payloads travel as `binary` columns with a metadata struct next to
them; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages so each task processes a columnar
batch of blobs without per-row Python overhead.

Decode tiers:
* dimensions — real pure-Python header parser for PNG / BMP / GIF /
  JPEG / WEBP / TIFF / netpbm (width/height live in fixed or token
  header fields; no codec library needed).
* pixels — REAL numpy decode for 24-bit BI_RGB BMP, binary PPM/PGM,
  non-interlaced 8-bit PNG (gray / gray+alpha / RGB / RGBA) via stdlib
  zlib inflate + scanline unfiltering, (r7) non-interlaced GIF via a
  pure-Python GIF-flavor LZW decoder (variable code width, clear /
  EOI handling, global or local color table), and (r8) baseline JPEG
  via the vendored pure-Python T.81 decoder in operators/jpeg.py
  (Huffman + dequant + IDCT + YCbCr, 4:4:4/4:2:2/4:2:0, restart
  markers; progressive/arithmetic degrade to None) — all five header
  formats now decode real pixels with no codec library. Undecodable
  rows degrade to null (skip-and-count) or use the `fake=True` stub;
  video frame sampling stays ffmpeg-gated. The Spark-side plumbing —
  schema, batch shape, UDF signature, partition behavior — is
  identical either way; swapping in Pillow/ffmpeg remains a
  one-function change.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Output schema of the decode stage: pass-through key + typed metadata.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a real image decode."""
    digest = hashlib.md5(blob).hexdigest()
    return {
        "n_bytes": len(blob),
        "format": "fake/raw",
        "width": 1 + len(blob) % 640,
        "height": 1 + int(digest[:4], 16) % 480,
        "checksum": digest,
    }


def parse_image_header(blob: bytes) -> dict | None:
    """Real width/height from PNG/BMP/GIF/JPEG/WEBP/TIFF headers,
    pure Python.

    Returns None for anything unrecognized (truncated or other format).
    """
    if blob is None or len(blob) < 10:
        return None
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
            w, h = struct.unpack(">II", blob[16:24])
            return {"format": "image/png", "width": w, "height": h}
        if blob[:2] == b"BM" and len(blob) >= 26:
            w, h = struct.unpack("<ii", blob[18:26])
            return {"format": "image/bmp", "width": w, "height": abs(h)}
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", blob[6:10])
            return {"format": "image/gif", "width": w, "height": h}
        if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
            return _parse_webp(blob)
        if blob[:4] in (b"II*\x00", b"MM\x00*"):
            return _parse_tiff(blob)
        if blob[:2] in (b"P5", b"P6"):
            parsed = _scan_pnm_header(blob)
            if parsed is None:
                return None
            w, h, _maxval, _pos = parsed
            fmt = (
                "image/x-portable-pixmap"
                if blob[:2] == b"P6"
                else "image/x-portable-graymap"
            )
            return {"format": fmt, "width": w, "height": h}
        if blob[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
            pos = 2
            while pos + 9 < len(blob):
                if blob[pos] != 0xFF:
                    return None
                pos += 1
                # skip 0xFF fill/padding bytes before the marker proper
                while pos < len(blob) and blob[pos] == 0xFF:
                    pos += 1
                if pos + 8 >= len(blob):
                    return None
                marker = blob[pos]
                pos += 1
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    continue
                seg_len = struct.unpack(">H", blob[pos : pos + 2])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", blob[pos + 3 : pos + 7])
                    return {"format": "image/jpeg", "width": w, "height": h}
                pos += seg_len
    except struct.error:
        return None
    return None


def _parse_webp(blob: bytes) -> dict | None:
    """WEBP dimensions from the first VP8/VP8L/VP8X chunk."""
    chunk = blob[12:16]
    if chunk == b"VP8X" and len(blob) >= 30:
        # 24-bit little-endian width-1 / height-1 at offsets 24 / 27
        w = int.from_bytes(blob[24:27], "little") + 1
        h = int.from_bytes(blob[27:30], "little") + 1
        return {"format": "image/webp", "width": w, "height": h}
    if chunk == b"VP8 " and len(blob) >= 30:
        # lossy: 14-bit dims at offset 26, after the 3-byte start code
        if blob[23:26] != b"\x9d\x01\x2a":
            return None
        w = struct.unpack("<H", blob[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", blob[28:30])[0] & 0x3FFF
        return {"format": "image/webp", "width": w, "height": h}
    if chunk == b"VP8L" and len(blob) >= 25:
        # lossless: 14-bit-1 dims bit-packed after the 0x2F signature
        if blob[20] != 0x2F:
            return None
        bits = int.from_bytes(blob[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return {"format": "image/webp", "width": w, "height": h}
    return None


def _parse_tiff(blob: bytes) -> dict | None:
    """TIFF dimensions from the first IFD's ImageWidth/ImageLength tags."""
    endian = "<" if blob[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(f"{endian}I", blob[4:8])
    if ifd_off + 2 > len(blob):
        return None
    (n_tags,) = struct.unpack(f"{endian}H", blob[ifd_off : ifd_off + 2])
    w = h = None
    for t in range(min(n_tags, 512)):
        off = ifd_off + 2 + 12 * t
        if off + 12 > len(blob):
            return None
        tag, typ = struct.unpack(f"{endian}HH", blob[off : off + 4])
        if tag not in (256, 257):
            continue
        if typ == 3:  # SHORT
            (val,) = struct.unpack(f"{endian}H", blob[off + 8 : off + 10])
        elif typ == 4:  # LONG
            (val,) = struct.unpack(f"{endian}I", blob[off + 8 : off + 12])
        else:
            continue
        if tag == 256:
            w = val
        else:
            h = val
        if w is not None and h is not None:
            return {"format": "image/tiff", "width": w, "height": h}
    return None


def decode_image_batch(blobs: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Decode one Arrow batch of image blobs → metadata frame.

    PNG/BMP/GIF/JPEG/WEBP/TIFF dimensions come from the real header
    parser. For anything else (ICO, SVG, AVIF, truncated blobs, …) a
    full pixel decode would need an image library (not bundled), so the
    row degrades to ``format='unknown'`` with null dimensions —
    skip-and-count semantics, like the reference's ArchiveLoadFailed
    handling (sparkcc.py:390-392): one odd blob in a 100 TB corpus must
    never abort the job. `fake=True` swaps in the deterministic stub
    decode instead (test plumbing).
    """
    rows = []
    for b in blobs:
        hdr = parse_image_header(b)
        if hdr is not None:
            hdr["n_bytes"] = len(b)
            hdr["checksum"] = hashlib.md5(b).hexdigest()
            rows.append(hdr)
        elif fake:
            rows.append(_fake_decode(b))
        else:
            rows.append(
                {
                    "n_bytes": len(b) if b is not None else 0,
                    "format": "unknown",
                    "width": None,
                    "height": None,
                    "checksum": hashlib.md5(b).hexdigest() if b is not None else None,
                }
            )
    return pd.DataFrame(rows, columns=["n_bytes", "format", "width", "height", "checksum"])


def decode_images(blobs_df: DataFrame, id_col: str = "blob_id",
                  blob_col: str = "blob", fake: bool = False) -> DataFrame:
    """DataFrame of (id, binary blob) → decoded-metadata DataFrame.

    mapInPandas keeps the blob bytes inside the Arrow batch (no per-row
    pickling); partitioning is inherited from the input, so colocating
    blobs by storage file keeps the decode stage shuffle-free.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = decode_image_batch(pdf[blob_col], fake=fake)
            out.insert(0, "blob_id", pdf[id_col].values)
            yield out

    return blobs_df.mapInPandas(run, DECODED_SCHEMA)


def decode_pixels(blob: bytes) -> "np.ndarray | None":
    """Real pixel decode, stdlib + numpy — no codec library.

    Supported: uncompressed 24-bit BI_RGB BMP (top-down and bottom-up),
    binary netpbm (P6 PPM color, P5 PGM gray), non-interlaced
    8-bit-depth PNG (color types 0/2/4/6) via zlib inflate + scanline
    unfilter, non-interlaced GIF (first frame, global or local color
    table) via pure-Python LZW, and baseline JPEG (SOF0/SOF1, Huffman
    + dequant + IDCT + YCbCr, restart intervals; r8 — see
    operators/jpeg.py for the exact scope; progressive/arithmetic
    degrade to None). Returns an HxWx3 uint8 RGB array (alpha dropped,
    gray replicated, palette applied), or None for anything else.
    """
    if blob is None or len(blob) < 12:
        return None
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:2] in (b"P5", b"P6"):
        return _decode_pnm(blob)
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
    if blob[:2] == b"\xff\xd8":
        from cc_pyspark_spark.operators.jpeg import (  # noqa: PLC0415
            decode_jpeg,
            jpeg_out_of_scope,
        )

        out = decode_jpeg(bytes(blob))
        if out is None and jpeg_out_of_scope(bytes(blob)):
            # Format outside the vendored baseline scope (progressive/
            # arithmetic/12-bit/CMYK): try the optional Pillow codec.
            # Gated on jpeg_out_of_scope — NEVER on arbitrary decode
            # failure — so corrupt baseline frames stay None whether or
            # not Pillow is installed and oracled queries stay
            # environment-independent.
            out = _external_jpeg_pixels(bytes(blob))
        return out
    return None


def _external_jpeg_pixels(blob: bytes) -> "np.ndarray | None":
    """Pillow-backed decode for JPEG frame types the vendored T.81
    baseline decoder documents as out of scope. Returns None when
    Pillow is absent (this container) or the blob still fails — the
    caller's skip-and-count discipline is unchanged either way."""
    try:
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(blob)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:  # noqa: BLE001 — undecodable blob -> skip row
        return None


def _gif_lzw(data: bytes, mcs: int, expected: int) -> "list[int] | None":
    """GIF-flavor LZW decode → `expected` palette indices, or None.

    Variable code width starting at mcs+1 and growing to 12 bits as
    the dictionary fills; CLEAR resets the dictionary, EOI ends the
    stream (a stream that fills `expected` without an explicit EOI is
    accepted — some writers omit it). Codes are packed LSB-first
    (GIF Appendix F), the opposite bit order of TIFF LZW.
    """
    if not (2 <= mcs <= 11):
        return None
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base: list[tuple[int, ...] | None] = [(i,) for i in range(clear)]
    base += [None, None]  # clear / eoi slots
    table = list(base)
    width = mcs + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out if len(out) == expected else None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                return None
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # the KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            return None
        # grow when the next code would not fit (deferred-clear safe:
        # at 12 bits the width pins and the encoder must emit CLEAR)
        if len(table) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)  # type: ignore[arg-type]
        prev = entry
        if len(out) > expected:
            return None
    return out if len(out) == expected else None


def _decode_gif(blob: bytes) -> "np.ndarray | None":
    """First image frame of a non-interlaced GIF87a/89a as HxWx3 RGB."""
    if len(blob) < 13:
        return None
    packed = blob[10]
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 3 * (1 << ((packed & 7) + 1))
        gct = blob[pos : pos + n]
        if len(gct) < n:
            return None
        pos += n
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x21:  # extension: introducer + label + sub-blocks
            pos += 2
            while pos < len(blob) and blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > len(blob):
                return None
            w, h, ipacked = struct.unpack("<HHB", blob[pos + 5 : pos + 10])
            pos += 10
            ct = gct
            if ipacked & 0x80:  # local color table wins
                n = 3 * (1 << ((ipacked & 7) + 1))
                ct = blob[pos : pos + n]
                if len(ct) < n:
                    return None
                pos += n
            if ipacked & 0x40:  # Adam-style interlace row order: out of scope
                return None
            if ct is None or w <= 0 or h <= 0 or pos >= len(blob):
                return None
            mcs = blob[pos]
            pos += 1
            data = bytearray()
            while pos < len(blob) and blob[pos] != 0:
                ln = blob[pos]
                data += blob[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _gif_lzw(bytes(data), mcs, w * h)
            if idx is None:
                return None
            pal = np.frombuffer(ct, np.uint8).reshape(-1, 3)
            ia = np.asarray(idx, np.int64).reshape(h, w)
            if int(ia.max(initial=0)) >= pal.shape[0]:
                return None
            return np.ascontiguousarray(pal[ia])
        else:  # trailer (0x3B) or junk before any image frame
            return None
    return None


def _png_predictor(
    ftype: int, line: "np.ndarray", prev: "np.ndarray", channels: int
) -> "np.ndarray | None":
    """Undo one PNG scanline filter (spec §9: None/Sub/Up/Average/Paeth).

    Up is vectorized; Sub/Average/Paeth are sequential in the pixel
    dimension by definition (each byte's predictor uses the just-
    reconstructed left neighbor), so they loop — acceptable for a
    fallback codec; a real deployment swaps in Pillow here.
    """
    stride = line.shape[0]
    if ftype == 0:
        return line.copy()
    if ftype == 2:
        return (line + prev) & 0xFF
    if ftype not in (1, 3, 4):
        return None
    cur = np.zeros(stride, np.uint16)
    for i in range(stride):
        a = int(cur[i - channels]) if i >= channels else 0
        if ftype == 1:
            pred = a
        elif ftype == 3:
            pred = (a + int(prev[i])) >> 1
        else:  # Paeth
            b = int(prev[i])
            c = int(prev[i - channels]) if i >= channels else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        cur[i] = (int(line[i]) + pred) & 0xFF
    return cur


def _decode_png(blob: bytes) -> "np.ndarray | None":
    pos = 8
    ihdr: bytes | None = None
    idat = bytearray()
    n = len(blob)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        if pos + 8 + ln > n:
            return None
        if ctype == b"IHDR":
            ihdr = blob[pos + 8 : pos + 8 + ln]
        elif ctype == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + ln]
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if (
        channels is None  # color type 3 (palette) unsupported
        or depth != 8
        or comp != 0
        or filt != 0
        or interlace != 0  # Adam7 unsupported
        or w <= 0
        or h <= 0
    ):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        return None
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    at = 0
    for y in range(h):
        ftype = raw[at]
        line = np.frombuffer(raw, np.uint8, stride, at + 1).astype(np.uint16)
        at += stride + 1
        cur = _png_predictor(ftype, line, prev, channels)
        if cur is None:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif channels == 2:  # gray + alpha: replicate gray, drop alpha
        arr = np.repeat(arr[:, :, :1], 3, axis=2)
    elif channels == 4:
        arr = arr[:, :, :3]
    return np.ascontiguousarray(arr)


def _decode_bmp(blob: bytes) -> "np.ndarray | None":
    try:
        (pix_off,) = struct.unpack("<I", blob[10:14])
        (dib_size,) = struct.unpack("<I", blob[14:18])
        if dib_size < 40:
            return None  # BITMAPCOREHEADER etc. — not worth supporting
        w, h_signed = struct.unpack("<ii", blob[18:26])
        _planes, bpp = struct.unpack("<HH", blob[26:30])
        (compression,) = struct.unpack("<I", blob[30:34])
    except struct.error:
        return None
    if bpp != 24 or compression != 0 or w <= 0 or h_signed == 0:
        return None
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
    if len(blob) < pix_off + stride * h:
        return None
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)
    arr = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:  # positive height = bottom-up row order
        arr = arr[::-1]
    return np.ascontiguousarray(arr)


def _scan_pnm_header(blob: bytes) -> "tuple[int, int, int, int] | None":
    """Parse a binary netpbm header: magic, width, height, maxval —
    ASCII tokens separated by whitespace, '#' comments run to
    end-of-line, then ONE whitespace byte precedes the raster.

    Returns (width, height, maxval, raster_offset) or None.
    """
    pos = 2
    fields: list[int] = []
    n = len(blob)
    while len(fields) < 3 and pos < n:
        c = blob[pos]
        if c == 0x23:  # '#' comment
            while pos < n and blob[pos] not in (0x0A, 0x0D):
                pos += 1
        elif c in (0x20, 0x09, 0x0A, 0x0D):
            pos += 1
        elif 0x30 <= c <= 0x39:
            start = pos
            while pos < n and 0x30 <= blob[pos] <= 0x39:
                pos += 1
            fields.append(int(blob[start:pos]))
        else:
            return None
    if len(fields) < 3 or pos >= n:
        return None
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        return None
    return w, h, maxval, pos


def _decode_pnm(blob: bytes) -> "np.ndarray | None":
    """Binary netpbm: P6 (RGB) / P5 (gray, expanded to RGB)."""
    parsed = _scan_pnm_header(blob)
    if parsed is None:
        return None
    w, h, maxval, pos = parsed
    if maxval != 255:
        return None
    channels = 3 if blob[:2] == b"P6" else 1
    need = w * h * channels
    if len(blob) < pos + need:
        return None
    arr = np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos)
    if channels == 3:
        return np.ascontiguousarray(arr.reshape(h, w, 3))
    return np.ascontiguousarray(
        np.repeat(arr.reshape(h, w, 1), 3, axis=2)
    )


def resize_nearest(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resize of an HxWxC uint8 array via pure index
    arithmetic — deterministic across platforms (no float kernels)."""
    src_h, src_w = arr.shape[:2]
    yi = (np.arange(height) * src_h) // height
    xi = (np.arange(width) * src_w) // width
    return np.ascontiguousarray(arr[yi][:, xi])


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    blobs_df: DataFrame,
    width: int,
    height: int,
    id_col: str = "blob_id",
    blob_col: str = "blob",
    fake: bool = False,
) -> DataFrame:
    """Resize stage: REAL for formats `decode_pixels` handles (24-bit
    BMP, binary PPM/PGM) — numpy nearest-neighbor resample, resized
    raster emitted as raw RGB bytes (row-major HxWx3). Blobs in
    compressed formats (JPEG/PNG/… need a codec library the container
    doesn't ship) degrade to a null `resized` — skip-and-count, never
    abort the batch. `fake=True` keeps the old deterministic
    truncate/pad stub for plumbing tests.

    Arrow batches in, binary column out, no shuffle."""

    def _fake_resize(blob: bytes) -> bytes:
        # deterministic stand-in: truncate/pad to width*height bytes
        target = width * height
        return (blob * (target // max(len(blob), 1) + 1))[:target]

    def _resize(blob: bytes) -> bytes | None:
        if fake:
            return _fake_resize(blob)
        arr = decode_pixels(blob)
        if arr is None:
            return None
        return resize_nearest(arr, width, height).tobytes()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "blob_id": pdf[id_col].values,
                    "width": width,
                    "height": height,
                    "resized": [_resize(b) for b in pdf[blob_col]],
                }
            )

    return blobs_df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def mjpeg_avi_frames(blob: bytes) -> "list[bytes] | None":
    """JPEG payloads of an MJPEG AVI, in stream order — pure stdlib.

    AVI is RIFF: top-level LIST chunks, with the frame data living in
    the 'movi' list as '##dc'/'##db' chunks (optionally nested one
    level inside 'rec ' record lists). For MJPEG each video chunk IS a
    baseline JPEG (SOI..EOI), so real frame *decode* composes with
    operators/jpeg.py — no ffmpeg for this container/codec pair. Other
    containers/codecs still return None (the ffmpeg seam).

    r8: this retires the 'frame sampling is only a byte-slicing stub'
    gap for the one video format a no-dependency engine can own.
    """
    if blob is None or len(blob) < 16:
        return None
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    frames: list[bytes] = []

    def walk(pos: int, end: int, depth: int) -> None:
        while pos + 8 <= end:
            fourcc = blob[pos : pos + 4]
            size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
            body, nxt = pos + 8, pos + 8 + size + (size & 1)
            if nxt > end + 1:
                return  # truncated chunk: stop, keep frames so far
            if fourcc == b"LIST" and depth < 4:
                ltype = blob[body : body + 4]
                if ltype in (b"movi", b"rec ", b"hdrl", b"AVI "):
                    walk(body + 4, min(body + size, end), depth + 1)
            elif (
                len(fourcc) == 4
                and fourcc[:2].isdigit()
                and fourcc[2:4] in (b"dc", b"db")
                and blob[body : body + 2] == b"\xff\xd8"
            ):
                frames.append(bytes(blob[body : body + size]))
            pos = nxt

    walk(12, len(blob), 0)
    return frames or None


def sample_frames(
    blobs_df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "blob_id",
    blob_col: str = "blob",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling (1 video blob → N frame rows) — the U2-shaped
    multimodal expansion. Row expansion happens inside the Arrow batch
    (mapInPandas), so output partitioning inherits the blob
    partitioning — no shuffle.

    Real path (r8): MJPEG AVI blobs are parsed by `mjpeg_avi_frames`
    and evenly strided down to `max_frames` JPEG frames (stride =
    ceil(n/max_frames), frame_idx = source frame number), each
    decodable by decode_pixels' JPEG path. Blobs in any other
    container/codec yield NO rows (skip-and-count discipline — count
    them as `n_blobs - distinct blob_id` downstream); a real deployment
    swaps ffmpeg into exactly this seam. The `fake=True` stub (fixed
    byte-stride slicing) remains for plumbing tests with arbitrary
    bytes."""
    if not fake:
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                    frames = mjpeg_avi_frames(bytes(blob)) if blob else None
                    if not frames:
                        continue
                    stride = max(1, -(-len(frames) // max_frames))
                    for i in range(0, len(frames), stride):
                        rows.append(
                            {
                                "blob_id": int(bid),
                                "frame_idx": i,
                                "frame": frames[i],
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=["blob_id", "frame_idx", "frame"]
                )

        return blobs_df.mapInPandas(run, FRAME_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                for i in range(min(max_frames, max(len(blob), 1) // every_n_bytes + 1)):
                    rows.append(
                        {
                            "blob_id": bid,
                            "frame_idx": i,
                            "frame": blob[i * every_n_bytes : (i + 1) * every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=["blob_id", "frame_idx", "frame"])

    return blobs_df.mapInPandas(run, FRAME_SCHEMA)


def image_ahash(
    blobs_df: DataFrame, id_col: str = "blob_id", blob_col: str = "blob"
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over decoded pixels —
    the image-dedup analog of the text fingerprints: near-identical
    images (re-encodes, container changes) produce the SAME hash, so a
    plain hash-groupBy dedups them, no pairwise comparison.

    Integer-exact by construction (engine-replayable, no float kernel):
    grayscale g = (r+g+b) div 3 per pixel, bit (i mod 64) XOR-toggled
    iff g_i * n_pixels > sum(g) — a strict integer cross-multiplication
    instead of comparing against a float mean. Production shape: resize
    to 8x8 first (resize_images), hash the 64 pixels; here the hash
    covers whatever raster decode_pixels yields. Bit packing fills the
    FULL signed-64 range: for rasters under 64 pixels XOR equals the
    plain `|= 1 << i` (each lane hit once); at exactly 64 pixels bit 63
    lands in the sign bit via a deliberate two's-complement wrap (the
    same convention as the 64-bit SimHash signatures), and larger
    unresized rasters fold onto the 64 lanes — no value ever overflows
    the Arrow int64 boundary (r7 ADVICE: `1 << 63` as a plain int
    raised at pandas->Arrow conversion, a task failure). Decode
    failures yield NULL hash rows (skip-and-count discipline), never
    task failures.
    """
    import numpy as np  # noqa: PLC0415

    schema = f"{id_col} long, phash long, n_pixels long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[blob_col]):
                arr = decode_pixels(bytes(blob))
                if arr is None:
                    rows.append((int(_id), None, None))
                    continue
                g = arr.astype(np.int64).sum(axis=2) // 3
                flat = [int(x) for x in g.flatten()]
                n, tot = len(flat), sum(flat)
                h = 0
                for i, v in enumerate(flat):
                    if v * n > tot:
                        h ^= 1 << (i & 63)
                if h & (1 << 63):  # two's-complement wrap into bigint
                    h -= 1 << 64
                rows.append((int(_id), h, n))
            yield pd.DataFrame(rows, columns=[id_col, "phash", "n_pixels"])

    return blobs_df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Container metadata probe (r9): ISO-BMFF (MP4) box walk + MPEG-audio
# frame walk. The first stage of any multimodal ingest at 100 TB is a
# no-decode structural probe — duration, track layout, codec handlers,
# payload size — so downstream routing (sample / decode / drop) never
# touches codec libraries. Both parsers are pure stdlib and run inside
# one Arrow-batched mapInPandas (no shuffle; output partitioning
# inherits the blob frame's).

#: ISO-BMFF boxes that contain child boxes (walked recursively).
_BMFF_CONTAINERS = frozenset(
    {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}
)

#: MPEG1 Layer III bitrate table (kbps), index 1..14 (0/15 invalid).
_MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
#: MPEG1 sample rates by 2-bit index (index 3 reserved).
_MP3_RATES = (44100, 48000, 32000)


def parse_mp4(blob: bytes) -> dict | None:
    """Generic ISO-BMFF (MP4/MOV, ISO 14496-12) metadata probe.

    Walks the box tree: 32-bit sizes, size==1 -> 64-bit largesize,
    size==0 -> box extends to end-of-enclosure; recurses into container
    boxes; reads `ftyp` major brand, `mvhd` timescale/duration (version
    0's 32-bit and version 1's 64-bit layouts), every `hdlr` handler
    fourcc in document order, and total `mdat` payload bytes. Returns
    None on any structural corruption (box overruns its enclosure,
    truncated header) — skip-and-count, never a garbage row.
    """
    meta = {
        "major_brand": None,
        "timescale": None,
        "duration_units": None,
        "n_tracks": 0,
        "handlers": [],
        "payload_bytes": 0,
    }

    def walk(pos: int, end: int, depth: int) -> bool:
        while pos < end:
            if pos + 8 > end:
                return False
            size = int.from_bytes(blob[pos : pos + 4], "big")
            typ = blob[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return False
                size = int.from_bytes(blob[pos + 8 : pos + 16], "big")
                hdr = 16
            elif size == 0:  # to end of enclosure
                size = end - pos
            if size < hdr or pos + size > end:
                return False
            body, bend = pos + hdr, pos + size
            if typ == b"ftyp" and body + 4 <= bend:
                meta["major_brand"] = blob[body : body + 4].decode(
                    "ascii", "replace"
                )
            elif typ == b"mvhd" and body + 1 <= bend:
                v = blob[body]
                # v0: ver/flags,ctime,mtime = 12 bytes before timescale;
                # v1 widens ctime/mtime to 8 bytes each (20 before).
                off, dw = (body + 12, 4) if v == 0 else (body + 20, 8)
                if off + 4 + dw > bend:
                    return False
                meta["timescale"] = int.from_bytes(
                    blob[off : off + 4], "big"
                )
                meta["duration_units"] = int.from_bytes(
                    blob[off + 4 : off + 4 + dw], "big"
                )
            elif typ == b"hdlr" and body + 12 <= bend:
                meta["handlers"].append(
                    blob[body + 8 : body + 12].decode("ascii", "replace")
                )
            elif typ == b"trak":
                meta["n_tracks"] += 1
            elif typ == b"mdat":
                meta["payload_bytes"] += size - hdr
            if typ in _BMFF_CONTAINERS and depth < 8:
                if not walk(body, bend, depth + 1):
                    return False
            pos = bend
        return True

    if len(blob) < 12 or blob[4:8] != b"ftyp":
        return None
    if not walk(0, len(blob), 0):
        return None
    if meta["timescale"] is None or not meta["timescale"]:
        return None
    return meta


def _mp3_frame_len(b1: int, b2: int) -> int | None:
    """Frame length from an MPEG1 Layer III header's 2nd/3rd bytes."""
    if (b1 >> 3) & 3 != 3 or (b1 >> 1) & 3 != 1:  # MPEG1, Layer III
        return None
    bi, ri = (b2 >> 4) & 15, (b2 >> 2) & 3
    if bi in (0, 15) or ri == 3:
        return None
    return 144 * _MP3_BITRATES[bi] * 1000 // _MP3_RATES[ri] + ((b2 >> 1) & 1)


def parse_mp3(blob: bytes) -> dict | None:
    """MPEG1 Layer III frame walk: count whole frames from the header
    chain (sync + bitrate/sample-rate indices + padding bit decide each
    frame's byte length — no decode). Stops at the first bad sync or a
    truncated final frame; None if no complete frame parses. Duration
    is exact integer math: 1152 samples per MPEG1 Layer III frame.
    """
    pos, n_frames, sr, br = 0, 0, None, None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF or (blob[pos + 1] & 0xE0) != 0xE0:
            break
        flen = _mp3_frame_len(blob[pos + 1], blob[pos + 2])
        if flen is None or pos + flen > len(blob):
            break
        if n_frames == 0:
            sr = _MP3_RATES[(blob[pos + 2] >> 2) & 3]
            br = _MP3_BITRATES[(blob[pos + 2] >> 4) & 15]
        n_frames += 1
        pos += flen
    if n_frames == 0:
        return None
    return {
        "sample_rate": sr,
        "bitrate_kbps": br,
        "n_frames": n_frames,
        "duration_units": n_frames * 1152,
        "payload_bytes": pos,
    }


#: Metadata columns of the container probe (after the pass-through
#: key). duration_ms = duration_units * 1000 // timescale for both
#: containers (mvhd units / movie timescale; PCM samples / sample rate).
_PROBE_META = (
    "container string, major_brand string, n_tracks long, "
    "handlers string, timescale long, duration_units long, "
    "duration_ms long, payload_bytes long"
)


def probe_containers(
    blobs_df: DataFrame, id_col: str = "blob_id", blob_col: str = "blob"
) -> DataFrame:
    """Sniff-and-route structural probe over a binary column: `ftyp` at
    offset 4 -> ISO-BMFF walk; 11-bit MPEG sync -> frame walk;
    anything else -> all-NULL metadata row (skip-and-count). Map-only:
    one Arrow batch in, one typed batch out, no shuffle."""
    schema = f"{id_col} long, {_PROBE_META}"
    names = [
        c.strip().split(" ")[0] for c in schema.split(",")
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                null = (int(_id),) + (None,) * 8
                if len(b) >= 8 and b[4:8] == b"ftyp":
                    m = parse_mp4(b)
                    if m is None:
                        rows.append(null)
                        continue
                    rows.append((
                        int(_id), "mp4", m["major_brand"],
                        m["n_tracks"], ",".join(m["handlers"]),
                        m["timescale"], m["duration_units"],
                        m["duration_units"] * 1000 // m["timescale"],
                        m["payload_bytes"],
                    ))
                elif len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0:
                    m = parse_mp3(b)
                    if m is None:
                        rows.append(null)
                        continue
                    rows.append((
                        int(_id), "mp3", None, 1, "soun",
                        m["sample_rate"], m["duration_units"],
                        m["duration_units"] * 1000 // m["sample_rate"],
                        m["payload_bytes"],
                    ))
                else:
                    rows.append(null)
            yield pd.DataFrame(rows, columns=names)

    return blobs_df.mapInPandas(run, schema)


# ------------------------------------------------- TAR member walk (r10)


def tar_members(
    blobs_df: DataFrame, id_col: str = "shard_id", blob_col: str = "blob"
) -> DataFrame:
    """Member listing of USTAR archives in a binary column — the
    WebDataset-shard indexing primitive (multimodal training data ships
    as tar shards of {key}.{ext} member groups; indexing them is the
    first pass of every loader/curation job over such corpora).

    Hand-rolled 512-byte header walk (name NUL-terminated at offset 0,
    size as octal ASCII at 124:136, typeflag at 156) — deliberately NOT
    the stdlib tarfile reader, so fixture construction (which may use
    stdlib) and this parser are independent implementations. Regular
    members only (typeflag '0' or NUL); a corrupt header ends the walk
    for that blob (emitting what parsed so far) rather than failing the
    task. Map-only: one Arrow batch in, one exploded typed batch out,
    no shuffle; cost is O(members), not O(bytes) — data blocks are
    skipped by offset arithmetic.
    """
    schema = f"{id_col} long, name string, size long, offset long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                pos = 0
                while pos + 512 <= len(b):
                    hdr = b[pos : pos + 512]
                    if hdr == b"\x00" * 512:  # end-of-archive marker
                        break
                    name = hdr[0:100].split(b"\x00", 1)[0].decode(
                        "utf-8", "replace"
                    )
                    try:
                        size = int(
                            hdr[124:136].split(b"\x00", 1)[0].strip() or b"0",
                            8,
                        )
                    except ValueError:  # corrupt header: stop this blob
                        break
                    typeflag = hdr[156:157]
                    if typeflag in (b"0", b"\x00"):
                        rows.append((int(_id), name, size, pos))
                    pos += 512 + ((size + 511) // 512) * 512
            yield pd.DataFrame(
                rows, columns=[id_col, "name", "size", "offset"]
            )

    return blobs_df.mapInPandas(run, schema)


# --------------------------------------------- ZIP central directory (r10)


def zip_central_directory(
    blobs_df: DataFrame, id_col: str = "blob_id", blob_col: str = "blob"
) -> DataFrame:
    """Member listing of ZIP archives via the END-anchored walk real
    tooling uses: scan back from the tail for the EOCD signature
    (PK\\x05\\x06, comment-tolerant within the trailing 64 KiB), read
    the central-directory offset/size/count, then walk the 46-byte CD
    entries — never the local headers, so listing cost is
    O(members + comment), independent of archive size; this is what
    makes ZIP randomly accessible where tar must stream. As real
    tooling does, the recorded cd_off is corrected by the delta
    between the EOCD's actual position and ``cd_off + cd_size`` —
    archives with PREPENDED data (self-extracting zips, tail-of-
    stream captures) record offsets relative to the original archive
    start, so both the CD position and every member's local-header
    offset shift by that delta. ZIP64 archives (0xFFFF member-count /
    0xFFFFFFFF offset-size sentinels in the EOCD) are explicitly
    SKIPPED (zero rows for that id) rather than misparsed — the
    46-byte walk would need the ZIP64 EOCD locator. Corrupt or
    signature-less blobs likewise yield zero rows (skip-and-count
    discipline). Map-only Arrow batches, no shuffle."""
    import struct as _struct  # noqa: PLC0415

    schema = (
        f"{id_col} long, name string, method int, usize long, "
        "csize long, crc32 long, lho long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                tail = b[-(65536 + 22):]
                at = tail.rfind(b"PK\x05\x06")
                if at < 0 or at + 22 > len(tail):
                    continue
                n_total, cd_size, cd_off = _struct.unpack(
                    "<HII", tail[at + 10 : at + 20]
                )
                if (
                    n_total == 0xFFFF
                    or cd_size == 0xFFFFFFFF
                    or cd_off == 0xFFFFFFFF
                ):  # ZIP64 sentinel: skip, don't misparse
                    continue
                # prepended-data correction: the EOCD sits immediately
                # after the CD, so its true position minus
                # (cd_off + cd_size) is the shift every recorded
                # offset needs (0 for archives with nothing prepended)
                eocd_pos = len(b) - len(tail) + at
                delta = eocd_pos - (cd_off + cd_size)
                if delta < 0:  # offsets past the EOCD: corrupt
                    continue
                pos, seen = cd_off + delta, 0
                while seen < n_total and pos + 46 <= len(b):
                    if b[pos : pos + 4] != b"PK\x01\x02":
                        break
                    (method,) = _struct.unpack("<H", b[pos + 10 : pos + 12])
                    crc, csize, usize = _struct.unpack(
                        "<III", b[pos + 16 : pos + 28]
                    )
                    nlen, elen, clen = _struct.unpack(
                        "<HHH", b[pos + 28 : pos + 34]
                    )
                    (lho,) = _struct.unpack("<I", b[pos + 42 : pos + 46])
                    name = b[pos + 46 : pos + 46 + nlen].decode(
                        "utf-8", "replace"
                    )
                    # local-header offsets shift by the same prepend
                    # delta (stdlib zipfile's `concat` correction)
                    rows.append(
                        (int(_id), name, method, usize, csize, crc,
                         lho + delta)
                    )
                    pos += 46 + nlen + elen + clen
                    seen += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "name", "method", "usize", "csize", "crc32", "lho"
                ],
            )

    return blobs_df.mapInPandas(run, schema)
