"""Charset detection/decode fallback chain (F13/F14).

Reference behavior (sparkcc.py:609-615, sitemaps_from_robotstxt
fetch path): try UTF-8 first; on failure fall back to the charset the
cc-index / HTTP headers declared; finally decode latin-1 with
replacement, which cannot fail. No external charset-detector library is
bundled, so the declared charset IS the detection signal — the same
chain the reference runs when `EncodingDetector` is absent.

`decode_bytes` is plain Python for the Arrow worker path;
`decode_payload` is its vectorized pandas-UDF twin for DataFrame use.
"""

from __future__ import annotations

import codecs

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize(charset: str | None) -> str | None:
    if not charset:
        return None
    name = charset.strip().strip('"').strip("'").lower()
    if not name:
        return None
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


#: BOM → codec, longest-prefix first (UTF-32 BOMs start with UTF-16's).
_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def sniff_bom(data: bytes) -> str | None:
    """Byte-order-mark detection — the cheap prefix of the reference's
    EncodingDetector chain (its detector also starts with the BOM)."""
    for bom, codec in _BOMS:
        if data.startswith(bom):
            return codec
    return None


def decode_bytes(data: bytes | None, charset: str | None = None) -> str | None:
    """BOM → utf-8 strict → declared charset strict → latin-1 replace."""
    if data is None:
        return None
    bom = sniff_bom(data)
    if bom:
        try:
            text = data.decode(bom)
            # utf-8-sig strips its BOM itself; strip the UTF-16/32 one
            return text.lstrip("\ufeff")
        except UnicodeDecodeError:
            pass
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        pass
    cs = _normalize(charset)
    if cs and cs != "utf-8":
        try:
            return data.decode(cs)
        except (UnicodeDecodeError, LookupError):
            pass
    return data.decode("latin-1", "replace")


@F.pandas_udf(T.StringType())
def _decode_payload_udf(payload: pd.Series, charset: pd.Series) -> pd.Series:
    return pd.Series(
        [decode_bytes(p, c) for p, c in zip(payload, charset)], dtype="object"
    )


def decode_payload(payload_col: str | Column, charset_col: str | Column) -> Column:
    """Column form of the decode chain (Arrow-batched, not per-row)."""
    p = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    c = F.col(charset_col) if isinstance(charset_col, str) else charset_col
    return _decode_payload_udf(p, c.cast("string"))
