"""HTML→text extraction (F12/F13) with pluggable backends.

The reference plugs BeautifulSoup or Resiliparse behind `--html_parser`
(bs4_parser.py / resiliparse_parser.py). Neither ships in this
environment, so the default backend is a JVM-side regex pipeline —
strip <script>/<style> blocks, drop tags, collapse whitespace — which
keeps the hot path in whole-stage codegen (at 100 TB the HTML-to-text
step dominates; a C-backed parser UDF is a drop-in via
`html_to_text_udf` when available).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def html_to_text(col: Column | str) -> Column:
    """Regex-backend text extraction, pure column expressions."""
    c = F.col(col) if isinstance(col, str) else col
    no_script = F.regexp_replace(c, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    no_tags = F.regexp_replace(no_script, r"(?s)<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def html_to_text_udf_factory():
    """bs4 backend if importable (parser-plugin parity); else None."""
    try:
        from bs4 import BeautifulSoup  # noqa: PLC0415
    except ImportError:
        return None
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    def extract(series: pd.Series) -> pd.Series:
        def one(html):
            if html is None:
                return None
            soup = BeautifulSoup(html, "lxml")
            for tag in soup(["script", "style"]):
                tag.extract()
            return soup.get_text(" ", strip=True)

        return series.map(one)

    return F.pandas_udf(extract, T.StringType())
