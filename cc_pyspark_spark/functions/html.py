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


#: Minimal named-entity map for the JVM-side decode chain — the
#: high-frequency entities bs4 resolves (general numeric &#NNN;
#: references stay literal — they need a character table, i.e. a UDF).
#: Order matters: &amp; must decode LAST so "&amp;lt;" ends up as the
#: text "&lt;", exactly as a browser/bs4 renders it.
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def html_to_text(col: Column | str) -> Column:
    """Regex-backend text extraction, pure column expressions.

    Strips comments and CDATA sections *before* tag removal (both can
    contain literal ``<``/``>`` that would otherwise desync the tag
    regex — the bs4-divergence classes noted in round 1), then tags,
    then decodes the common HTML entities, then collapses whitespace.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_comment = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    no_cdata = F.regexp_replace(no_comment, r"(?s)<!\[CDATA\[.*?\]\]>", " ")
    no_script = F.regexp_replace(
        no_cdata, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    no_tags = F.regexp_replace(no_script, r"(?s)<[^>]*>", " ")
    decoded = no_tags
    for ent, rep in _ENTITIES:
        decoded = F.regexp_replace(decoded, ent, rep)
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))


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


def resiliparse_udf_factory():
    """Resiliparse backend if importable — the reference's third parser
    plugin (resiliparse_parser.py:11-36: HTMLTree.parse +
    extract_plain_text); else None. Import-guarded exactly like bs4."""
    try:
        from resiliparse.extract.html2text import extract_plain_text  # noqa: PLC0415
        from resiliparse.parse.html import HTMLTree  # noqa: PLC0415
    except ImportError:
        return None
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    def extract(series: pd.Series) -> pd.Series:
        def one(html):
            if html is None:
                return None
            tree = HTMLTree.parse(html)
            return extract_plain_text(tree, main_content=False, alt_texts=False)

        return series.map(one)

    return F.pandas_udf(extract, T.StringType())


def stdlib_udf_factory():
    """Real tokenizer backend with NO external dependency: the stdlib
    `html.parser` state machine. Unlike the regex backend it decodes
    every character reference (numeric included), survives malformed
    tags that would desync a regex, and tracks script/style nesting —
    the always-available middle ground between regex and bs4/resiliparse
    (which need libraries this environment doesn't ship)."""
    import re  # noqa: PLC0415
    from html.parser import HTMLParser  # noqa: PLC0415

    from pyspark.sql import types as T  # noqa: PLC0415

    class _Extract(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.chunks: list[str] = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1
            self.chunks.append(" ")

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self.skip:
                self.skip -= 1
            self.chunks.append(" ")

        def handle_data(self, data):
            if not self.skip:
                self.chunks.append(data)

    ws = re.compile(r"\s+")

    # NOTE: no pd.Series annotations — under `from __future__ import
    # annotations` pandas_udf resolves hint STRINGS against module
    # globals, and pd is factory-local here; pass returnType explicitly.
    def extract(series):
        def one(html):
            if html is None:
                return None
            p = _Extract()
            p.feed(html)
            p.close()
            return ws.sub(" ", "".join(p.chunks)).strip()

        return series.map(one)

    return F.pandas_udf(extract, T.StringType())


def _udf_backend(factory):
    """Wrap a maybe-absent pandas-UDF factory as a Column-producer."""
    udf = factory()
    if udf is None:
        return None
    return lambda col: udf(F.col(col) if isinstance(col, str) else col)


#: name → factory returning a Column-producer (or None when the lib is
#: absent). "regex" is always available; the reference's `--html_parser`
#: flag maps onto these names (beautifulsoup/resiliparse).
_BACKENDS = {
    "regex": lambda: html_to_text,
    "stdlib": lambda: _udf_backend(stdlib_udf_factory),
    "beautifulsoup": lambda: _udf_backend(html_to_text_udf_factory),
    "resiliparse": lambda: _udf_backend(resiliparse_udf_factory),
}


def available_backends() -> tuple[str, ...]:
    """Backends usable in this environment (regex always; bs4 and
    resiliparse when their libraries import)."""
    return tuple(n for n in _BACKENDS if _BACKENDS[n]() is not None)


def html_backend(name: str = "regex"):
    """Column-producer for the named backend: fn(col) -> text Column.

    Raises ValueError for unknown names and ImportError-shaped
    RuntimeError when the backend's library is absent — mirroring the
    reference's `--html_parser` plugin selection.
    """
    if name not in _BACKENDS:
        raise ValueError(f"unknown html parser backend: {name!r}")
    fn = _BACKENDS[name]()
    if fn is None:
        raise RuntimeError(
            f"html parser backend {name!r} requires a library that is "
            "not installed in this environment"
        )
    return fn
