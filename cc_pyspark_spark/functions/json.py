"""Semi-structured JSON helpers (Spark 4 VariantType).

The typed `from_json` schema in jobs/pipelines.py is the fast path for
the WAT envelope, but JSON headers are *dynamically* typed in real WAT
data — `Link` can be a string or a list of strings
(wat_extract_links.py:164-177 handles both). VariantType keeps the
dynamic shape queryable without a schema: `parse_json` once, then
`variant_get` typed probes — both scalar and list variants resolve.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEADERS_PATH = "$.Envelope.Payload-Metadata.HTTP-Response-Metadata.Headers"


def wat_header_links_variant(payload_text: Column | str) -> Column:
    """All link URLs from WAT HTTP headers, list-or-scalar tolerant.

    Returns array<string>: Content-Location values plus `<url>` targets
    from Link headers, whether the JSON holds a string or an array.
    """
    col = F.expr(payload_text) if isinstance(payload_text, str) else payload_text
    v = F.try_parse_json(col)

    def header(name: str) -> Column:
        return F.expr(
            f"variant_get(try_parse_json({payload_text}), "
            f"'{_HEADERS_PATH}.{name}', 'variant')"
        ) if isinstance(payload_text, str) else F.try_variant_get(
            v, f"{_HEADERS_PATH}.{name}", "variant"
        )

    def as_string_array(var: Column) -> Column:
        # scalar string → single-element array; JSON array → cast through
        scalar = F.try_variant_get(var, "$", "string")
        arr = F.try_variant_get(var, "$", "array<string>")
        return F.coalesce(
            arr, F.when(scalar.isNotNull(), F.array(scalar)), F.array().cast("array<string>")
        )

    cloc = as_string_array(header("Content-Location"))
    link_raw = as_string_array(header("Link"))
    link_urls = F.flatten(
        F.transform(
            link_raw,
            lambda s: F.regexp_extract_all(s, F.lit("<([^>]*)>"), F.lit(1)),
        )
    )
    return F.concat(cloc, link_urls)
