"""Semi-structured JSON helpers (Spark 4 VariantType).

The typed `from_json` schema in jobs/pipelines.py is the fast path for
the WAT envelope, but HTTP headers are *dynamically* typed in real WAT
data — `Link` / `Content-Location` can hold a string or a list of
strings (the reference handles both, wat_extract_links.py:158-177),
and a typed `map<string,string>` stringifies list values into JSON
text (`'["<a>",...]'`), corrupting link extraction. VariantType keeps
the dynamic shape queryable: one `try_parse_json`, a cast of the
Headers object to `map<string, variant>`, then per-entry scalar-or-
array resolution — all JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEADERS_PATH = "$.Envelope.Payload-Metadata.HTTP-Response-Metadata.Headers"


def _string_or_list(value_variant: Column) -> Column:
    """variant holding a JSON string or list of strings → array<string>.

    Non-string/list shapes (objects, numbers) resolve to null elements
    and are filtered out — reference skip semantics.
    """
    return F.filter(
        F.coalesce(
            F.try_variant_get(value_variant, "$", "array<string>"),
            F.array(F.try_variant_get(value_variant, "$", "string")),
        ),
        lambda x: x.isNotNull(),
    )


def wat_header_links_variant(payload_text: Column | str) -> Column:
    """All link URLs from WAT HTTP headers, list-or-scalar tolerant and
    header-name case-insensitive.

    Returns array<string>: every Content-Location value plus every
    `<url>` target from Link header values, whether the JSON holds one
    string or a list (wat_extract_links.py:158-177 parity).
    """
    col = F.expr(payload_text) if isinstance(payload_text, str) else payload_text
    hdr_map = F.try_variant_get(F.try_parse_json(col), _HEADERS_PATH, "map<string, variant>")
    links = F.flatten(
        F.transform(
            F.filter(
                F.map_entries(hdr_map),
                lambda e: F.lower(e["key"]).isin("content-location", "link"),
            ),
            lambda e: F.when(
                F.lower(e["key"]) == "content-location", _string_or_list(e["value"])
            ).otherwise(
                F.flatten(
                    F.transform(
                        _string_or_list(e["value"]),
                        lambda s: F.regexp_extract_all(s, F.lit("<([^>]*)>"), F.lit(1)),
                    )
                )
            ),
        )
    )
    return F.coalesce(links, F.array().cast("array<string>"))
