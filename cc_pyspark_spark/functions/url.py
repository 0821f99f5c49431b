"""URL/host functions (SURVEY.md §2.8 F5-F10).

`F.parse_url` covers host extraction (F5) JVM-side. SURT host keys
(F7, wat_extract_links.py:344-407) and URL resolution (F6, urljoin)
have no Spark builtin — they run as Arrow-batched pandas UDFs, the
sanctioned slow path. The SURT logic is a fresh implementation of the
documented behavior: http(s) fast-path, IP exclusion, www-strip,
per-label IDNA, length checks, label reversal.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin as _urljoin
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HOST_FAST = re.compile(r"^https?://([a-zA-Z0-9_.-]{2,253})(?::\d+)?(?:[/?#]|$)")
_IP_LIKE = re.compile(r"^\d{1,3}(?:\.\d{1,3}){3}$")

#: Full public IANA registry snapshot (F10) — parity with the
#: reference's vendored list (iana_tld.py:4). Deployments tracking
#: newer delegations can still inject their own set; validation is
#: `isin`/broadcast-join either way.
from cc_pyspark_spark.functions.iana_tlds import IANA_TLDS

DEFAULT_TLDS = IANA_TLDS


def surt_host(url: str | None) -> str | None:
    """Reversed-label host key: `http://www.Example.com/x` → `com.example`."""
    if not url:
        return None
    m = _HOST_FAST.match(url)
    if m:
        host = m.group(1)
    else:
        try:
            host = urlparse(url).hostname
        except ValueError:
            return None
        if not host:
            return None
    host = host.strip(".").lower()
    if not host or _IP_LIKE.match(host):
        return None
    if host.startswith("www.") and host.count(".") > 1:
        host = host[4:]
    labels = host.split(".")
    out = []
    for label in labels:
        if not label or len(label) > 63:
            return None
        if not label.isascii():
            try:
                label = label.encode("idna").decode("ascii")
            except UnicodeError:
                return None
        out.append(label)
    if len(".".join(out)) > 253:
        return None
    return ".".join(reversed(out))


def _surt_series(urls: pd.Series) -> pd.Series:
    return urls.map(surt_host)


def _urljoin_series(base: pd.Series, link: pd.Series) -> pd.Series:
    def join(b, l):
        if l is None:
            return None
        try:
            return _urljoin(b or "", l)
        except ValueError:
            return None

    return pd.Series([join(b, l) for b, l in zip(base, link)])


surt_host_udf = F.pandas_udf(_surt_series, T.StringType())
urljoin_udf = F.pandas_udf(_urljoin_series, T.StringType())


def host_of(col: str) -> F.Column:
    """F5: lower-cased hostname of a URL column (JVM-side parse_url)."""
    return F.lower(F.parse_url(F.col(col), F.lit("HOST")))


def reverse_host(col: str) -> F.Column:
    """F8: `example.com` → `com.example` (pure column expression)."""
    return F.concat_ws(".", F.reverse(F.split(F.col(col), "[.]")))


def tld_is_valid(col: str, tlds: frozenset[str] = DEFAULT_TLDS) -> F.Column:
    """F10: first label of a rev-host is a known TLD (isin — Catalyst
    folds this to a hash-set probe; for huge lists use a broadcast join)."""
    return F.split(F.col(col), "[.]").getItem(0).isin(list(tlds))


def register_sql_functions(spark) -> None:
    """Expose the Python-side scalar library to SQL users
    (`SELECT surt_host(url) FROM ...`) — parity with the reference's
    registered UDFs (hostlinks_to_graph.py:86-94)."""
    spark.udf.register("surt_host", surt_host, T.StringType())
    spark.udf.register(
        "url_join",
        lambda b, l: _urljoin(b or "", l) if l is not None else None,
        T.StringType(),
    )


#: Tracking query parameters stripped by canonicalize_url (the de facto
#: standard remove-list: UTM campaign tags + click ids). The trailing
#: ``(=|$)`` also catches the VALUELESS form (``?fbclid``,
#: ``?utm_source`` with no ``=``) — real crawls carry both, and a
#: surviving bare click id would split one canonical URL in two.
TRACKING_PARAM_PATTERN = "^(utm_[a-z]+|fbclid|gclid|msclkid)(=|$)"


def canonicalize_url(col: F.Column | str) -> F.Column:
    """Crawl-style URL canonicalization as a PURE Catalyst expression —
    no Python, runs at scan throughput:

    * scheme + host lower-cased; ``www.`` stripped when the host keeps
      >= 2 labels; DEFAULT ports dropped (http:80 / https:443) while
      non-default ports are preserved — they name distinct origins
      (recovered from AUTHORITY; parse_url has no PORT part);
    * fragment dropped (parse_url never returns it);
    * tracking query params removed (``utm_*``, fbclid, gclid,
      msclkid), remaining params sorted bytewise, ``?`` dropped when
      nothing survives;
    * percent-encoding left as-is (documented non-goal: unreserved-
      character normalization needs a decode table, i.e. a UDF — the
      cheap rules above already collapse the overwhelming majority of
      real-crawl duplicate URLs).

    NULL/unparseable URLs (no host) canonicalize to NULL.
    """
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    host = F.when(
        host.startswith("www.") & (F.size(F.split(host, "[.]")) > 2),
        F.regexp_replace(host, "^www[.]", ""),
    ).otherwise(host)
    # parse_url has no PORT part and HOST excludes it — recover the
    # port from AUTHORITY and keep it unless it is the scheme default
    # (a NON-default port names a different resource; dropping it would
    # merge distinct origins).
    port = F.regexp_extract(
        F.coalesce(F.try_parse_url(u, F.lit("AUTHORITY")), F.lit("")),
        ":(\\d+)$",
        1,
    )
    default_port = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")
    ).otherwise(F.lit(""))
    portpart = F.when(
        (port != "") & (port != default_port), F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    query = F.try_parse_url(u, F.lit("QUERY"))
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        host.isNull() | (host == "") | scheme.isNull(),
        F.lit(None).cast(T.StringType()),
    ).otherwise(F.concat(scheme, F.lit("://"), host, portpart, path, qpart))
