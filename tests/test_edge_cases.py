"""Charset / IDNA / malformed-input edge cases (SURVEY §7 hard part 5:
the reference's utf-16 / latin-1 / punycode corpus as unit tests) plus
hypothesis round-trip properties for the WARC layer.
"""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from cc_pyspark_spark.functions.url import surt_host
from cc_pyspark_spark.sources.warcio_lite import (
    WarcWriter,
    http_response_block,
    iter_warc_records,
    read_record_at,
)


# ------------------------------------------------------------- SURT edge cases


def test_surt_basic_and_www_strip():
    assert surt_host("http://www.Example.COM/x") == "com.example"
    assert surt_host("https://sub.example.co.uk/p?q=1") == "uk.co.example.sub"
    # two-label www host: www. kept (stripping would leave one label),
    # labels still reversed
    assert surt_host("http://www.example/") == "example.www"


def test_surt_ip_hosts_excluded():
    assert surt_host("http://192.168.0.1/x") is None
    assert surt_host("http://10.0.0.255:8080/") is None


def test_surt_trailing_dot_and_case():
    assert surt_host("http://Example.Org./p") == "org.example"


def test_surt_idn_punycode():
    # unicode host → per-label IDNA (punycode)
    assert surt_host("http://bücher.example.com/") == "com.example.xn--bcher-kva"


def test_surt_invalid_inputs():
    assert surt_host(None) is None
    assert surt_host("") is None
    assert surt_host("not a url") is None
    assert surt_host("ftp://example.com/x") == "com.example"  # via urlparse fallback
    assert surt_host("http://" + "a" * 64 + ".com/") is None  # label > 63
    assert surt_host("http://" + ("a" * 60 + ".") * 5 + "com/") is None  # host > 253


def test_surt_port_and_userinfo():
    assert surt_host("http://example.com:8080/x") == "com.example"


# ---------------------------------------------------- charset edge cases


def _robots_record(body: bytes, url: str = "http://h.example.com/robots.txt"):
    buf = io.BytesIO()
    w = WarcWriter(buf)
    block = http_response_block(body, headers=[("Content-Type", "text/plain")])
    w.write_record(
        "response", block, target_uri=url,
        content_type="application/http; msgtype=response",
    )
    return buf.getvalue()


def test_utf16_robots_body_degrades_without_failing(spark):
    """utf-16 bytes are not valid utf-8: the lenient decode mangles them
    and no sitemap lines match — record skipped, task never fails
    (reference counts it invalid, test_sitemaps_from_robotstxt:365-384)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from cc_pyspark_spark.jobs.pipelines import sitemaps_from_robotstxt
    from cc_pyspark_spark.sources.warc import WARC_RECORD_SCHEMA

    body = "Sitemap: http://h.example.com/s.xml\r\n".encode("utf-16")
    raw = _robots_record(body)
    recs = list(iter_warc_records(raw))
    rows = [
        {
            "warc_filename": "f", "warc_record_offset": 0,
            "warc_record_length": 1, "record_type": "response",
            "content_type": recs[0].content_type,
            "target_uri": recs[0].target_uri, "warc_date": None,
            "warc_ip_address": None, "identified_payload_type": None,
            "http_status": 200, "http_headers": recs[0].http_headers,
            "payload": bytes(recs[0].payload),
        }
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), WARC_RECORD_SCHEMA)
    out = sitemaps_from_robotstxt(df).collect()
    assert out == []  # degraded, not crashed


def test_latin1_sitemap_url_strict_decode_skip(spark):
    """Invalid-UTF-8 sitemap URLs are dropped and counted — reference
    `decode("utf-8","strict")` skip semantics (r6; previously the
    lenient-decode U+FFFD form was emitted)."""
    import pandas as pd

    from cc_pyspark_spark.jobs.pipelines import (
        sitemaps_from_robotstxt,
        sitemaps_metrics,
    )
    from cc_pyspark_spark.sources.warc import WARC_RECORD_SCHEMA

    body = "Sitemap: http://h.example.com/sitemäp.xml\r\n".encode("latin-1")
    raw = _robots_record(body)
    rec = next(iter(iter_warc_records(raw)))
    rows = [
        {
            "warc_filename": "f", "warc_record_offset": 0,
            "warc_record_length": 1, "record_type": "response",
            "content_type": rec.content_type, "target_uri": rec.target_uri,
            "warc_date": None, "warc_ip_address": None,
            "identified_payload_type": None, "http_status": 200,
            "http_headers": rec.http_headers, "payload": bytes(rec.payload),
        }
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), WARC_RECORD_SCHEMA)
    assert sitemaps_from_robotstxt(df).collect() == []
    m = sitemaps_metrics(df).collect()[0]
    assert m["sitemap_urls_found"] == 1
    assert m["sitemap_url_invalid_encoding"] == 1
    assert m["robots_txt_announcing_sitemap"] == 0


def test_many_sitemaps_in_one_robots(spark):
    """>50 sitemap lines (the reference's outlier threshold) all extracted."""
    import pandas as pd

    from cc_pyspark_spark.jobs.pipelines import sitemaps_from_robotstxt
    from cc_pyspark_spark.sources.warc import WARC_RECORD_SCHEMA

    body = "".join(
        f"Sitemap: http://h.example.com/s{i}.xml\r\n" for i in range(60)
    ).encode()
    rec = next(iter(iter_warc_records(_robots_record(body))))
    rows = [
        {
            "warc_filename": "f", "warc_record_offset": 0,
            "warc_record_length": 1, "record_type": "response",
            "content_type": rec.content_type, "target_uri": rec.target_uri,
            "warc_date": None, "warc_ip_address": None,
            "identified_payload_type": None, "http_status": 200,
            "http_headers": rec.http_headers, "payload": bytes(rec.payload),
        }
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), WARC_RECORD_SCHEMA)
    assert sitemaps_from_robotstxt(df).count() == 60


# ------------------------------------------------- hypothesis round-trips

payload_strategy = st.binary(min_size=0, max_size=2048)
uri_strategy = st.from_regex(r"http://[a-z]{1,10}\.example\.com/[a-z0-9]{0,8}", fullmatch=True)


@settings(max_examples=30, deadline=None)
@given(
    payloads=st.lists(st.tuples(uri_strategy, payload_strategy), min_size=1, max_size=8),
    gz=st.booleans(),
)
def test_warc_roundtrip_property(payloads, gz):
    """Writer→reader round-trip preserves count, order, URIs, payload
    bytes, and (offset, length) coordinates — plain and gzip-member."""
    buf = io.BytesIO()
    w = WarcWriter(buf, gzip_members=gz)
    for uri, payload in payloads:
        w.write_record("conversion", payload, target_uri=uri,
                       content_type="text/plain")
    raw = buf.getvalue()
    recs = list(iter_warc_records(raw))
    assert len(recs) == len(payloads)
    for rec, (uri, payload) in zip(recs, payloads):
        assert rec.target_uri == uri
        assert rec.payload == payload
    assert [(r.offset, r.length) for r in recs] == w.coordinates


@settings(max_examples=15, deadline=None)
@given(
    payloads=st.lists(st.tuples(uri_strategy, payload_strategy), min_size=2, max_size=6),
    gz=st.booleans(),
)
def test_ranged_access_property(tmp_path_factory, payloads, gz):
    """Every (offset, length) coordinate resolves to exactly its record."""
    d = tmp_path_factory.mktemp("rt")
    path = str(d / "f.warc")
    with open(path, "wb") as fh:
        w = WarcWriter(fh, gzip_members=gz)
        for uri, payload in payloads:
            w.write_record("conversion", payload, target_uri=uri,
                           content_type="text/plain")
    for (off, length), (uri, payload) in zip(w.coordinates, payloads):
        rec = read_record_at(path, off, length)
        assert rec is not None and rec.target_uri == uri and rec.payload == payload


def test_sql_registered_functions(spark):
    from cc_pyspark_spark.functions.url import register_sql_functions

    register_sql_functions(spark)
    row = spark.sql(
        "SELECT surt_host('http://www.Example.com/x') AS s, "
        "url_join('http://a.com/dir/', '../up') AS j"
    ).collect()[0]
    assert row["s"] == "com.example"
    assert row["j"] == "http://a.com/up"


def test_corrupt_wat_json_is_skipped(spark):
    """Malformed WAT JSON must not fail the task (records_failed
    semantics, wat_extract_links.py:81-86): from_json yields null and
    the record drops out."""
    import pandas as pd

    from cc_pyspark_spark.jobs.pipelines import wat_extract_links
    from cc_pyspark_spark.sources.warc import WARC_RECORD_SCHEMA

    rows = [
        {
            "warc_filename": "f", "warc_record_offset": 0,
            "warc_record_length": 1, "record_type": "metadata",
            "content_type": "application/json",
            "target_uri": "http://x.example.com/p", "warc_date": None,
            "warc_ip_address": None, "identified_payload_type": None,
            "http_status": None, "http_headers": None,
            "payload": b"{not valid json!!",
        }
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), WARC_RECORD_SCHEMA)
    assert wat_extract_links(df).collect() == []


def test_variant_header_links_scalar_and_list(spark):
    """VariantType path handles the JSON list-or-scalar header shapes the
    typed schema cannot (wat_extract_links.py:164-177 semantics)."""
    import json as _json

    from pyspark.sql import functions as F

    from cc_pyspark_spark.functions.json import wat_header_links_variant

    def env(headers):
        return _json.dumps(
            {"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {
                "Headers": headers}}}}
        )

    rows = [
        (env({"Link": "<http://a.com/x>; rel=preload"}),),
        (env({"Link": ["<http://b.com/y>", "<http://c.com/z>; rel=next"]}),),
        (env({"Content-Location": "http://d.com/c", "Link": "<http://e.com/w>"}),),
        (env({}),),
        ("{broken json",),
        # case-insensitive names, list-valued Content-Location, junk types
        (env({"link": ["<http://f.com/q>"],
              "CONTENT-LOCATION": ["http://g.com/1", "http://g.com/2"],
              "X-Num": 7, "X-Obj": {"a": 1}}),),
    ]
    df = spark.createDataFrame(rows, "payload_text string")
    out = [
        sorted(r[0])
        for r in df.select(
            wat_header_links_variant(F.col("payload_text")).alias("links")
        ).collect()
    ]
    assert out[0] == ["http://a.com/x"]
    assert out[1] == ["http://b.com/y", "http://c.com/z"]
    assert out[2] == ["http://d.com/c", "http://e.com/w"]
    assert out[3] == []
    assert out[4] == []
    assert out[5] == ["http://f.com/q", "http://g.com/1", "http://g.com/2"]


def test_sentence_split_udtf(spark):
    """Python UDTF (U2 surface): lateral one-row→N-rows expansion."""
    from cc_pyspark_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, "No punctuation"), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT s.* FROM udtf_docs d, "
        "LATERAL split_sentences(d.doc_id, d.text) s ORDER BY doc_id, sentence_idx"
    ).collect()
    got = [(r["doc_id"], r["sentence_idx"], r["sentence"]) for r in rows]
    assert got == [
        (1, 0, "One."),
        (1, 1, "Two!"),
        (1, 2, "Three?"),
        (2, 0, "No punctuation"),
    ]


def test_iana_tld_default_accepts_cctld_hosts(spark):
    """F10 with the vendored IANA registry: ccTLD hosts the old ~40-entry
    demo set rejected now validate; junk labels still don't."""
    from cc_pyspark_spark.functions.iana_tlds import IANA_TLDS
    from cc_pyspark_spark.functions.url import tld_is_valid

    assert len(IANA_TLDS) > 1400
    hosts = [
        ("us.census", True),       # rev-host form: first label is the TLD
        ("kr.example", True),
        ("in.gov-portal", True),
        ("xn--p1ai.example", True),  # punycode ccTLD (.рф)
        ("localdomain.foo", False),
        ("zz9.bar", False),
    ]
    df = spark.createDataFrame(hosts, ["name", "want"])
    got = {r["name"]: r["ok"] for r in df.select(
        "name", "want", tld_is_valid("name").alias("ok")).collect()}
    for name, want in hosts:
        assert got[name] is want, name


def test_sniffer_never_flips_ascii_property():
    """Property: pure-ASCII bytes always decode to themselves — the
    statistical sniffer must never beat the latin-1 baseline on them."""
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cc_pyspark_spark.functions.encoding import decode_bytes

    printable = string.ascii_letters + string.digits + string.punctuation + " \t\n"

    @settings(max_examples=50, deadline=None)
    @given(st.text(alphabet=printable, min_size=0, max_size=500))
    def check(s):
        assert decode_bytes(s.encode("ascii"), None) == s

    check()


def test_sniffer_utf8_always_wins_property():
    """Property: any valid UTF-8 text decodes exactly (strict utf-8 is
    tried before the sniffer ever runs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cc_pyspark_spark.functions.encoding import decode_bytes

    @settings(max_examples=50, deadline=None)
    @given(st.text(min_size=0, max_size=300))
    def check(s):
        assert decode_bytes(s.encode("utf-8"), None) == s

    check()


def test_canonical_survivors_empty_pairs(spark):
    """No near-dup pairs → every document survives as itself."""
    from cc_pyspark_spark.operators.dedup import canonical_survivors

    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    pairs = spark.createDataFrame([], "a_id bigint, b_id bigint")
    got = {r["doc_id"]: (r["keep_id"], r["is_canonical"])
           for r in canonical_survivors(docs, pairs).collect()}
    assert got == {i: (i, 1) for i in range(8)}


def test_sign_lsh_pairs_tiny_and_single(spark):
    """Degenerate corpora: one vector (no pairs), two identical vectors
    (one pair at cos 1.0 — same bucket in every band)."""
    from cc_pyspark_spark.operators.dedup import sign_lsh_pairs

    one = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    assert sign_lsh_pairs(one, threshold=0.5).count() == 0
    two = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = sign_lsh_pairs(two, threshold=0.99).collect()
    assert len(rows) == 1
    assert (rows[0]["a_id"], rows[0]["b_id"]) == (1, 2)
    assert abs(rows[0]["cos"] - 1.0) < 1e-12
