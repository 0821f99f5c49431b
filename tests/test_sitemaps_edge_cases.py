"""Reference charset/IDNA edge-case corpus for the sitemaps pipeline.

Ports test/test_sitemaps_from_robotstxt.py:365-553 (utf-16 whole file,
malformed netloc, invalid punycode, latin-1 and mixed invalid-UTF-8
sitemap URLs, malformed sitemap URLs, >50-sitemap outlier) through the
REAL WARC path — synthesized archive → warc_records → declarative
pipeline — asserting both emitted rows and accumulator-count parity
(sitemaps_metrics) against the reference's exact expected counters.
"""

from __future__ import annotations

import pytest

from cc_pyspark_spark.jobs.pipelines import (
    sitemaps_from_robotstxt,
    sitemaps_metrics,
)
from cc_pyspark_spark.sources.warc import warc_records
from cc_pyspark_spark.sources.warcio_lite import WarcWriter, http_response_block

CASES = {
    # name: (target_uri, body_bytes, expected_rows {url: [hosts]},
    #        processed, found, invalid, announcing, gt50)
    "well_formed": (
        "http://ajedrezhoygol.blogspot.com.ar/robots.txt",
        ("User-agent: Mediapartners-Google\nDisallow: \n\nUser-agent: *\n"
         "Disallow: /search\nAllow: /\n\n"
         "Sitemap: http://ajedrezhoygol.blogspot.com/sitemap.xml\n").encode(),
        {"http://ajedrezhoygol.blogspot.com/sitemap.xml":
         ["ajedrezhoygol.blogspot.com.ar"]},
        1, 1, 0, 1, 0,
    ),
    "utf16_whole_file": (
        "http://ajedrezhoygol.blogspot.com.ar/robots.txt",
        ("User-agent: Mediapartners-Google\nDisallow: \n\nUser-agent: *\n"
         "Disallow: /search\nAllow: /\n\n"
         "Sitemap: http://ajedrezhoygol.blogspot.com/sitemap.xml\n"
         ).encode("utf-16"),
        {},
        1, 0, 0, 0, 0,
    ),
    "malformed_netloc": (
        "http://[malformed::url]/robots.txt",
        (b"User-agent: *\nDisallow: /admin/\n\n"
         b"Sitemap: http://example.com/sitemap.xml\n"
         b"Sitemap: http://example.com/sitemap2.xml\n"),
        {},
        1, 1, 0, 0, 0,
    ),
    "invalid_punycode_host": (
        "http://xn--foo/robots.txt",
        (b"User-agent: *\nDisallow: /\n\n"
         b"Sitemap: http://example.com/sitemap.xml\n"),
        {"http://example.com/sitemap.xml": ["xn--foo"]},
        1, 1, 0, 1, 0,
    ),
    "latin1_sitemap_url": (
        "http://example.com/robots.txt",
        (b"User-agent: *\nDisallow: /\n\n"
         b"Sitemap: http://example.com/sitemap_caf\xe9.xml\n"),
        {},
        1, 1, 1, 0, 0,
    ),
    "mixed_invalid_bytes": (
        "http://example.com/robots.txt",
        (b"User-agent: *\nDisallow: /search\n\n"
         b"Sitemap: http://example.com/good_sitemap.xml\n"
         b"Sitemap: http://example.com/bad\xff\xfe_sitemap.xml\n"
         b"Sitemap: http://example2.com/another_good.xml\n"),
        {
            "http://example.com/good_sitemap.xml": ["example.com"],
            "http://example2.com/another_good.xml": ["example.com"],
        },
        1, 3, 1, 1, 0,
    ),
    "malformed_sitemap_url": (
        "http://example.com/robots.txt",
        (b"User-agent: *\nDisallow: /\n\n"
         b"Sitemap: ht!tp://[malformed::url]/sitemap.xml\n"),
        # urljoin treats the bad scheme as a relative path and
        # normalizes the double slash (reference asserts only len==1)
        {"http://example.com/ht!tp:/[malformed::url]/sitemap.xml":
         ["example.com"]},
        1, 1, 0, 1, 0,
    ),
    "sixty_sitemaps": (
        "http://example.com/robots.txt",
        ("User-agent: *\nDisallow: /admin/\n\n"
         + "\n".join(
             f"Sitemap: http://valid-site.com/sitemap{i}.xml"
             for i in range(60)
         )).encode(),
        {f"http://valid-site.com/sitemap{i}.xml": ["example.com"]
         for i in range(60)},
        1, 60, 0, 1, 1,
    ),
}


def _write_robots_warc(path: str, cases) -> None:
    with open(path, "wb") as fh:
        w = WarcWriter(fh, gzip_members=True)
        for uri, body, *_ in cases:
            block = http_response_block(
                body, status=200, headers=[("Content-Type", "text/plain")]
            )
            w.write_record(
                "response",
                block,
                target_uri=uri,
                content_type="application/http; msgtype=response",
            )


@pytest.fixture(scope="module", params=sorted(CASES))
def case(request):
    return request.param


@pytest.fixture(scope="module")
def frames(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("robots-edge")
    out = {}
    for name, spec in CASES.items():
        path = str(d / f"{name}.warc.gz")
        _write_robots_warc(path, [spec])
        records = warc_records(spark, [path], num_input_partitions=1)
        out[name] = (
            sitemaps_from_robotstxt(records).collect(),
            sitemaps_metrics(records).collect()[0],
        )
    return out


def test_edge_case_rows(frames, case):
    rows, _ = frames[case]
    want = CASES[case][2]
    got = {r["sitemap_url"]: list(r["hosts"]) for r in rows}
    assert got == want, case


def test_edge_case_metrics(frames, case):
    _, m = frames[case]
    _, _, _, processed, found, invalid, announcing, gt50 = CASES[case]
    assert m["robots_txt_processed"] == processed, case
    assert m["sitemap_urls_found"] == found, case
    assert m["sitemap_url_invalid_encoding"] == invalid, case
    assert m["robots_txt_announcing_sitemap"] == announcing, case
    assert m["robots_txt_with_more_than_50_sitemaps"] == gt50, case


def test_whole_corpus_in_one_archive(spark, tmp_path):
    """All cases in one archive: counters are sums of the per-case
    expectations (multi-record aggregation parity, ref :231-362)."""
    path = str(tmp_path / "all.warc.gz")
    _write_robots_warc(path, list(CASES.values()))
    records = warc_records(spark, [path], num_input_partitions=1)
    m = sitemaps_metrics(records).collect()[0]
    exp = [sum(spec[i] for spec in CASES.values()) for i in range(3, 8)]
    assert [
        m["robots_txt_processed"],
        m["sitemap_urls_found"],
        m["sitemap_url_invalid_encoding"],
        m["robots_txt_announcing_sitemap"],
        m["robots_txt_with_more_than_50_sitemaps"],
    ] == exp
    rows = {
        r["sitemap_url"]: list(r["hosts"])
        for r in sitemaps_from_robotstxt(records).collect()
    }
    # merged hosts across records: every per-case row must be a subset
    for spec in CASES.values():
        for url, hosts in spec[2].items():
            assert url in rows
            for h in hosts:
                assert h in rows[url]
