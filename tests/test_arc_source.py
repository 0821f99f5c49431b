"""Legacy ARC container support (arc2warc parity, ref sparkcc.py:385-387).

Fixtures are synthesized from the public ARC v1 spec: a `filedesc://`
version block followed by `url ip date content-type length` records
whose bodies embed full HTTP responses. Round-trips are checked through
both the raw parser and the Spark `warc_records` source, plain and
gzip-member-per-record.
"""

from __future__ import annotations

import gzip
import io

import pytest

from cc_pyspark_spark.sources.warc import warc_records
from cc_pyspark_spark.sources.warcio_lite import iter_warc_records

BODIES = [
    (
        "http://example.com/a",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nServer: Apache\r\n\r\n"
        b"<html>alpha</html>",
    ),
    (
        "http://example.org/b",
        b"HTTP/1.1 301 Moved\r\nLocation: http://example.org/c\r\n\r\n",
    ),
    (
        "https://example.net/d",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nplain text",
    ),
]


def _arc_records() -> list[bytes]:
    filedesc_body = (
        b"1 0 TestOrg\nURL IP-address Archive-date Content-type Archive-length\n"
    )
    recs = [
        b"filedesc://test.arc 0.0.0.0 20240101000000 text/plain "
        + str(len(filedesc_body)).encode()
        + b"\n"
        + filedesc_body
    ]
    for i, (url, body) in enumerate(BODIES):
        hdr = (
            f"{url} 10.0.0.{i + 1} 2024010203040{i} text/html {len(body)}\n"
        ).encode()
        recs.append(hdr + body)
    return recs


def make_arc_plain() -> bytes:
    return b"\n".join(_arc_records()) + b"\n"


def make_arc_gz() -> bytes:
    out = io.BytesIO()
    for rec in _arc_records():
        out.write(gzip.compress(rec + b"\n"))
    return out.getvalue()


@pytest.mark.parametrize("maker", [make_arc_plain, make_arc_gz])
def test_arc_parses_as_warc_records(maker):
    recs = list(iter_warc_records(io.BytesIO(maker())))
    assert len(recs) == 1 + len(BODIES)
    info = recs[0]
    assert info.rec_type == "warcinfo"
    assert info.target_uri == "filedesc://test.arc"
    assert b"Archive-length" in info.payload
    for rec, (url, body) in zip(recs[1:], BODIES):
        assert rec.rec_type == "response"
        assert rec.target_uri == url
        assert rec.headers["WARC-Date"].startswith("2024-01-02T03:04:0")
        assert rec.headers["WARC-IP-Address"].startswith("10.0.0.")
        # HTTP split applied (arc2warc + parse_http parity)
        expected_status = int(body.split(b" ")[1])
        assert rec.http_status == expected_status
        assert rec.payload == body.split(b"\r\n\r\n", 1)[1]


def test_arc_record_type_filter():
    recs = list(
        iter_warc_records(
            io.BytesIO(make_arc_gz()), record_types={"response"}
        )
    )
    assert len(recs) == len(BODIES)
    assert all(r.rec_type == "response" for r in recs)


def test_arc_no_http_parse():
    recs = list(iter_warc_records(io.BytesIO(make_arc_plain()), parse_http=False))
    rec = recs[1]
    assert rec.http_status is None
    assert rec.payload.startswith(b"HTTP/1.1 200 OK")


def test_arc_through_spark_source(spark, tmp_path):
    plain = tmp_path / "legacy.arc"
    plain.write_bytes(make_arc_plain())
    gz = tmp_path / "legacy.arc.gz"
    gz.write_bytes(make_arc_gz())
    df = warc_records(spark, [str(plain), str(gz)], num_input_partitions=2)
    rows = df.collect()
    assert len(rows) == 2 * (1 + len(BODIES))
    by_file = {}
    for r in rows:
        by_file.setdefault(r["warc_filename"], []).append(r)
    for rs in by_file.values():
        types = sorted(r["record_type"] for r in rs)
        assert types == ["response"] * 3 + ["warcinfo"]
        uris = {r["target_uri"] for r in rs if r["record_type"] == "response"}
        assert uris == {u for u, _ in BODIES}
        statuses = {
            r["target_uri"]: r["http_status"]
            for r in rs
            if r["record_type"] == "response"
        }
        assert statuses["http://example.org/b"] == 301


def test_arc_gz_ranged_refetch(tmp_path):
    """(offset, length) of gzip-member ARC records must be re-fetchable."""
    from cc_pyspark_spark.sources.warcio_lite import read_record_at

    data = make_arc_gz()
    path = tmp_path / "ranged.arc.gz"
    path.write_bytes(data)
    recs = list(iter_warc_records(io.BytesIO(data)))
    target = recs[2]
    again = read_record_at(str(path), target.offset, target.length)
    assert again is not None
    assert again.target_uri == target.target_uri
    assert again.payload == target.payload


def test_truncated_arc_body_is_tolerant():
    data = make_arc_plain()[:-30]  # cut into the last record's body
    recs = list(iter_warc_records(io.BytesIO(data)))
    # earlier records parse; the truncated tail is dropped, no raise
    assert 1 <= len(recs) < 1 + len(BODIES) + 1


# ------------------------------------------------- hypothesis round-trip

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_uri = st.from_regex(
    r"http://[a-z]{1,10}\.example\.com/[a-z0-9]{0,8}", fullmatch=True
)


@settings(max_examples=30, deadline=None)
@given(
    payloads=st.lists(
        st.tuples(_uri, st.binary(min_size=0, max_size=1024)),
        min_size=1,
        max_size=6,
    ),
    gz=st.booleans(),
)
def test_arc_roundtrip_property(payloads, gz):
    """Synthesized ARC (v1 header lines + exact-length binary bodies,
    plain or gzip-member) parses back to the same records — arbitrary
    payload bytes including newlines and header-like content."""
    filedesc_body = b"1 0 Test\nURL IP-address Archive-date Content-type Archive-length\n"
    recs_bytes = [
        b"filedesc://t.arc 0.0.0.0 20240101000000 text/plain "
        + str(len(filedesc_body)).encode()
        + b"\n"
        + filedesc_body
    ]
    for url, body in payloads:
        hdr = f"{url} 1.2.3.4 20240102030405 text/plain {len(body)}\n".encode()
        recs_bytes.append(hdr + body)
    if gz:
        data = b"".join(gzip.compress(r + b"\n") for r in recs_bytes)
    else:
        data = b"\n".join(recs_bytes) + b"\n"
    recs = list(iter_warc_records(io.BytesIO(data), parse_http=False))
    assert len(recs) == 1 + len(payloads)
    assert recs[0].rec_type == "warcinfo"
    for rec, (url, body) in zip(recs[1:], payloads):
        assert rec.rec_type == "response"
        assert rec.target_uri == url
        assert rec.payload == body


def test_arc_crlf_header_lines():
    """CRLF-terminated ARC header lines parse like warcio's reader does
    (ADVICE r6): the trailing \\r must not corrupt the length field or
    fail the whole archive."""
    filedesc_body = b"1 0 TestOrg\nURL IP Date CT AL\n"
    recs_bytes = [
        b"filedesc://t.arc 0.0.0.0 20240101000000 text/plain "
        + str(len(filedesc_body)).encode()
        + b"\r\n"
        + filedesc_body
    ]
    for url, body in BODIES:
        hdr = (
            f"{url} 1.2.3.4 20240102030405 text/html {len(body)}\r\n"
        ).encode()
        recs_bytes.append(hdr + body)
    data = b"\n".join(recs_bytes) + b"\n"
    recs = list(iter_warc_records(io.BytesIO(data), parse_http=False))
    assert len(recs) == 1 + len(BODIES)
    for rec, (url, body) in zip(recs[1:], BODIES):
        assert rec.rec_type == "response"
        assert rec.target_uri == url
        assert rec.payload == body
