"""r11 hardening (ADVICE r10): valueless tracking params, LPA
rounds=0 contract, zip fixture short-text clamp, zip walker
prepended-data delta + ZIP64 sentinel skip."""

from __future__ import annotations

import io
import struct
import zipfile


def test_canonicalize_url_valueless_tracking_params(spark):
    from cc_pyspark_spark.functions.url import canonicalize_url

    cases = [
        # bare click id with no '=' must strip like the valued form
        ("http://a.example.com/p?fbclid", "http://a.example.com/p"),
        ("http://a.example.com/p?fbclid&a=1", "http://a.example.com/p?a=1"),
        ("http://a.example.com/p?utm_source", "http://a.example.com/p"),
        # prefix-only lookalikes survive: 'fbclid' must be the WHOLE name
        ("http://a.example.com/p?fbclidx=1", "http://a.example.com/p?fbclidx=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
    assert got == [want for _, want in cases]


def test_label_propagation_zero_rounds_is_identity(spark):
    from cc_pyspark_spark.operators.community import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "a long, b long"
    )
    got = {
        r["id"]: r["community"]
        for r in label_propagation(edges, rounds=0).collect()
    }
    assert got == {v: v for v in (1, 2, 3, 7, 8)}


def test_zip_fixture_clamps_short_text(spark):
    """A document shorter than the md5-derived member size must still
    yield a structurally valid archive: the declared size clamps to
    the actual payload, so offsets and EOCD agree with the bytes."""
    import hashlib

    from cc_pyspark_spark.plans.multimodal import zip_fixture_blobs

    docs = spark.createDataFrame(
        [(1, "hi", "en"), (2, "", "de")],
        "doc_id long, text string, lang string",
    )
    rows = zip_fixture_blobs(docs).orderBy("blob_id").collect()
    for row, text, lang in ((rows[0], "hi", "en"), (rows[1], "", "de")):
        tb = text.encode()
        l1 = min(
            int(hashlib.md5(tb).hexdigest()[:2], 16) % 32 + 1, len(tb)
        )
        with zipfile.ZipFile(io.BytesIO(bytes(row["blob"]))) as zf:
            assert zf.testzip() is None
            assert zf.read("a.txt") == tb[:l1]
            assert zf.read("b.cls") == lang.encode()


def test_zip_walker_corrects_prepended_data_delta(spark):
    """Self-extracting-zip shape: junk bytes prepended to a valid
    archive leave every recorded offset relative to the ORIGINAL
    start; the walker must shift cd_off and the reported local-header
    offsets by the EOCD-position delta (stdlib zipfile's `concat`
    correction)."""
    from cc_pyspark_spark.operators.multimodal import zip_central_directory
    from cc_pyspark_spark.plans.multimodal import zip_fixture_blobs

    docs = spark.createDataFrame(
        [(1, "some document body text", "en")],
        "doc_id long, text string, lang string",
    )
    blob = bytes(zip_fixture_blobs(docs).collect()[0]["blob"])
    junk = b"#!/bin/sh\nexec unzip $0\n" * 4
    frame = spark.createDataFrame(
        [(1, blob), (2, junk + blob)], "blob_id long, blob binary"
    )
    got: dict[int, list] = {1: [], 2: []}
    for r in zip_central_directory(frame).collect():
        got[r["blob_id"]].append((r["name"], r["lho"]))
    plain, shifted = sorted(got[1]), sorted(got[2])
    assert [n for n, _ in plain] == ["a.txt", "b.cls"]
    assert shifted == [(n, off + len(junk)) for n, off in plain]
    # cross-check the shifted offsets against stdlib zipfile, which
    # applies the same concat correction
    with zipfile.ZipFile(io.BytesIO(junk + blob)) as zf:
        want = sorted((i.filename, i.header_offset) for i in zf.infolist())
    assert shifted == want


def test_zip_walker_skips_zip64_sentinel(spark):
    from cc_pyspark_spark.operators.multimodal import zip_central_directory
    from cc_pyspark_spark.plans.multimodal import zip_fixture_blobs

    docs = spark.createDataFrame(
        [(1, "some document body text", "en")],
        "doc_id long, text string, lang string",
    )
    blob = bytearray(bytes(zip_fixture_blobs(docs).collect()[0]["blob"]))
    eocd = bytes(blob).rfind(b"PK\x05\x06")
    blob[eocd + 10 : eocd + 12] = struct.pack("<H", 0xFFFF)  # n_total
    frame = spark.createDataFrame(
        [(1, bytes(blob))], "blob_id long, blob binary"
    )
    assert zip_central_directory(frame).count() == 0
