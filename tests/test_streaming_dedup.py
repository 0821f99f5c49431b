"""Streaming dedup: duplicated input events emit exactly once."""

from __future__ import annotations

import shutil

import pytest

from cc_pyspark_spark.streaming.dedup import (
    dedup_exact_stream,
    dedup_within_watermark,
)
from cc_pyspark_spark.streaming.windows import run_available_now, stream_events
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def dup_events_dir(tmp_path_factory):
    """The same events file twice — every event is a duplicate."""
    d = tmp_path_factory.mktemp("dup-events")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "b.parquet")
    return str(d)


def test_streaming_exact_dedup(spark, dup_events_dir):
    stream = dedup_exact_stream(
        stream_events(spark, dup_events_dir), ["event_id"]
    )
    q = run_available_now(stream, "dedup_exact_t", "append")
    q.awaitTermination(120)
    out = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d "
                    "FROM dedup_exact_t").collect()[0]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    n_unique = spark.read.parquet(dup_events_dir).select("event_id").distinct().count()
    assert out["n"] == out["d"] == n_unique


def test_streaming_watermark_dedup(spark, dup_events_dir):
    stream = dedup_within_watermark(
        stream_events(spark, dup_events_dir), ["event_id"], watermark="10 minutes"
    )
    q = run_available_now(stream, "dedup_wm_t", "append")
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_wm_t"
    ).collect()[0]
    # duplicates arrive in the same batch (identical timestamps), well
    # within the watermark → exactly-once emission
    assert out["n"] == out["d"]
    assert out["n"] > 0


@pytest.fixture(scope="module")
def doc_stream_dir(tmp_path_factory):
    """Streaming documents: near-identical re-crawls share a simhash."""
    from pyspark.sql import SparkSession
    import datetime

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    d = tmp_path_factory.mktemp("doc-stream")
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(40):
        text = f"document number {i} with some shared vocabulary tokens " \
               f"alpha beta gamma delta epsilon zeta {i}"
        rows.append((i, text, base + datetime.timedelta(seconds=i)))
        # a retry/re-crawl duplicate of every 4th doc, identical text
        if i % 4 == 0:
            rows.append((1000 + i, text, base + datetime.timedelta(seconds=i, milliseconds=500)))
    spark.createDataFrame(rows, "doc_id long, text string, ts timestamp") \
        .write.mode("overwrite").parquet(str(d))
    return str(d)


def test_streaming_neardup_simhash_dedup(spark, doc_stream_dir):
    """Near-dup stream suppression: re-crawled duplicates (same simhash
    bucket) emit once; distinct documents all survive. The signature is
    row-local (zero shuffle, zero extra state) so the watermark dedup is
    the only stateful operator in the query."""
    from cc_pyspark_spark.streaming.dedup import neardup_dedup_stream
    from cc_pyspark_spark.streaming.windows import run_available_now

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(doc_stream_dir)
    )
    out_stream = neardup_dedup_stream(stream, watermark="10 minutes")
    q = run_available_now(out_stream, "neardup_t", "append")
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, simhash FROM neardup_t").collect()
    sigs = {r["doc_id"]: r["simhash"] for r in got}
    # one survivor per distinct signature...
    assert len(sigs) == len({v for v in sigs.values()})
    # ...and every planted duplicate pair collapsed to a single emission
    assert len(sigs) == 40
