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
