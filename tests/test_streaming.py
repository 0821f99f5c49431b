"""Streaming window aggs must agree with their batch twins.

Append-mode streaming aggregations only emit windows whose end is
behind the final watermark (max event time − delay); windows still in
state at availableNow termination are correctly *not* emitted. Tests
assert (a) everything emitted matches the batch result exactly and
(b) only watermark-tail windows are missing.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cc_pyspark_spark.plans.registry import QUERIES
from cc_pyspark_spark.streaming.windows import (
    run_available_now,
    running_user_totals,
    session_counts,
    stream_events,
    tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events-stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def max_ts_epoch(spark, events_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(events_dir)
    if dict(df.dtypes).get("ts") == "bigint":  # legacy nanos-long fixture
        expr = "max(ts DIV 1000000000) AS s"
    else:
        expr = "unix_seconds(cast(max(ts) AS TIMESTAMP)) AS s"
    return df.selectExpr(expr).collect()[0]["s"]


def _drain(q):
    q.awaitTermination(120)


def test_streaming_tumbling_matches_batch(spark, events_dir, max_ts_epoch):
    stream = tumbling_counts(
        stream_events(spark, events_dir), watermark="1 second"
    )
    q = run_available_now(stream, "tumbling_test", "append")
    _drain(q)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in QUERIES["events_tumbling_hourly"].spark(spark, SF_DIR).collect()
    }
    assert got, "no windows emitted"
    # everything emitted is exactly the batch value
    for k, v in got.items():
        assert want[k] == v
    # only watermark-tail windows (end beyond max_ts - 1s) may be missing
    for (ws, _etype), _v in want.items():
        if (ws, _etype) not in got:
            assert ws + 3600 > max_ts_epoch - 1


def test_streaming_sessions_match_batch(spark, events_dir):
    stream = session_counts(
        stream_events(spark, events_dir), watermark="1 second"
    )
    q = run_available_now(stream, "session_test", "append")
    _drain(q)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM session_test").collect()
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in QUERIES["events_session_window"].spark(spark, SF_DIR).collect()
    }
    assert got, "no sessions emitted"
    for k, v in got.items():
        assert want[k] == v
    # at most one open (unemitted) session per user
    missing = [k for k in want if k not in got]
    users = {u for u, _ in missing}
    assert len(missing) == len(users)


def test_stateful_running_totals(spark, events_dir):
    stream = running_user_totals(stream_events(spark, events_dir))
    q = run_available_now(stream, "running_test", "update")
    _drain(q)
    final = {
        r["user_id"]: r["n_events"]
        for r in spark.sql("SELECT * FROM running_test").collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(events_dir)
    want = {
        r["user_id"]: r["count"]
        for r in events.groupBy("user_id").count().collect()
    }
    assert final == want


def test_stream_events_cold_start_empty_dir(spark, tmp_path):
    """An empty landing directory must start (DEFAULT_EVENT_SCHEMA
    fallback) and drain zero rows, not fail schema inference (r6)."""
    stream = tumbling_counts(
        stream_events(spark, str(tmp_path)), watermark="1 second"
    )
    q = run_available_now(stream, "cold_start_test", "append")
    q.awaitTermination(60)
    assert spark.sql("SELECT * FROM cold_start_test").count() == 0


def test_stream_events_corrupt_file_fails_at_setup(spark, tmp_path):
    """A landing directory with an unreadable file must fail schema
    inference AT SETUP — not silently fall back to the default schema
    and surface the mismatch mid-stream (ADVICE r6)."""
    (tmp_path / "junk.parquet").write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception) as exc:
        stream_events(spark, str(tmp_path))
    assert "PATH_NOT_FOUND" not in str(exc.value)


def test_streaming_sliding_matches_batch(spark, events_dir, max_ts_epoch):
    from cc_pyspark_spark.streaming.windows import sliding_counts

    stream = sliding_counts(
        stream_events(spark, events_dir), watermark="1 second"
    )
    q = run_available_now(stream, "sliding_test", "append")
    _drain(q)
    got = {
        r["window_start"]: (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sliding_test").collect()
    }
    want = {
        r["window_start"]: (r["n"], r["sum_value"])
        for r in QUERIES["events_sliding_10m_5m"].spark(spark, SF_DIR).collect()
    }
    assert got, "no windows emitted"
    for k, v in got.items():
        assert want[k] == v
    # only watermark-tail windows (end beyond max_ts - 1s) may be missing
    for ws in want:
        if ws not in got:
            assert ws + 600 > max_ts_epoch - 1


def test_streaming_minute_rollup_matches_batch_grain(
    spark, events_dir, max_ts_epoch
):
    """The streamed minute grain must equal the batch hypertable's '1m'
    slice (late-data tail excepted), and re-aggregating the streamed
    grain to hours must reproduce the batch '1h' counts for complete
    hours — the continuous-aggregate refresh path."""
    from cc_pyspark_spark.streaming.windows import minute_rollup_counts

    stream = minute_rollup_counts(
        stream_events(spark, events_dir), watermark="1 second"
    )
    q = run_available_now(stream, "minute_rollup_test", "append")
    _drain(q)
    got = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM minute_rollup_test").collect()
    }
    batch = QUERIES["events_hypertable_rollup"].spark(spark, SF_DIR).collect()
    want_1m = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch
        if r["resolution"] == "1m"
    }
    assert got, "no minute buckets emitted"
    for k, v in got.items():
        assert want_1m[k] == v
    for k in want_1m:
        if k not in got:  # only the watermark tail may be missing
            assert k[0] + 60 > max_ts_epoch - 1

    # coarsen streamed minutes -> hour grains from the STORED decimal
    # (the continuous-aggregate refresh path); complete hours must be
    # bit-identical to the batch '1h' slice, sums included
    decs = {
        (r["bucket_start"], r["event_type"]): r["sum_value_dec"]
        for r in spark.sql("SELECT * FROM minute_rollup_test").collect()
    }
    hours: dict[tuple[int, str], int] = {}
    hsum: dict[tuple[int, str], object] = {}
    for (bs, et), (n, _) in got.items():
        hk = (bs - bs % 3600, et)
        hours[hk] = hours.get(hk, 0) + n
        hsum[hk] = (hsum.get(hk) or 0) + decs[(bs, et)]
    want_1h = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch
        if r["resolution"] == "1h"
    }
    complete = {k: v for k, v in want_1h.items() if k[0] + 3600 <= max_ts_epoch - 1}
    assert complete, "no complete hours in fixture"
    for k, (n, sv) in complete.items():
        assert hours.get(k) == n
        assert float(hsum[k]) == sv, (k, hsum[k], sv)


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream join twin: the streamed (purchase, click) pairs
    must equal the batch range join's inner pairs (watermark 1 hour
    covers the whole fixture, so nothing is dropped)."""
    from cc_pyspark_spark.streaming.windows import purchase_click_stream_join

    stream = purchase_click_stream_join(
        stream_events(spark, events_dir), watermark="1 hour"
    )
    q = run_available_now(stream, "ss_join_test", "append")
    _drain(q)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ss_join_test").collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(events_dir)
    from pyspark.sql import functions as F

    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTE"))
            & (F.col("c_ts") < F.col("p_ts")),
        ).collect()
    }
    assert want, "fixture has no purchase/click pairs"
    assert got == want


def test_chained_stateful_funnel_matches_batch(spark, events_dir, max_ts_epoch):
    """Stream-stream join feeding a windowed agg (two stateful stages
    in one query): hourly pair counts must match the batch range join's
    inner pairs grouped by purchase hour (watermark-tail hours may be
    absent)."""
    from cc_pyspark_spark.streaming.windows import funnel_hourly_stream

    stream = funnel_hourly_stream(
        stream_events(spark, events_dir), watermark="1 second"
    )
    q = run_available_now(stream, "funnel_stream_test", "append")
    _drain(q)
    got = {
        r.hour_start: r.n_pairs
        for r in spark.sql("SELECT * FROM funnel_stream_test").collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(events_dir)
    from pyspark.sql import functions as F

    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    want = {
        r.hour_start: r.n
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTE"))
            & (F.col("c_ts") < F.col("p_ts")),
        )
        .groupBy(
            F.unix_timestamp(F.date_trunc("hour", "p_ts")).alias("hour_start")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got, "no funnel windows emitted"
    for k, v in got.items():
        assert want[k] == v
    for k in want:  # only tail hours may be missing
        if k not in got:
            assert k + 3600 > max_ts_epoch - 1


def test_tws_running_totals_equals_apply_in_pandas_with_state(
    spark, events_dir
):
    """The transformWithStateInPandas implementation must produce the
    exact rows of the applyInPandasWithState one — same semantics on
    the old and the Spark-4 stateful APIs.

    Environment-gated like bs4/boto3/ffmpeg: the TWS state-server
    protocol needs google.protobuf (absent in this sandbox — the
    driver worker dies importing StateMessage_pb2) and the RocksDB
    state store provider. The operator itself has no extra imports;
    in an environment with protobuf this test runs and widens
    coverage automatically (same pattern as test_html_backends)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state server needs protobuf",
    )
    from cc_pyspark_spark.streaming.windows import running_user_totals_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    tws = running_user_totals_tws(stream_events(spark, events_dir))
    q = run_available_now(tws, "running_tws_test", "update")
    _drain(q)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM running_tws_test").collect()
    }

    legacy = running_user_totals(stream_events(spark, events_dir))
    q2 = run_available_now(legacy, "running_legacy_test", "update")
    _drain(q2)
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM running_legacy_test").collect()
    }
    assert got == want


def test_streaming_ohlc_matches_batch(spark, events_dir, max_ts_epoch):
    """r12: the OHLC downsample under a watermark — open/close ride a
    struct-min/max total order, so every bar the stream closes must
    equal the batch bar bit-for-bit (ties and all)."""
    from cc_pyspark_spark.streaming.windows import ohlc_bars

    stream = ohlc_bars(stream_events(spark, events_dir), watermark="1 second")
    q = run_available_now(stream, "ohlc_test", "append")
    _drain(q)
    got = {
        (r["window_start"], r["event_type"]): (
            r["n"], r["open"], r["high"], r["low"], r["close"], r["sum_value"]
        )
        for r in spark.sql("SELECT * FROM ohlc_test").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (
            r["n"], r["open"], r["high"], r["low"], r["close"], r["sum_value"]
        )
        for r in QUERIES["events_ohlc_bars"].spark(spark, SF_DIR).collect()
    }
    assert got, "no bars emitted"
    for k, v in got.items():
        assert want[k] == v
    for (ws, _etype), _v in want.items():
        if (ws, _etype) not in got:
            assert ws + 3600 > max_ts_epoch - 1
