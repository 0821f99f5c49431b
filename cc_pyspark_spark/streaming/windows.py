"""Streaming window aggregations over an events directory.

The reference is batch-only (SURVEY.md §2.9) — this is the
beyond-reference streaming surface. The same aggregation expressions as
plans/events.py run under `readStream` with a watermark for late data;
`trigger(availableNow=True)` makes them testable (and usable for
incremental backfill) without a long-running query.

Stateful custom logic (running per-user counters) is
`applyInPandasWithState` — the engine's answer to operators that aren't
expressible as windowed aggs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql import types as T

#: Cold-start schema: what the current driver fixture carries. Used
#: only when the input directory has no files yet (a file-source
#: stream's normal cold start), where batch schema inference throws.
DEFAULT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """readStream over an events parquet directory.

    The fixture's physical `ts` type has varied across driver versions
    (nanos-as-long vs timestamp[us]); infer the schema the files
    actually carry with a batch read, and only rebuild the timestamp
    when `ts` arrives as a long — the same branch catalog.py takes for
    the batch twins. (`nanosAsLong` is set for old nanos fixtures; it
    is a no-op on PySpark ≥ 4.) An empty landing directory falls back
    to `DEFAULT_EVENT_SCHEMA` so the stream starts and waits for files
    instead of failing at setup.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(events_dir).schema
    except Exception as ex:  # noqa: BLE001
        # Only the genuine cold-start cases fall back to the default
        # schema: a missing landing directory or one with no readable
        # footers yet. Anything else (corrupt files, mixed schemas)
        # must fail HERE, at setup — not later, mid-stream, far from
        # the root cause (ADVICE r6).
        probe = getattr(ex, "getCondition", None) or getattr(
            ex, "getErrorClass", None
        )
        marker = (probe() if probe else None) or str(ex)
        if not any(
            tag in str(marker)
            for tag in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
        ):
            raise
        schema = DEFAULT_EVENT_SCHEMA
    raw = spark.readStream.schema(schema).parquet(events_dir)
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Watermarks require TIMESTAMP (LTZ); session tz is UTC so the
        # cast preserves the naive-UTC epoch semantics of the oracle.
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of plans/events.events_tumbling_hourly: watermark
    bounds state; late rows beyond it are dropped (late-data policy)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming session windows (merging state across micro-batches)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            "n_events",
        )
    )


RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _running_totals(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) kept in
    group state across micro-batches (applyInPandasWithState)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, query_name: str, output_mode: str):
    """Drain all available input into a memory sink; return the query."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def sliding_counts(
    events: DataFrame,
    length: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of plans/events.events_sliding: overlapping
    windows multiply state by length/slide (bounded fan-out of 2 at
    the defaults); the watermark bounds how many stay open."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "n",
            "sum_value",
        )
    )


def minute_rollup_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming half of the hypertable rollup (plans/events.py
    `events_hypertable_rollup`): maintain the MINUTE grain
    incrementally under a watermark. In the continuous-aggregate
    deployment this appends to the stored minute table; the hour/day
    grains re-aggregate that table in batch (count + exact DECIMAL sum
    are monoids) and never see raw events — so refresh cost tracks the
    changed minute buckets, not the stream's history. The stored grain
    keeps the EXACT decimal (`sum_value_dec`) — that is what makes the
    hour/day re-aggregation bit-identical to direct grouping; the
    double `sum_value` is presentation only (code-review r7)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("bucket_start"),
            "event_type",
            "n",
            F.col("s").alias("sum_value_dec"),
            F.col("s").cast("double").alias("sum_value"),
        )
    )


def purchase_click_stream_join(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join — the batch twin is
    plans/events.events_range_join's inner core: each purchase joined
    to the same user's clicks from the preceding 10 minutes.

    Both sides carry watermarks and the join condition bounds c_ts
    within [p_ts - 10 min, p_ts), so Spark can size the join state and
    expire rows: click state is held for watermark + 10 minutes, then
    dropped — the state-bound that makes an unbounded two-stream join
    runnable forever. Inner join (streaming outer needs both
    watermarks anyway and emits on expiry); the batch parity test
    derives the per-purchase click counts from these pairs."""
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTE"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id", "p_ts")


def funnel_hourly_stream(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """CHAINED stateful operators: the stream-stream interval join's
    output re-enters a windowed aggregation (pairs per purchase hour).
    Spark propagates the watermark through the join, so the downstream
    window state also expires — two stateful stages, bounded state,
    one continuous query. Batch twin: the range join's inner pairs
    grouped by hour of the purchase timestamp."""
    pairs = purchase_click_stream_join(events, watermark=watermark)
    return (
        pairs.groupBy(F.window("p_ts", "1 hour"))
        .agg(F.count("*").alias("n_pairs"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_start"),
            "n_pairs",
        )
    )


class _RunningTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of `_running_totals` — the same
    per-user running (count, sum) on the Spark 4 stateful-processor
    API, which replaces applyInPandasWithState's (state, timeout)
    closure with named state variables (ValueState here; ListState /
    MapState for richer operators) plus first-class timers and TTL.
    Both implementations are kept because the old API remains the
    compatibility surface while TWS is the forward path; a pytest pins
    their outputs equal row-for-row. Runtime needs the RocksDB state
    store provider and google.protobuf (the TWS state-server wire
    format) — protobuf is absent in this sandbox, so the parity test
    importorskips, the same env-gating pattern as bs4/boto3/ffmpeg."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total}]
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via transformWithStateInPandas."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotalsProcessor(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def ohlc_bars(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of plans/events.events_ohlc_bars: per-bar OHLC
    under a watermark. open/close use the same struct-min/max total
    order as the batch plan — (ts, event_id, value) — so a bar closed
    by the watermark equals the batch bar exactly (the parity test
    pins it); state per open bar is two structs + three scalars,
    bounded by the watermark horizon."""
    key = F.struct("ts", "event_id", "value")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min(key).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key).getField("value").alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n",
            "open",
            "high",
            "low",
            "close",
            "sum_value",
        )
    )
