"""Streaming deduplication — exactly-once record emission over a stream.

Two built-in strategies over a streaming DataFrame:

* `dedup_exact_stream` — `dropDuplicates` on a key: state holds every
  key seen since the stream started (unbounded — right for bounded key
  spaces like content hashes in a backfill window).
* `dedup_within_watermark` — `dropDuplicatesWithinWatermark`: state is
  bounded by the watermark, the right default for infinite streams
  where duplicates arrive close together (retries, at-least-once
  upstreams).

At 100 TB-of-stream scale the state store is RocksDB-backed
(`spark.sql.streaming.stateStore.providerClass`) and keys should be
content hashes (`md5(payload)`), not payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_exact_stream(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    return stream.dropDuplicates(key_cols)


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
