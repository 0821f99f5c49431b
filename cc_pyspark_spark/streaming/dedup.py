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


def simhash_col(text_col: str, n_bits: int = 32):
    """Row-local SimHash signature column — no explode, no groupBy.

    The batch operator (operators/dedup.py:simhash_signatures) computes
    the same sign-sum via explode + groupBy, which is the right batch
    plan (one shuffle, vectorized agg). Streams can't afford a stateful
    aggregation *before* the dedup operator (two stateful ops in one
    query), so here the whole signature folds inside the row with
    higher-order functions: distinct-token xxhash64 → per-bit sign sum
    → packed bigint. Entirely JVM-side, zero shuffle, zero state.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from cc_pyspark_spark.functions.text import tokenize  # noqa: PLC0415

    hashes = F.transform(F.array_distinct(tokenize(text_col)), lambda t: F.xxhash64(t))

    def bit_sum(b):
        # closure capture: HOF merge lambdas must be exactly 2-arg
        return F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sig = None
    for b in range(n_bits):
        term = F.when(bit_sum(b) > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return sig


def neardup_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming near-duplicate suppression: first document with a given
    SimHash signature inside the watermark wins; later near-identical
    re-crawls/retries (same 32-bit signature = hamming-0 bucket) are
    dropped. State is signature-keyed and watermark-bounded."""
    sig = simhash_col(text_col)
    return (
        stream.withColumn("simhash", sig)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
    )
