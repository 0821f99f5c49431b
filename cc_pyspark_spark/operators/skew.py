"""Skew-mitigation operators (salting) for hot-key aggregations/joins.

AQE's skew-join splitting handles most cases at runtime; these are the
explicit variants for the two shapes AQE cannot fix:

* `salted_distinct_count` — COUNT(DISTINCT v) per key where one key
  holds a large share of all rows: partial aggregation cannot reduce
  distinct sets, so a single reducer drowns. Salting by `hash(value)`
  keeps every distinct value in exactly one salt bucket, so
  stage-1 distinct-counts are disjoint and stage-2 just sums them.
* `salted_join` — fact⋈dim where a few fact keys are hot and the dim
  side is small enough to replicate `n_salts`× but too big (or the
  join too non-trivial) for a plain broadcast.

Salts are deterministic hashes — no `rand()` — so retried tasks
produce identical rows (required for exactly-once sinks and for the
engine's determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-proof.

    Output: key_cols + `distinct_count`.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    )
    stage1 = salted.groupBy(*key_cols, "__salt").agg(
        F.countDistinct(value_col).alias("__partial")
    )
    return stage1.groupBy(*key_cols).agg(
        F.sum("__partial").cast("bigint").alias("distinct_count")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The big side's hot key rows spread across `n_salts` partitions;
    the small side is exploded n_salts× (a bounded blowup — use only
    when `small` is within n_salts× of broadcastable).
    """
    big_cols = [c for c in big.columns]
    small_cols = [c for c in small.columns if c != key]
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(n_salts)),
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    joined = big_s.join(small_s, [key, "__salt"], how)
    return joined.select(*big_cols, *small_cols)
