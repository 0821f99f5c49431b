"""Distributed dense ID assignment (W2) — no single-partition window.

`row_number().over(Window.orderBy(...))` gives exact dense IDs but
funnels every row through ONE task; fine for oracle replay, fatal at
100 TB. This operator is the scale path the reference reaches with RDD
`sortBy + zipWithIndex` (hostlinks_to_graph.py:102-111), re-expressed
for DataFrames:

1. `repartitionByRange(order)` — range shuffle; Spark's RangePartitioner
   assigns ascending key ranges to ascending partition ids.
2. per-partition row counts — one tiny job (`num_partitions` rows to
   the driver, the same metadata zipWithIndex collects).
3. dense id = prefix-sum offset of the partition (broadcast-joined)
   + `row_number` *within* the partition — every window group is one
   range partition, so the sort parallelism equals `num_partitions`.

Determinism contract: the order key must be unique (callers pass the
full sort key, e.g. the distinct host name) — then IDs are identical
to the global-window variant, which the equality test pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    order_cols: list[str] | str,
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based IDs ordered by `order_cols`, no global-sort window.

    One range shuffle + one count job; the per-partition `row_number`
    windows run in parallel (one group per range partition).
    """
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Range partitioning on a small/skewed key set may use fewer
    # populated partitions than requested — offsets come from the data.
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    offset_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
        )
    )
    local = W.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.join(offset_df, "__pid")
        .withColumn(
            id_col,
            (F.row_number().over(local).cast("bigint") + F.col("__offset")),
        )
        .drop("__pid", "__offset")
    )
