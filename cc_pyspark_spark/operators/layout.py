"""Z-order (Morton) data layout keys — multi-dimensional clustering.

Writing 100 TB of parquet sorted by ONE column gives perfect min/max
data-skipping on that column and none on any other. Interleaving the
bits of several columns into a single Morton key and range-partitioning
the write on it gives every file a tight min/max envelope on EVERY
interleaved dimension simultaneously — the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY`, here as a plain column expression
any `repartitionByRange`/`sortWithinPartitions` write can use.

Pure integer bit algebra (shifts, masks, ORs) — deterministic,
engine-replayable (the `layout_zorder_stats` query's DuckDB oracle
recomputes the identical key), and JVM-side (whole-stage codegen;
no UDF in the write path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of each column.

    ``cols`` are non-negative integer columns already scaled to
    [0, 2**bits) — callers map raw values there first (modulo for ids,
    rank/quantile bucketing for skewed measures). Bit j of column i
    lands at position j * len(cols) + i, so consecutive key ranges are
    axis-aligned hyper-rectangles: a range of Morton keys bounds every
    dimension at once, which is exactly what per-file min/max stats
    need. len(cols) * bits must stay <= 63 (BIGINT).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds BIGINT range")
    cs = [F.col(c).cast("bigint") if isinstance(c, str) else c.cast("bigint") for c in cols]
    parts = [
        F.shiftleft(
            F.shiftrightunsigned(c, j).bitwiseAND(F.lit(1)), j * n + i
        )
        for i, c in enumerate(cs)
        for j in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_decode(zkey: int, n_cols: int, bits: int = 16) -> list[int]:
    """Python inverse of :func:`zorder_key` (driver-side utility for
    range planning / debugging; the encode is the hot path). Extracts
    each column's bits back out of the Morton key — the pair is
    bijective on [0, 2**bits)^n_cols, which the property test pins."""
    out = [0] * n_cols
    for j in range(bits):
        for i in range(n_cols):
            out[i] |= ((zkey >> (j * n_cols + i)) & 1) << j
    return out
