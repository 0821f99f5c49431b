"""Z-order layout: key algebra + the data-skipping property itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_pyspark_spark.operators.layout import zorder_key


def _morton2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for j in range(bits):
        out |= ((x >> j) & 1) << (2 * j)
        out |= ((y >> j) & 1) << (2 * j + 1)
    return out


def test_zorder_key_matches_reference_bit_interleave(spark):
    rows = [(x, y) for x in range(0, 300, 7) for y in range(0, 300, 11)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_buckets_bound_both_dimensions(spark):
    """The point of the layout: partition a grid into equal row groups
    by (a) z-key ranges and (b) single-column sort ranges; the z-order
    envelopes must bound BOTH dimensions far tighter than the
    single-column layout bounds its unsorted dimension."""
    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    groups = 16
    z = df.select(
        "x", "y", (zorder_key(["x", "y"], bits=6) * groups / (n * n)).cast(
            "long"
        ).alias("g")
    )
    lin = df.select("x", "y", (F.col("x") * groups / n).cast("long").alias("g"))

    def mean_span(d, col):
        spans = (
            d.groupBy("g")
            .agg((F.max(col) - F.min(col)).alias("s"))
            .agg(F.avg("s"))
            .collect()[0][0]
        )
        return spans

    # z-order: both dims bounded to ~quarter of the range per group
    assert mean_span(z, "x") <= n / 2
    assert mean_span(z, "y") <= n / 2
    # single-column sort: sorted dim tight, other dim unbounded
    assert mean_span(lin, "x") <= n / 8
    assert mean_span(lin, "y") >= n - 1
