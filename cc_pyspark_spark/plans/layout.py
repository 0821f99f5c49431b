"""Z-order layout quality — data-skipping envelopes per key range.

The query buckets lineitem rows by the top bits of their Morton key
(operators/layout.py:zorder_key over partkey/suppkey) and emits each
bucket's min/max envelope on BOTH dimensions plus its row count —
i.e. exactly the per-file statistics a z-ordered parquet write would
expose to scan pruning. Tight envelopes on every interleaved dimension
at once are the whole point of the layout; the oracle recomputes the
identical bit algebra in DuckDB, so the key definition itself is
hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register

_ZBITS = 16  # bits per dimension kept in the Morton key
_ZBUCKETS = 64  # layout "files": equal key-range slices of [0, max zkey]


def _duck_zorder_oracle() -> str:
    x = f"(l_partkey % {1 << _ZBITS})"
    y = f"(l_suppkey % {1 << _ZBITS})"
    terms = []
    for i, c in enumerate((x, y)):
        terms.extend(
            f"((({c} >> {j}) & 1) << {j * 2 + i})" for j in range(_ZBITS)
        )
    zkey = " | ".join(terms)
    return f"""
WITH z AS (
  SELECT CAST({zkey} AS BIGINT) AS zkey,
         l_partkey AS pk, l_suppkey AS sk
  FROM lineitem
), mx AS (SELECT MAX(zkey) AS m FROM z)
SELECT CAST(zkey * {_ZBUCKETS} // (mx.m + 1) AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(MIN(pk) AS BIGINT) AS min_pk, CAST(MAX(pk) AS BIGINT) AS max_pk,
       CAST(MIN(sk) AS BIGINT) AS min_sk, CAST(MAX(sk) AS BIGINT) AS max_sk
FROM z CROSS JOIN mx GROUP BY 1
"""


@register(
    "layout_zorder_stats",
    oracle=_duck_zorder_oracle(),
    description="Z-order (Morton) layout for multi-dimension data "
    "skipping — the OPTIMIZE ZORDER BY primitive: partkey and suppkey "
    "bits interleave into one BIGINT key (pure shifts/masks/ORs, "
    "whole-stage codegen, no UDF), rows bucket into 64 equal key-range "
    "slices (scale-free: sliced against the in-plan max, a 1-row "
    "broadcast), and each bucket reports its min/max envelope on BOTH "
    "dimensions plus row count — exactly the per-file statistics a "
    "z-ordered repartitionByRange(zkey) parquet write exposes to scan "
    "pruning. "
    "At 100 TB this is one range shuffle at write time in exchange for "
    "min/max pruning on every interleaved column simultaneously",
    tags=("layout", "scale"),
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.layout import zorder_key  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    z = t.lineitem.select(
        zorder_key(
            [
                F.col("l_partkey") % (1 << _ZBITS),
                F.col("l_suppkey") % (1 << _ZBITS),
            ],
            bits=_ZBITS,
        ).alias("zkey"),
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
    )
    mx = z.agg(F.max("zkey").alias("m"))
    return (
        z.crossJoin(F.broadcast(mx))
        .groupBy(
            F.expr(f"(zkey * {_ZBUCKETS}) div (m + 1)")
            .cast("bigint")
            .alias("zbucket")
        )
        .agg(
            F.count("*").alias("cnt"),
            F.min("pk").cast("bigint").alias("min_pk"),
            F.max("pk").cast("bigint").alias("max_pk"),
            F.min("sk").cast("bigint").alias("min_sk"),
            F.max("sk").cast("bigint").alias("max_sk"),
        )
    )
