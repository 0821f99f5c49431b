"""Table catalog over the driver-generated parquet star schema.

Mirrors the reference's table-loading surface: parquet scan + temp view
(sparkcc.py:489-500 ``load_table``) so that both the DataFrame API and
full SQL passthrough (sparkcc.py:502-506 ``execute_query``) work over
the same names. Explicit schemas are not needed — parquet is
self-describing and the driver generates a fixed layout (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one table; Catalyst prunes columns/filters.

    The driver's `events` table carries TIMESTAMP(NANOS) parquet, which
    Spark rejects ([PARQUET_TYPE_ILLEGAL]); read nanos as long and
    rebuild the timestamp with exact integer division (ns → µs).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


class Catalog:
    """Lazy accessor: ``cat.lineitem`` → DataFrame; views on demand.

    Keeps one scan-node per table per query build so Catalyst can reuse
    the relation (and so explicit schema/pushdown options live in one
    place when the source moves from local parquet to object storage).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        # Timestamp literals/formatting must agree with the (naive-UTC)
        # oracle semantics even on a session we didn't build.
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in TABLES:
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def register_views(self) -> None:
        """Register all tables as temp views for SQL passthrough
        (parity with sparkcc.py:500 ``createOrReplaceTempView``)."""
        for name in TABLES:
            getattr(self, name).createOrReplaceTempView(name)
