"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are served straight from the engine's
query registry (cc_pyspark_spark.plans.registry) — one entry per
implemented operator from SURVEY.md §2 plus the beyond-reference
LLM-pipeline operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cc_pyspark_spark.plans import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every oracle-expressible query."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
