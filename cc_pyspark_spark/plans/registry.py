"""Query registry: name → (Spark builder, DuckDB oracle SQL).

Each entry is one operator/query from SURVEY.md §2 (or a
beyond-reference LLM-pipeline operator), expressed twice:

* ``spark``  — idiomatic DataFrame/SQL plan, built lazily from a
  :class:`~cc_pyspark_spark.catalog.Catalog` over ``sf_dir``.
* ``oracle`` — semantically identical ANSI SQL for DuckDB over the
  same parquet tables (or ``None`` for non-SQL-expressible ops, which
  get a weaker rows-only check).

Determinism contract (FIXTURES.md): results are compared with an
order-insensitive value hash, so queries need deterministic *sets* —
every LIMIT/top-k carries a unique-key tiebreak, list aggregates are
sorted, float results are produced by bit-identical arithmetic in both
engines (row-level IEEE double math; exact DECIMAL(18,6) summation;
final cast to double).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


def fixture_values(path: str) -> str:
    """Load a committed {key: int} oracle fixture and render it as a
    DuckDB VALUES list — shared by every fixture-join oracle builder
    (BPE token counts, simhash signatures, BPE packing)."""
    import json  # noqa: PLC0415

    with open(path) as f:
        fixture = json.load(f)
    return ",".join(f"('{k}',{v})" for k, v in sorted(fixture.items()))
