"""Host-link graph construction (hostlinks_to_graph.py:126-170 parity).

Edge table of reversed host names → (vertices with dense sorted IDs,
integer edge table). Differences from the reference, by design:

* ID assignment uses `row_number()` over a global sort — exact dense
  IDs — instead of `coalesce(1) + monotonically_increasing_id`
  (hostlinks_to_graph.py:96-100), which is both non-deterministic under
  retries and a single-task bottleneck. At cluster scale the global
  window sort is the same cost as the reference's RDD
  `sortBy + zipWithIndex` path (hostlinks_to_graph.py:102-111).
* TLD validation (F10) is an `isin` probe; IDN normalization (F9) a
  pandas UDF, both optional flags like `--validate_host_names` /
  `--normalize_host_names`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cc_pyspark_spark.functions.url import DEFAULT_TLDS, tld_is_valid


def _normalize_rev_host(series: pd.Series) -> pd.Series:
    """F9: IDNA-encode each label of a reversed host; None on failure."""

    def norm(name):
        if name is None:
            return None
        if name.isascii():
            return name
        try:
            return ".".join(
                lbl.encode("idna").decode("ascii") if not lbl.isascii() else lbl
                for lbl in name.split(".")
            )
        except UnicodeError:
            return None

    return series.map(norm)


normalize_rev_host_udf = F.pandas_udf(_normalize_rev_host, T.StringType())


def host_links_to_graph(
    edges: DataFrame,
    validate_host_names: bool = False,
    normalize_host_names: bool = False,
    tlds: frozenset[str] = DEFAULT_TLDS,
    distributed_ids: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(s, t) string edges → (vertices(name, id), edges(s, t) as ids).

    `distributed_ids=True` switches ID assignment to the partition-
    offset operator (operators/ids.py) — identical IDs (name is unique),
    no single-partition window; use it at scale.
    """
    names = (
        edges.select(F.col("s").alias("name"))
        .union(edges.select(F.col("t").alias("name")))
        .distinct()
    )
    if normalize_host_names:
        names = names.withColumn(
            "name", normalize_rev_host_udf(F.col("name"))
        ).dropna().distinct()
    if validate_host_names:
        names = names.filter(tld_is_valid("name", tlds))
    if distributed_ids:
        from cc_pyspark_spark.operators.ids import assign_sequential_ids  # noqa: PLC0415

        vertices = assign_sequential_ids(names, "name")
    else:
        vertices = names.withColumn(
            "id", F.row_number().over(W.orderBy("name")).cast("bigint")
        )

    s_ids = vertices.select(
        F.col("name").alias("s_name"), F.col("id").alias("s_id")
    )
    t_ids = vertices.select(
        F.col("name").alias("t_name"), F.col("id").alias("t_id")
    )
    int_edges = (
        edges.join(s_ids, edges.s == s_ids.s_name, "inner")
        .join(t_ids, edges.t == t_ids.t_name, "inner")
        .select(F.col("s_id").alias("s"), F.col("t_id").alias("t"))
        .filter(F.col("s") != F.col("t"))  # self-loop removal (:158)
        .dropDuplicates()
        .sortWithinPartitions("s", "t")
    )
    return vertices, int_edges
