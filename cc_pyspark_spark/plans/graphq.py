"""Graph analytics over a co-occurrence graph (beyond-reference).

The reference builds host-link graphs (hostlinks_to_graph.py) but runs
no graph *analytics*; PageRank/connected components live in
operators/pagerank.py under pytest. This registers a driver-gated graph
query: triangle counting with the degree-ordered orientation trick —
the standard distributed formulation (Schank's node-iterator++ /
Cohen's MapReduce variant): orient every edge from its lower-(degree,
id) endpoint to the higher one, build wedges only at each edge's tail,
and close them against the oriented edge set. Orientation bounds
per-vertex wedge fan-out by out-degree ≤ O(sqrt(|E|)) — the reason the
self-join doesn't explode on skewed (celebrity) vertices at 100 TB.

The graph: suppliers co-occurring in the same order (bounded fan-out:
an order has ≤ 7 lineitems, so the pair-generation join is keyed by
orderkey with ≤ 21 pairs per key). The oracle counts the SAME triangles
with a structurally different algorithm (id-ordered a<b<c triple join),
so the two engines agree only if both formulations are correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register


@register(
    "graph_triangle_stats",
    oracle="""
WITH os AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
), p AS (
  SELECT x.s AS a, y.s AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM os x JOIN os y ON x.o = y.o AND x.s < y.s
  GROUP BY 1, 2
), thr AS (
  SELECT quantile_cont(c, 0.5) AS thr FROM p
), e AS (
  SELECT a, b FROM p CROSS JOIN thr WHERE CAST(c AS DOUBLE) > thr
), d AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
  ) GROUP BY 1
), tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) FROM d) AS n_wedges,
       tri.n_triangles,
       CAST(3 * tri.n_triangles AS DOUBLE)
         / CAST((SELECT SUM((deg * (deg - 1)) // 2) FROM d) AS DOUBLE)
         AS clustering
FROM tri
""",
    description="Triangle counting + global clustering coefficient over the "
    "supplier co-order graph, using degree-ordered edge orientation (wedges "
    "built only at the lower-degree endpoint — caps fan-out at O(sqrt(E)) "
    "per vertex, which is what survives skew at 100 TB). Oracle counts the "
    "same triangles via the independent id-ordered a<b<c formulation, so "
    "agreement cross-checks the algorithm, not just the arithmetic",
    tags=("graph",),
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    os_ = t.lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s")
    ).distinct()
    # Edge = supplier pair co-occurring in MORE orders than the median
    # pair (relative threshold: scale-free sparsification — an absolute
    # cutoff would keep a complete graph at one SF and nothing at
    # another). quantile_cont interpolation is IEEE-identical in both
    # engines over the same integer multiset.
    pairs = (
        os_.alias("x")
        .join(os_.alias("y"), (F.col("x.o") == F.col("y.o")) & (F.col("x.s") < F.col("y.s")))
        .select(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    thr = pairs.agg(F.expr("percentile(c, 0.5)").alias("thr"))
    e = (
        pairs.crossJoin(F.broadcast(thr))
        .filter(F.col("c").cast("double") > F.col("thr"))
        .select("a", "b")
    )
    from cc_pyspark_spark.operators.pagerank import triangle_stats  # noqa: PLC0415

    return triangle_stats(e)
