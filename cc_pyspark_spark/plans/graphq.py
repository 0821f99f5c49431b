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
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    # Orient each edge from its lower-(deg, id) endpoint to the higher:
    # a total order, so every undirected edge appears exactly once.
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias(
                "deg_head"
            ),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("head_id"),
        )
    )
    # Wedges at the tail u: (u -> v1), (u -> v2) with v1 ≺ v2 in the
    # same (deg, id) order; the triangle closes iff (v1 -> v2) is an
    # oriented edge (v1 ≺ v2 holds by construction, so one probe).
    w1 = oriented.select(
        "u",
        F.col("v").alias("v1"),
        F.col("deg_head").alias("dh1"),
        F.col("head_id").alias("h1"),
    )
    w2 = oriented.select(
        "u",
        F.col("v").alias("v2"),
        F.col("deg_head").alias("dh2"),
        F.col("head_id").alias("h2"),
    )
    wedges = w1.join(w2, "u").filter(
        (F.col("dh1") < F.col("dh2"))
        | ((F.col("dh1") == F.col("dh2")) & (F.col("h1") < F.col("h2")))
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
    )
    tri = closed.agg(F.count("*").alias("n_triangles"))
    stats = (
        deg.agg(
            F.count("*").alias("n_vertices"),
            F.sum(F.expr("(deg * (deg - 1)) div 2")).alias("n_wedges"),
        )
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .crossJoin(F.broadcast(tri))
    )
    return stats.select(
        "n_vertices",
        "n_edges",
        "n_wedges",
        "n_triangles",
        (
            (F.lit(3) * F.col("n_triangles")).cast("double")
            / F.col("n_wedges").cast("double")
        ).alias("clustering"),
    )
