"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Brute-force cosine top-k is the correctness baseline: broadcast the
(small) query set against the full corpus, dot products computed with
`zip_with` + `aggregate` (JVM-side higher-order functions — no Python).
At 100 TB the corpus side stays partitioned and only the query side is
broadcast, so there is no shuffle at all until the final per-query
top-k (TakeOrdered over k·|queries| rows).

Float determinism: elements are cast float→double (exact), the fold is
an explicit left-to-right sum in both engines, and +,*,sqrt,/ on
doubles are IEEE-identical — so the oracle hashes match without any
rounding fudge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


@register(
    "sim_cosine_topk",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                          (a, b) -> a + b)) AS nrm
  FROM e
), p AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         list_reduce(list_prepend(0.0,
             list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
             (a, b) -> a + b) / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), r AS (
  SELECT q_id, n_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
  FROM p
)
SELECT q_id, n_id, cos, rnk FROM r WHERE rnk <= {TOP_K}
""",
    description="Brute-force cosine top-k ANN baseline: broadcast queries × "
    "partitioned corpus, zip_with/aggregate dot product, per-query top-k",
    tags=("similarity", "bench"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    dot_self = (
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    )
    emb = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("nrm", F.expr(f"sqrt({dot_self})"))

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    dot = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    pairs = (
        c.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
        .withColumn("cos", F.expr(dot) / (F.col("qnrm") * F.col("cnrm")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cos", "rnk")
    )
