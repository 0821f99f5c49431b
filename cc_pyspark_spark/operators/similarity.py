"""Production ANN: IVF index over an embedding column (the scale path).

`plans/similarity.py` fixes the centroids (oracle replayability); this
module is the deployment variant: KMeans(seed) centroids over
L2-normalized vectors, bucket assignment as a column, and top-k search
probing `nprobe` buckets.

Scale shape: centroids are tiny (k × dim) and broadcast; the corpus is
partitioned (and at rest, partitioned *by bucket*) so a query touches
nprobe/k of the data; with nprobe == k the search is exhaustive and
exactly equals brute force — the invariant the tests pin.
"""

from __future__ import annotations

from cc_pyspark_spark.caching import track_cache

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"


def _normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = f"transform({vec_col}, x -> cast(x as double))"
    return df.select(
        F.col(id_col).alias("vid"), F.expr(v).alias("v")
    ).withColumn(
        "v",
        F.expr(
            f"transform(v, x -> x / sqrt({DOT.format(a='v', b='v')}))"
        ),
    )


def ivf_build(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """→ (assignments(vid, bucket, v), centroids(bucket, cv)).

    KMeans over normalized vectors (euclidean on the unit sphere ranks
    like cosine). Deterministic via seed + fixed init steps.
    """
    from pyspark.ml.clustering import KMeans  # noqa: PLC0415
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: PLC0415

    norm = _normalized(emb, id_col, vec_col).persist().transform(track_cache)
    feats = norm.withColumn("features", array_to_vector("v"))
    model = KMeans(k=k, seed=seed, maxIter=10).fit(feats)
    centroids = feats.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "bucket int, cv array<double>",
    )
    assigned = model.transform(feats).select(
        "vid", F.col("prediction").alias("bucket"), "v"
    )
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query_ids: list[int],
    top_k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k cosine neighbors per query, probing nprobe buckets."""
    q = assigned.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("q_id"), F.col("v").alias("qv")
    )
    # rank buckets per query by centroid similarity, keep nprobe
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "csim", F.expr(DOT.format(a="qv", b="cv"))
    )
    wq = W.partitionBy("q_id").orderBy(F.col("csim").desc(), F.col("bucket"))
    probe = (
        qc.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("q_id", "qv", "bucket")
    )
    cand = probe.join(assigned, "bucket").filter(F.col("vid") != F.col("q_id"))
    scored = cand.withColumn("cos", F.expr(DOT.format(a="qv", b="v")))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= top_k)
        .select("q_id", F.col("vid").alias("n_id"), "cos", "rnk")
    )


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_k: int = 5,
) -> DataFrame:
    """Exhaustive cosine top-k (ground truth for recall measurement)."""
    norm = _normalized(emb, id_col, vec_col)
    q = norm.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = norm.crossJoin(F.broadcast(q)).filter(F.col("vid") != F.col("q_id"))
    scored = pairs.withColumn("cos", F.expr(DOT.format(a="qv", b="v")))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= top_k)
        .select("q_id", F.col("vid").alias("n_id"), "cos", "rnk")
    )
