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

from cc_pyspark_spark.caching import track_cache

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


# --------------------------------------------------- IVF-bucketed ANN

N_CENTROIDS = 8  # vec_id in [490, 498) serve as fixed "centroids"
IVF_TOP_K = 3


_DUCK_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i] * {b}[i])), (x, y) -> x + y)"
)


def _duck_ivf_assign(norm_cte: str, bucket_col: str, corpus_where: str = "") -> str:
    """CTE fragment `cent` + `assign` + `qbest`: cosine-nearest-centroid
    assignment over a pre-existing norm CTE (vec_id, v, nrm). ONE
    definition feeds the IVF oracle AND the IVF+PQ composition — the
    same single-source rule as _duck_pq_base/_duck_minhash_bands, so
    the coarse quantizers cannot drift apart."""
    return f"""cent AS (
  SELECT vec_id AS {bucket_col}, v AS cv, nrm AS cnrm FROM {norm_cte}
  WHERE vec_id >= 490 AND vec_id < {490 + N_CENTROIDS}
), assign AS (
  SELECT vec_id, {bucket_col} FROM (
    SELECT {norm_cte}.vec_id, cent.{bucket_col},
           ROW_NUMBER() OVER (PARTITION BY {norm_cte}.vec_id
             ORDER BY {_DUCK_DOT.format(a=norm_cte + '.v', b='cent.cv')} / ({norm_cte}.nrm * cent.cnrm) DESC,
                      cent.{bucket_col}) AS rk
    FROM {norm_cte}, cent{corpus_where}) WHERE rk = 1
), qbest AS (
  SELECT vec_id AS q_id, {bucket_col} FROM assign WHERE vec_id < {N_QUERIES}
)"""


def _duck_ivf_oracle() -> str:
    dot = _DUCK_DOT
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v,
         sqrt({dot.format(a='v', b='v')}) AS nrm
  FROM e
), {_duck_ivf_assign("n", "c_id")}, scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         {dot.format(a='q.v', b='c.v')} / (q.nrm * c.nrm) AS cos
  FROM qbest
  JOIN n q ON q.vec_id = qbest.q_id
  JOIN assign a ON a.c_id = qbest.c_id AND a.vec_id <> qbest.q_id
  JOIN n c ON c.vec_id = a.vec_id
), r AS (
  SELECT q_id, n_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
  FROM scored
)
SELECT q_id, n_id, cos, rnk FROM r WHERE rnk <= {IVF_TOP_K}
"""


@register(
    "sim_ann_ivf",
    oracle=_duck_ivf_oracle(),
    description="IVF-bucketed ANN: assign corpus vectors to nearest of "
    f"{N_CENTROIDS} fixed centroids, probe only the query's bucket — the "
    "scale path (per-bucket partitioning caps the candidate set; at 100 TB "
    "buckets are partition keys and only centroids are broadcast)",
    tags=("similarity",),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    dot_self = "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    emb = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("nrm", F.expr(f"sqrt({dot_self})"))

    cent = emb.filter(
        (F.col("vec_id") >= 490) & (F.col("vec_id") < 490 + N_CENTROIDS)
    ).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    dot_c = "aggregate(zip_with(v, cv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    w_assign = W.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("c_id")
    )
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("sim", F.expr(dot_c) / (F.col("nrm") * F.col("cnrm")))
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "c_id")
    )
    qbest = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("c_id").alias("qc")
    )
    q = emb.select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    ).join(qbest, "q_id")
    bucket = assign.join(
        emb, "vec_id"
    ).select(
        F.col("c_id").alias("qc"),
        F.col("vec_id").alias("n_id"),
        F.col("v").alias("cv2"),
        F.col("nrm").alias("cnrm2"),
    )
    dot_q = "aggregate(zip_with(qv, cv2, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    scored = (
        bucket.join(F.broadcast(q), "qc")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos", F.expr(dot_q) / (F.col("qnrm") * F.col("cnrm2")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("q_id", "n_id", "cos", "rnk")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 50
), s AS (
  SELECT vec_id, v,
         list_reduce(list_prepend(0.0, list_transform(v, x -> abs(x))),
                     (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS max_abs
  FROM e
), flat AS (
  SELECT vec_id, max_abs, i.i AS dim_idx, v[i.i] AS x
  FROM s, (SELECT unnest(range(1, 65)) AS i) i
)
SELECT vec_id,
       CAST(dim_idx AS INT) AS dim_idx,
       CAST(floor(x / max_abs * 127.0 + 0.5) AS BIGINT) AS q
FROM flat
""",
    description="Int8 embedding quantization (per-vector max-abs scale, "
    "floor(x*127/scale+0.5)) — storage compression stage of an embedding "
    "pipeline, exact across engines (floor, not round)",
    tags=("similarity", "multimodal"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    e = t.embeddings.filter(F.col("vec_id") < 50).select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    max_abs = F.expr(
        "aggregate(v, 0D, (a, x) -> CASE WHEN abs(x) > a THEN abs(x) ELSE a END)"
    )
    s = e.withColumn("max_abs", max_abs)
    flat = s.select(
        "vec_id",
        "max_abs",
        F.posexplode("v").alias("pos", "x"),
    )
    return flat.select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("dim_idx"),
        F.floor(F.col("x") / F.col("max_abs") * 127.0 + 0.5)
        .cast("bigint")
        .alias("q"),
    )


# ------------------------------------------- product quantization (PQ)

#: PQ layout: 64-dim vectors split into PQ_BLOCKS subvectors of
#: PQ_SUBDIM dims; per-block codebooks are the corresponding slices of
#: the seed vectors (vec_id PQ_SEED_BASE..+PQ_CODEBOOK-1) —
#: deterministic and SQL-replayable, same discipline as the IVF seed
#: centroids. Production swaps in k-means codebooks; the assignment
#: plan (broadcast codebook, per-block argmin) is identical.
PQ_BLOCKS = 4
PQ_SUBDIM = 16
PQ_CODEBOOK = 8
PQ_SEED_BASE = 480
PQ_MAX_ID = 200  # quantize the first 200 vectors (bounded driver output)


def _pq_blocks_cb(e):
    """Shared PQ fragments: corpus subvector blocks + per-block codebook
    (seed-sliced). ONE definition feeds embedding_pq_codes, the ADC
    search, and the rerank pipeline — the r6 deterministic-fold lesson:
    twin plan fragments must not be maintained in duplicate."""
    block_structs = [
        F.struct(
            F.lit(b).alias("block"),
            F.slice("v", b * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
        )
        for b in range(PQ_BLOCKS)
    ]
    blocks = (
        e.filter(F.col("vec_id") < PQ_MAX_ID)
        .select("vec_id", F.explode(F.array(*block_structs)).alias("bk"))
        .select("vec_id", "bk.block", "bk.sv")
    )
    cb = (
        e.filter(
            (F.col("vec_id") >= PQ_SEED_BASE)
            & (F.col("vec_id") < PQ_SEED_BASE + PQ_CODEBOOK)
        )
        .select(
            (F.col("vec_id") - PQ_SEED_BASE).alias("c_id"),
            F.explode(F.array(*block_structs)).alias("bk"),
        )
        .select("c_id", F.col("bk.block").alias("block"), F.col("bk.sv").alias("cv"))
    )
    return blocks, cb


_PQ_SQ_ERR = (
    "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), "
    "0D, (acc, z) -> acc + z)"
)


def _pq_codes_lut(t: Catalog):
    """Corpus PQ codes + per-query block/codeword distance LUT — the
    two halves every PQ search composes (whole-corpus ADC, rerank, and
    the IVF-pruned variant)."""
    e = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    blocks, cb = _pq_blocks_cb(e)
    sq_err = F.expr(_PQ_SQ_ERR)
    codes = (
        blocks.join(F.broadcast(cb), "block")
        .withColumn("sq_err", sq_err)
        .groupBy("vec_id", "block")
        .agg(F.min(F.struct("sq_err", "c_id")).alias("m"))
        .select("vec_id", "block", F.col("m.c_id").alias("code"))
    )
    lut = (
        blocks.filter(F.col("vec_id") < N_QUERIES)
        .withColumnRenamed("vec_id", "q_id")
        .join(F.broadcast(cb), "block")
        .withColumn("d", sq_err)
        .select("q_id", "block", "c_id", "d")
    )
    return codes, lut


#: Deterministic ADC distance: per-block distances are collected,
#: sorted by block id, and LEFT-FOLDED in that fixed order (ADVICE r6:
#: F.sum over doubles folds in partition-dependent order); the DuckDB
#: twin folds list(d ORDER BY block) identically (0D + d0 == d0).
_ADC_FOLD = (
    "aggregate(array_sort(collect_list(struct(block, d))), "
    "0D, (acc, z) -> acc + z.d)"
)


def _pq_adc_distances(t: Catalog):
    """(q_id, n_id, adc_dist) for every query x corpus pair, computed
    entirely in the compressed domain."""
    codes, lut = _pq_codes_lut(t)
    return (
        codes.join(F.broadcast(lut), ["block"])
        .filter((F.col("c_id") == F.col("code")) & (F.col("vec_id") != F.col("q_id")))
        .groupBy("q_id", F.col("vec_id").alias("n_id"))
        .agg(F.expr(_ADC_FOLD).alias("adc_dist"))
    )


def _duck_pq_oracle() -> str:
    sq = (
        "list_reduce(list_prepend(0.0, "
        "list_transform(range(1, {n} + 1), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        "(x, y) -> x + y)"
    )
    dist = sq.format(a="s.sv", b="c.cv", n=PQ_SUBDIM)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), blocks AS (
  SELECT vec_id, b.b AS block,
         list_slice(v, b.b * {PQ_SUBDIM} + 1, (b.b + 1) * {PQ_SUBDIM}) AS sv
  FROM e, (SELECT unnest(range(0, {PQ_BLOCKS})) AS b) b
  WHERE vec_id < {PQ_MAX_ID}
), cb AS (
  SELECT vec_id - {PQ_SEED_BASE} AS c_id, b.b AS block,
         list_slice(v, b.b * {PQ_SUBDIM} + 1, (b.b + 1) * {PQ_SUBDIM}) AS cv
  FROM e, (SELECT unnest(range(0, {PQ_BLOCKS})) AS b) b
  WHERE vec_id >= {PQ_SEED_BASE} AND vec_id < {PQ_SEED_BASE + PQ_CODEBOOK}
), scored AS (
  SELECT s.vec_id, s.block, c.c_id, {dist} AS sq_err,
         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.block
                            ORDER BY {dist}, c.c_id) AS rk
  FROM blocks s JOIN cb c ON s.block = c.block
)
SELECT vec_id,
       CAST(block AS BIGINT) AS block,
       CAST(c_id AS BIGINT) AS code,
       sq_err
FROM scored WHERE rk = 1
"""


@register(
    "embedding_pq_codes",
    oracle=_duck_pq_oracle(),
    description="Product quantization: vectors split into "
    f"{PQ_BLOCKS} x {PQ_SUBDIM}-dim subvectors, each assigned the "
    "nearest of a per-block codebook (seed-sliced here; k-means in "
    "production) by exact L2 with id tie-break (min-struct aggregation: "
    "the argmin collapses map-side, so the one exchange carries a single "
    "row per (vector, block)). The ANN memory-compression stage beyond "
    "int8: codebook broadcasts, corpus never self-joins",
    tags=("similarity", "multimodal"),
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    blocks, cb = _pq_blocks_cb(e)
    sq_err = F.expr(_PQ_SQ_ERR)
    # argmin as min-of-struct: lexicographic (sq_err, c_id) ordering is
    # exactly the oracle's ORDER BY dist, c_id tie-break, and partial
    # aggregation collapses the 8 codebook candidates map-side.
    return (
        blocks.join(F.broadcast(cb), "block")
        .withColumn("sq_err", sq_err)
        .groupBy("vec_id", "block")
        .agg(F.min(F.struct("sq_err", "c_id")).alias("m"))
        .select(
            "vec_id",
            F.col("block").cast("bigint").alias("block"),
            F.col("m.c_id").cast("bigint").alias("code"),
            F.col("m.sq_err").alias("sq_err"),
        )
    )


def _duck_pq_base() -> str:
    """Shared CTE chain ending in `codes` + `lut` — the SQL twin of the
    corpus-code / query-LUT halves of _pq_adc_distances. The ADC
    oracle, the rerank oracle, AND the IVF+PQ composition all build on
    this text, so each PQ fragment lives in exactly one place on each
    engine side."""
    sq = (
        "list_reduce(list_prepend(0.0, "
        "list_transform(range(1, {n} + 1), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        "(x, y) -> x + y)"
    )
    d_assign = sq.format(a="s.sv", b="c.cv", n=PQ_SUBDIM)
    d_lut = sq.format(a="q.sv", b="c.cv", n=PQ_SUBDIM)
    return f"""
e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), blocks AS (
  SELECT vec_id, b.b AS block,
         list_slice(v, b.b * {PQ_SUBDIM} + 1, (b.b + 1) * {PQ_SUBDIM}) AS sv
  FROM e, (SELECT unnest(range(0, {PQ_BLOCKS})) AS b) b
  WHERE vec_id < {PQ_MAX_ID}
), cb AS (
  SELECT vec_id - {PQ_SEED_BASE} AS c_id, b.b AS block,
         list_slice(v, b.b * {PQ_SUBDIM} + 1, (b.b + 1) * {PQ_SUBDIM}) AS cv
  FROM e, (SELECT unnest(range(0, {PQ_BLOCKS})) AS b) b
  WHERE vec_id >= {PQ_SEED_BASE} AND vec_id < {PQ_SEED_BASE + PQ_CODEBOOK}
), codes AS (
  SELECT vec_id, block, c_id AS code FROM (
    SELECT s.vec_id, s.block, c.c_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.block
                              ORDER BY {d_assign}, c.c_id) AS rk
    FROM blocks s JOIN cb c ON s.block = c.block) WHERE rk = 1
), lut AS (
  SELECT q.vec_id AS q_id, q.block, c.c_id, {d_lut} AS d
  FROM blocks q JOIN cb c ON q.block = c.block
  WHERE q.vec_id < {N_QUERIES}
)"""


def _duck_pq_adc_core() -> str:
    """`_duck_pq_base` + the whole-corpus `adc`(q_id, n_id, adc_dist)
    scoring CTE (ADC top-k and rerank oracles compose this)."""
    return f"""{_duck_pq_base()}, adc AS (
  -- block-ordered left fold, matching Spark's aggregate(array_sort(...))
  -- — a plain SUM folds doubles in unspecified order on both engines
  SELECT l.q_id, x.vec_id AS n_id,
         list_reduce(list(l.d ORDER BY l.block), (acc, x) -> acc + x)
           AS adc_dist
  FROM codes x JOIN lut l ON l.block = x.block AND l.c_id = x.code
  WHERE x.vec_id <> l.q_id
  GROUP BY l.q_id, x.vec_id
)"""


def _duck_pq_adc_oracle() -> str:
    return f"""
WITH {_duck_pq_adc_core()},
r AS (
  SELECT q_id, n_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY adc_dist, n_id) AS rnk
  FROM adc
)
SELECT q_id, n_id, adc_dist, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {IVF_TOP_K}
"""


@register(
    "sim_ann_pq_adc",
    oracle=_duck_pq_adc_oracle(),
    description="PQ asymmetric-distance (ADC) top-k search: per-query "
    "lookup tables (query-subvector -> codebook distances, a "
    "queries x blocks x codebook table that always broadcasts) joined to "
    "the corpus PQ codes and summed — the corpus side never touches raw "
    "floats, which is the whole point of PQ at billion-vector scale. "
    "Exact arithmetic — every float reduction, INCLUDING the final "
    "distance sum, folds in an explicit order (block id), so the result "
    "is partition-layout invariant; deterministic (dist, id) tie-break",
    tags=("similarity",),
)
def sim_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    adc = _pq_adc_distances(Catalog(spark, sf_dir))
    w = W.partitionBy("q_id").orderBy(F.col("adc_dist"), F.col("n_id"))
    return (
        adc.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("q_id", "n_id", "adc_dist", "rnk")
    )


# ----------------------------------- two-stage ANN: ADC -> exact rerank

PQ_SHORTLIST = 10  # ADC candidates per query fed to the exact stage
RERANK_K = 3


def _duck_pq_rerank_oracle() -> str:
    dot = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i])), (x, y) -> x + y)"
    )
    return f"""
WITH {_duck_pq_adc_core()},
nrm AS (
  SELECT vec_id, v,
         sqrt({dot.format(a='v', b='v')}) AS nrm
  FROM e
), short AS (
  SELECT q_id, n_id,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY adc_dist, n_id) AS adc_rnk
  FROM adc QUALIFY adc_rnk <= {PQ_SHORTLIST}
), exact AS (
  SELECT s.q_id, s.n_id, s.adc_rnk,
         {dot.format(a='q.v', b='n.v')} / (q.nrm * n.nrm) AS cos
  FROM short s
  JOIN nrm q ON q.vec_id = s.q_id
  JOIN nrm n ON n.vec_id = s.n_id
)
SELECT q_id, n_id, cos, CAST(adc_rnk AS BIGINT) AS adc_rnk,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY cos DESC, n_id) AS BIGINT) AS rnk
FROM exact QUALIFY rnk <= {RERANK_K}
"""


@register(
    "sim_ann_pq_rerank",
    oracle=_duck_pq_rerank_oracle(),
    description="Two-stage ANN (beyond-reference, the production serving "
    f"shape): PQ-ADC scores the whole corpus in the compressed domain, a "
    f"{PQ_SHORTLIST}-deep shortlist per query is re-ranked by EXACT cosine "
    "against raw vectors, emitting both the ADC position and the exact "
    "rank (their disagreement is the measured quantization error). Raw "
    "floats are touched for only |queries|x shortlist rows — the broadcast "
    "shortlist join prunes the corpus scan; all float folds are "
    "explicit-order (block id / left-to-right), deterministic tie-breaks "
    "throughout",
    tags=("similarity",),
)
def sim_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    adc = _pq_adc_distances(t)
    w_adc = W.partitionBy("q_id").orderBy(F.col("adc_dist"), F.col("n_id"))
    short = (
        adc.withColumn("adc_rnk", F.row_number().over(w_adc).cast("bigint"))
        .filter(F.col("adc_rnk") <= PQ_SHORTLIST)
        .select("q_id", "n_id", "adc_rnk")
    )
    e = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    dot_self = "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    nrm = e.withColumn("nrm", F.expr(f"sqrt({dot_self})"))
    # Only the N_QUERIES query vectors broadcast — the filter must come
    # BEFORE the hint, or the whole corpus's raw floats ship to every
    # executor (code-review r7).
    qv = (
        nrm.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
    )
    # The shortlist (|queries| x PQ_SHORTLIST rows) broadcasts into the
    # corpus scan — the exact stage reads raw floats for those ids only.
    nv = nrm.select(
        F.col("vec_id").alias("n_id"),
        F.col("v").alias("nv"),
        F.col("nrm").alias("nnrm"),
    ).join(F.broadcast(short), "n_id")
    dot_qn = "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    exact = nv.join(F.broadcast(qv), "q_id").withColumn(
        "cos", F.expr(dot_qn) / (F.col("qnrm") * F.col("nnrm"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        exact.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= RERANK_K)
        .select("q_id", "n_id", "cos", "adc_rnk", "rnk")
    )


# ------------------------------- composed IVF + PQ (the billion-vector
# recipe: coarse quantizer prunes the corpus, product codes score it)


def _duck_ivf_pq_oracle() -> str:
    dot = _DUCK_DOT
    return f"""
WITH {_duck_pq_base()},
nv AS (
  SELECT vec_id, v, sqrt({dot.format(a='v', b='v')}) AS nrm FROM e
), {_duck_ivf_assign("nv", "bucket", f" WHERE nv.vec_id < {PQ_MAX_ID}")}, adcb AS (
  SELECT l.q_id, x.vec_id AS n_id,
         list_reduce(list(l.d ORDER BY l.block), (acc, x) -> acc + x)
           AS adc_dist
  FROM codes x
  JOIN lut l ON l.block = x.block AND l.c_id = x.code
  JOIN assign a ON a.vec_id = x.vec_id
  JOIN qbest qb ON qb.q_id = l.q_id AND qb.bucket = a.bucket
  WHERE x.vec_id <> l.q_id
  GROUP BY l.q_id, x.vec_id
)
SELECT q_id, n_id, adc_dist,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY adc_dist, n_id) AS BIGINT) AS rnk
FROM adcb QUALIFY rnk <= {IVF_TOP_K}
"""


@register(
    "sim_ann_ivf_pq",
    oracle=_duck_ivf_pq_oracle(),
    description="Composed IVF + PQ search — the billion-vector serving "
    "recipe (FAISS IVFPQ shape): the coarse quantizer assigns every "
    "corpus vector to its nearest of "
    f"{N_CENTROIDS} centroids, the query probes ONLY its own bucket, and "
    "candidates are scored in the compressed domain via the PQ LUT join. "
    "At 100 TB the bucket id is the partition key, so a probe touches "
    "1/n_centroids of the corpus and raw floats never move — only "
    "centroids and the queries' LUTs broadcast. Same deterministic "
    "block-ordered distance fold and (dist, id) tie-break as "
    "sim_ann_pq_adc; sharing the assignment CTEs with sim_ann_ivf and "
    "the code/LUT CTEs with the ADC pair keeps all four oracles in "
    "lock-step",
    tags=("similarity", "scale"),
)
def sim_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    dot_self = "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    nv = e.withColumn("nrm", F.expr(f"sqrt({dot_self})"))
    cent = nv.filter(
        (F.col("vec_id") >= 490) & (F.col("vec_id") < 490 + N_CENTROIDS)
    ).select(
        F.col("vec_id").alias("bucket"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    dot_c = "aggregate(zip_with(v, cv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    w_assign = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("bucket"))
    assign = (
        nv.filter(F.col("vec_id") < PQ_MAX_ID)
        .crossJoin(F.broadcast(cent))
        .withColumn("sim", F.expr(dot_c) / (F.col("nrm") * F.col("cnrm")))
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "bucket")
    )
    qbest = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("bucket").alias("qbucket")
    )
    codes, lut = _pq_codes_lut(t)
    # Corpus side: codes carry their IVF bucket; the join below prunes
    # to the query's bucket BEFORE any distance math.
    codes_b = codes.join(assign, "vec_id")
    lut_b = lut.join(F.broadcast(qbest), "q_id")
    adc = (
        codes_b.join(F.broadcast(lut_b), ["block"])
        .filter(
            (F.col("c_id") == F.col("code"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("q_id"))
        )
        .groupBy("q_id", F.col("vec_id").alias("n_id"))
        .agg(F.expr(_ADC_FOLD).alias("adc_dist"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("adc_dist"), F.col("n_id"))
    return (
        adc.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("q_id", "n_id", "adc_dist", "rnk")
    )


# --------------------------- sparse TF-IDF document similarity (text)

SPARSE_TOPK = 3
#: Tokens present in more than half the corpus carry no discriminative
#: weight and quadratically dominate the inverted-index join — prune
#: them. THE scale lever: posting-list length caps the join fan-out.
SPARSE_DF_CAP_NUM = 1
SPARSE_DF_CAP_DEN = 2
#: ABSOLUTE posting-list cap (r7 VERDICT ask #3): the n/2 relative cap
#: alone still admits (n/2)^2 candidate pairs from one ubiquitous
#: token at corpus scale. A token's join fan-out is df^2, so capping
#: df at an absolute length bounds per-token candidates at
#: SPARSE_DF_ABS_CAP^2 (~10^8 pairs/token at the default — a bucket's
#: worth of work) REGARDLESS of corpus size; rarer tokens carry the
#: similarity signal anyway (idf ~ n/df). Doesn't bind below n = 2e4
#: docs, so fixture results are unchanged; at 100 TB it is the lever
#: that keeps the inverted-index join linear in corpus size.
SPARSE_DF_ABS_CAP = 10_000


def _duck_sparse_tfidf_oracle(max_posting: int = SPARSE_DF_ABS_CAP) -> str:
    from cc_pyspark_spark.functions.text import TOKEN_PATTERN

    toks = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), w AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS DOUBLE) * ((CAST(nd.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                                  / (CAST(df.df AS DOUBLE) + 0.5)) AS w
  FROM tf JOIN df USING (token) CROSS JOIN nd
  WHERE df.df * {SPARSE_DF_CAP_DEN} <= nd.n_docs * {SPARSE_DF_CAP_NUM}
    AND df.df <= {max_posting}
), nrm AS (
  SELECT doc_id,
         sqrt(list_reduce(list_prepend(0.0, list(w * w ORDER BY token)),
                          (a, x) -> a + x)) AS nrm
  FROM w GROUP BY 1
), contrib AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.token, a.w * b.w AS p
  FROM w a JOIN w b ON a.token = b.token AND a.doc_id <> b.doc_id
), dots AS (
  SELECT a_id, b_id,
         list_reduce(list_prepend(0.0, list(p ORDER BY token)),
                     (a, x) -> a + x) AS dot
  FROM contrib GROUP BY 1, 2
), cosd AS (
  SELECT d.a_id, d.b_id, d.dot / (na.nrm * nb.nrm) AS cos
  FROM dots d JOIN nrm na ON na.doc_id = d.a_id
              JOIN nrm nb ON nb.doc_id = d.b_id
)
SELECT a_id, b_id, cos,
       CAST(ROW_NUMBER() OVER (PARTITION BY a_id
                               ORDER BY cos DESC, b_id) AS BIGINT) AS rnk
FROM cosd QUALIFY rnk <= {SPARSE_TOPK}
"""


@register(
    "sim_sparse_tfidf_topk",
    oracle=_duck_sparse_tfidf_oracle(),
    description="Sparse TF-IDF document similarity (beyond-reference): "
    "inverted-index self-join on tokens with BOTH a df <= n/2 relative "
    "cap and an ABSOLUTE max_posting parameter (default 10^4, r8): join "
    "fan-out per token is df^2, so the absolute cap bounds candidates "
    "at max_posting^2 per token independent of corpus size — the 100 TB "
    "lever, now code rather than prose; ubiquitous tokens carry no "
    "signal anyway. BM25-ish rational idf "
    "(no ln — bit-stable), cosine over shared tokens, top-k similar docs "
    "per doc. Every float fold is token-ordered, so the full-value oracle "
    "and partition invariance hold. The dense-embedding twin is "
    "sim_cosine_topk; this is the lexical half of hybrid retrieval",
    tags=("similarity", "text"),
)
def sim_sparse_tfidf_topk(
    spark: SparkSession, sf_dir: str, max_posting: int = SPARSE_DF_ABS_CAP
) -> DataFrame:
    from cc_pyspark_spark.functions.text import tokenize

    t = Catalog(spark, sf_dir)
    tf = (
        t.documents.select("doc_id", F.explode(tokenize("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = t.documents.agg(F.count("*").alias("n_docs"))
    w = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(nd))
        .filter(
            (
                F.col("df") * SPARSE_DF_CAP_DEN
                <= F.col("n_docs") * SPARSE_DF_CAP_NUM
            )
            # absolute fan-out bound: <= max_posting^2 pairs per token
            & (F.col("df") <= F.lit(max_posting))
        )
        .select(
            "doc_id",
            "token",
            (
                F.col("tf").cast("double")
                * (
                    (
                        F.col("n_docs").cast("double")
                        - F.col("df").cast("double")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
            ).alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("token", (F.col("w") * F.col("w")).alias("w2")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["w2"],
            )
        ).alias("nrm")
    )
    a = w.select(
        F.col("doc_id").alias("a_id"), "token", F.col("w").alias("wa")
    )
    b = w.select(
        F.col("doc_id").alias("b_id"), "token", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "token")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct("token", (F.col("wa") * F.col("wb")).alias("p"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["p"],
            ).alias("dot")
        )
    )
    na = nrm.select(F.col("doc_id").alias("a_id"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("b_id"), F.col("nrm").alias("nb"))
    # na/nb are O(|docs|) — unlike the scalar n_docs above they must
    # NOT broadcast; a plain shuffled join on the pair ids is the
    # scale-safe shape.
    cosd = (
        dots.join(na, "a_id")
        .join(nb, "b_id")
        .select("a_id", "b_id", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cos"))
    )
    win = W.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("b_id"))
    return (
        cosd.withColumn("rnk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rnk") <= SPARSE_TOPK)
        .select("a_id", "b_id", "cos", "rnk")
    )


# --------------------- residual IVFADC (FAISS IVFADC standard, r8)
#
# The raw-vector PQ above quantizes v directly; the production IVFADC
# recipe quantizes the RESIDUAL v - c(v) instead: residuals of vectors
# sharing a coarse centroid have much smaller variance than raw
# vectors, so the same codebook budget spends its codewords on the
# part of the vector the coarse quantizer did not already explain —
# and ||q - x||^2 == ||(q-c) - (x-c)||^2 exactly when q probes x's
# bucket, so residual-domain ADC approximates the same distances with
# strictly less quantization error (pinned in
# tests/test_pq_rerank.py::test_residual_codes_reconstruct_better).


def _residual_assign(nv, lo_extra: int, hi_extra: int):
    """(vec_id, bucket) coarse assignment covering the corpus range AND
    [lo_extra, hi_extra) (the codebook seeds need residuals too)."""
    cent = nv.filter(
        (F.col("vec_id") >= 490) & (F.col("vec_id") < 490 + N_CENTROIDS)
    ).select(
        F.col("vec_id").alias("bucket"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    dot_c = "aggregate(zip_with(v, cv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    w_assign = W.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("bucket")
    )
    assign = (
        nv.filter(
            (F.col("vec_id") < PQ_MAX_ID)
            | ((F.col("vec_id") >= lo_extra) & (F.col("vec_id") < hi_extra))
        )
        .crossJoin(F.broadcast(cent))
        .withColumn("sim", F.expr(dot_c) / (F.col("nrm") * F.col("cnrm")))
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "bucket")
    )
    return cent, assign


def _duck_ivfpq_residual_oracle() -> str:
    dot = _DUCK_DOT
    sq = (
        "list_reduce(list_prepend(0.0, "
        "list_transform(range(1, {n} + 1), i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        "(x, y) -> x + y)"
    )
    d_assign = sq.format(a="s.sv", b="c.cv", n=PQ_SUBDIM)
    d_lut = sq.format(a="q.sv", b="c.cv", n=PQ_SUBDIM)
    seed_where = (
        f"(nv.vec_id < {PQ_MAX_ID} OR (nv.vec_id >= {PQ_SEED_BASE} "
        f"AND nv.vec_id < {PQ_SEED_BASE + PQ_CODEBOOK}))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), nv AS (
  SELECT vec_id, v, sqrt({dot.format(a='v', b='v')}) AS nrm FROM e
), {_duck_ivf_assign("nv", "bucket", f" WHERE {seed_where}")}, res AS (
  SELECT a.vec_id, a.bucket,
         list_transform(range(1, len(nv.v) + 1),
                        i -> nv.v[i] - cent.cv[i]) AS r
  FROM assign a JOIN nv ON nv.vec_id = a.vec_id
  JOIN cent ON cent.bucket = a.bucket
), rblocks AS (
  SELECT vec_id, bucket, b.b AS block,
         list_slice(r, b.b * {PQ_SUBDIM} + 1, (b.b + 1) * {PQ_SUBDIM}) AS sv
  FROM res, (SELECT unnest(range(0, {PQ_BLOCKS})) AS b) b
), rcb AS (
  SELECT vec_id - {PQ_SEED_BASE} AS c_id, block, sv AS cv
  FROM rblocks
  WHERE vec_id >= {PQ_SEED_BASE} AND vec_id < {PQ_SEED_BASE + PQ_CODEBOOK}
), rcodes AS (
  SELECT vec_id, bucket, block, c_id AS code FROM (
    SELECT s.vec_id, s.bucket, s.block, c.c_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.block
                              ORDER BY {d_assign}, c.c_id) AS rk
    FROM rblocks s JOIN rcb c ON s.block = c.block
    WHERE s.vec_id < {PQ_MAX_ID}) WHERE rk = 1
), rlut AS (
  SELECT q.vec_id AS q_id, q.bucket AS qbucket, q.block, c.c_id, {d_lut} AS d
  FROM rblocks q JOIN rcb c ON q.block = c.block
  WHERE q.vec_id < {N_QUERIES}
), adcb AS (
  SELECT l.q_id, x.vec_id AS n_id,
         list_reduce(list(l.d ORDER BY l.block), (acc, x) -> acc + x)
           AS adc_dist
  FROM rcodes x
  JOIN rlut l ON l.block = x.block AND l.c_id = x.code
             AND l.qbucket = x.bucket
  WHERE x.vec_id <> l.q_id
  GROUP BY l.q_id, x.vec_id
)
SELECT q_id, n_id, adc_dist,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY adc_dist, n_id) AS BIGINT) AS rnk
FROM adcb QUALIFY rnk <= {IVF_TOP_K}
"""


@register(
    "sim_ann_ivfpq_residual",
    oracle=_duck_ivfpq_residual_oracle(),
    description="Residual IVFADC — the FAISS-standard refinement of "
    "sim_ann_ivf_pq: PQ quantizes the residual v - c(v) instead of the "
    "raw vector, spending the codebook budget on what the coarse "
    "quantizer did not already explain — on CLUSTERED corpora (the real "
    "embedding regime) residual variance is a fraction of raw variance "
    "and reconstruction error drops sharply (pinned on synthetic "
    "clustered data in pytest; the near-uniform parquet fixture is the "
    "documented counter-case where coarse centroids explain nothing), "
    "and "
    "||q - x||^2 = ||(q-c) - (x-c)||^2 exactly within a probed bucket, "
    "so the residual-domain LUT fold approximates the true distance "
    "with less error. Same deterministic block-ordered fold, bucket "
    "pruning, and (dist, id) tie-break as the raw twin; the residual "
    "codebook is the seed vectors' OWN residuals (deterministic, "
    "SQL-replayable; production swaps k-means residual codebooks)",
    tags=("similarity", "scale"),
)
def sim_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    e = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    dot_self = "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    nv = e.withColumn("nrm", F.expr(f"sqrt({dot_self})"))
    cent, assign = _residual_assign(
        nv, PQ_SEED_BASE, PQ_SEED_BASE + PQ_CODEBOOK
    )
    res = (
        assign.join(nv, "vec_id")
        .join(
            cent.select("bucket", "cv"), "bucket"
        )
        .select(
            "vec_id",
            "bucket",
            F.expr("zip_with(v, cv, (x, y) -> x - y)").alias("r"),
        )
    )
    block_structs = [
        F.struct(
            F.lit(b).alias("block"),
            F.slice("r", b * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
        )
        for b in range(PQ_BLOCKS)
    ]
    rblocks = res.select(
        "vec_id", "bucket", F.explode(F.array(*block_structs)).alias("bk")
    ).select("vec_id", "bucket", "bk.block", "bk.sv")
    rcb = (
        rblocks.filter(
            (F.col("vec_id") >= PQ_SEED_BASE)
            & (F.col("vec_id") < PQ_SEED_BASE + PQ_CODEBOOK)
        )
        .select(
            (F.col("vec_id") - PQ_SEED_BASE).alias("c_id"),
            "block",
            F.col("sv").alias("cv"),
        )
    )
    sq_err = F.expr(_PQ_SQ_ERR)
    rcodes = (
        rblocks.filter(F.col("vec_id") < PQ_MAX_ID)
        .join(F.broadcast(rcb), "block")
        .withColumn("sq_err", sq_err)
        .groupBy("vec_id", "bucket", "block")
        .agg(F.min(F.struct("sq_err", "c_id")).alias("m"))
        .select("vec_id", "bucket", "block", F.col("m.c_id").alias("code"))
    )
    rlut = (
        rblocks.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("bucket").alias("qbucket"),
            "block",
            "sv",
        )
        .join(F.broadcast(rcb), "block")
        .withColumn("d", sq_err)
        .select("q_id", "qbucket", "block", "c_id", "d")
    )
    adc = (
        rcodes.join(F.broadcast(rlut), ["block"])
        .filter(
            (F.col("c_id") == F.col("code"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("q_id"))
        )
        .groupBy("q_id", F.col("vec_id").alias("n_id"))
        .agg(F.expr(_ADC_FOLD).alias("adc_dist"))
    )
    w = W.partitionBy("q_id").orderBy("adc_dist", "n_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("q_id", "n_id", "adc_dist", "rnk")
    )


# ------------------------------ hybrid fusion: reciprocal-rank fusion

RRF_K = 60  # standard RRF damping constant
RRF_TOP = 3


def _duck_rrf_oracle() -> str:
    ivf = _duck_ivf_oracle()
    adc = _duck_pq_adc_oracle()
    return f"""
WITH ivf AS ({ivf}), adc AS ({adc}),
fused AS (
  SELECT COALESCE(ivf.q_id, adc.q_id) AS q_id,
         COALESCE(ivf.n_id, adc.n_id) AS n_id,
         COALESCE(1.0 / ({RRF_K} + ivf.rnk), 0.0)
           + COALESCE(1.0 / ({RRF_K} + adc.rnk), 0.0) AS rrf
  FROM ivf FULL OUTER JOIN adc
    ON ivf.q_id = adc.q_id AND ivf.n_id = adc.n_id
)
SELECT q_id, n_id, rrf,
       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY rrf DESC, n_id) AS BIGINT) AS rnk
FROM fused QUALIFY rnk <= {RRF_TOP}
"""


@register(
    "sim_hybrid_rrf",
    oracle=_duck_rrf_oracle(),
    description="Reciprocal-rank fusion (beyond-reference, the hybrid-"
    "retrieval merge): the IVF and PQ-ADC rankings for the same queries "
    "are full-outer-joined on (q_id, n_id) and fused with "
    f"score = sum 1/({RRF_K}+rank) — rank-only fusion needs no score "
    "calibration between retrievers, which is why RRF is the standard "
    "hybrid merge. Two fixed-position rational terms, so the double is "
    "bit-stable; deterministic (score, n_id) tie-break. At scale each "
    "retriever emits k rows per query, so fusion joins two tiny rank "
    "tables — cost is independent of corpus size",
    tags=("similarity",),
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ivf = sim_ann_ivf(spark, sf_dir).select(
        "q_id", "n_id", F.col("rnk").alias("rnk_ivf")
    )
    adc = sim_ann_pq_adc(spark, sf_dir).select(
        "q_id", "n_id", F.col("rnk").alias("rnk_adc")
    )
    fused = ivf.join(adc, ["q_id", "n_id"], "full_outer").select(
        "q_id",
        "n_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("rnk_ivf")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("rnk_adc")), F.lit(0.0)
            )
        ).alias("rrf"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("rrf").desc(), F.col("n_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= RRF_TOP)
        .select("q_id", "n_id", "rrf", "rnk")
    )


# ------------------------------------ ANN evaluation: recall@k harness


def _duck_recall_oracle() -> str:
    from cc_pyspark_spark.plans.registry import QUERIES  # noqa: PLC0415

    exact = QUERIES["sim_cosine_topk"].oracle
    approx = QUERIES["sim_ann_ivf"].oracle
    return f"""
WITH exact AS (
  SELECT q_id, n_id FROM ({exact}) WHERE rnk <= {IVF_TOP_K}
), approx AS (
  SELECT q_id, n_id FROM ({approx})
)
SELECT e.q_id, CAST(COUNT(a.n_id) AS BIGINT) AS hits,
       CAST(COUNT(a.n_id) AS DOUBLE) / {float(IVF_TOP_K)} AS recall
FROM exact e
LEFT JOIN approx a ON a.q_id = e.q_id AND a.n_id = e.n_id
GROUP BY e.q_id
"""


@register(
    "sim_eval_recall_at_k",
    oracle=_duck_recall_oracle(),
    description="ANN quality evaluation IN the engine: recall@"
    f"{IVF_TOP_K} of the IVF index against the exact brute-force "
    "neighbors, per query — the measurement loop every production ANN "
    "deployment runs after (re)building an index, expressed as a join of "
    "the two retrievers' rank tables (k rows per query each, so the "
    "evaluation costs nothing at corpus scale; ground truth on a sampled "
    "query set is the standard practice this models). Composes the "
    "registered sim_cosine_topk and sim_ann_ivf oracles verbatim, so the "
    "evaluated systems and the evaluation can never drift apart",
    tags=("similarity",),
)
def sim_eval_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = (
        sim_cosine_topk(spark, sf_dir)
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("q_id", "n_id")
    )
    approx = sim_ann_ivf(spark, sf_dir).select(
        "q_id", "n_id", F.lit(1).alias("hit")
    )
    j = exact.join(approx, ["q_id", "n_id"], "left")
    return j.groupBy("q_id").agg(
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("hits"),
        (
            F.sum(F.coalesce("hit", F.lit(0))).cast("double")
            / F.lit(float(IVF_TOP_K))
        ).alias("recall"),
    )


# ----------------------- distributed k-means (Lloyd) training rounds

KM_MAX_ID = 200  # cluster the first 200 vectors (bounded driver output)
KM_SEED_BASE = 480
KM_K = 8
KM_ROUNDS = 2  # full Lloyd update rounds before the final assignment
_KM_DIM = 64

_KM_D2_SPARK = (
    "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), "
    "0D, (acc, z) -> acc + z)"
)
_KM_D2_DUCK = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, {dim} + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (x, y) -> x + y)"
)


def _duck_km_ctes(e_sql: str) -> str:
    """The unrolled Lloyd CTE chain over corpus CTE body ``e_sql``
    (must yield (vec_id, v)); seeds stay the deterministic
    KM_SEED_BASE slice of the raw embeddings table. Ends with
    ``cent{KM_ROUNDS}`` — compose the final assignment with
    :func:`_duck_km_final` (r13 factoring, shared with
    curation_semdedup)."""
    d2 = _KM_D2_DUCK.format(a="e.v", b="c.cv", dim=_KM_DIM)
    ctes = [
        f"""e AS (
  {e_sql}
), cent0 AS (
  SELECT vec_id - {KM_SEED_BASE} AS c_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings
  WHERE vec_id >= {KM_SEED_BASE} AND vec_id < {KM_SEED_BASE + KM_K}
)"""
    ]
    for r in range(KM_ROUNDS):
        ctes.append(f"""a{r} AS (
  SELECT vec_id, c_id AS cluster FROM (
    SELECT e.vec_id, c.c_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.c_id) AS rk
    FROM e JOIN cent{r} c ON true) WHERE rk = 1
), cent{r + 1} AS (
  SELECT cluster AS c_id, list(m ORDER BY dim) AS cv FROM (
    SELECT a.cluster, i.i AS dim,
           CAST(SUM(CAST(floor(e.v[i.i] * 1e12) AS BIGINT)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1e12) AS m
    FROM e JOIN a{r} a ON e.vec_id = a.vec_id
    CROSS JOIN (SELECT unnest(range(1, {_KM_DIM} + 1)) AS i) i
    GROUP BY a.cluster, i.i)
  GROUP BY cluster
)""")
    return ", ".join(ctes)


def _duck_km_final() -> str:
    """Final-assignment SELECT body over `e` and `cent{KM_ROUNDS}`."""
    d2 = _KM_D2_DUCK.format(a="e.v", b="c.cv", dim=_KM_DIM)
    return f"""SELECT vec_id, CAST(c_id AS BIGINT) AS cluster, d2 FROM (
  SELECT e.vec_id, c.c_id, {d2} AS d2,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {d2}, c.c_id) AS rk
  FROM e JOIN cent{KM_ROUNDS} c ON true) WHERE rk = 1"""


_DUCK_KM_CORPUS = (
    "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
    f"  FROM embeddings WHERE vec_id < {KM_MAX_ID}"
)


def _duck_kmeans_oracle() -> str:
    return f"""
WITH {_duck_km_ctes(_DUCK_KM_CORPUS)}
{_duck_km_final()}
"""


@register(
    "embedding_kmeans_lloyd",
    oracle=_duck_kmeans_oracle(),
    description=f"Distributed k-means TRAINING ({KM_ROUNDS} full Lloyd "
    "rounds from seed centroids, then the final assignment) — the "
    "clustering loop behind SemDeDup/IVF index builds, run as DataFrame "
    "algebra: assignment is a broadcast-centroid argmin (min-struct "
    "(dist, id) — collapses map-side, deterministic tie-break), the "
    "centroid update sums each dimension in tie-free fixed point — "
    "floor(x*1e12) as BIGINT, summed exactly (associative, so no drift "
    "between partitionings), one double division at the end. floor, not "
    "a decimal cast: float32-derived doubles are dyadic rationals that "
    "land EXACTLY on decimal rounding ties, where engines disagree by "
    "rounding mode; truncation has no ties and costs a deterministic "
    "<1e-12 per-value bias. Per round: one broadcast join + one "
    "(cluster, dim)-keyed shuffle whose row count is K x dim, "
    "independent of corpus size after the map-side partial agg. Even "
    "this iterative TRAINING loop carries a full value-hash oracle "
    "(unrolled CTE replay); empty clusters drop out identically in "
    "both engines",
    tags=("similarity", "scale"),
)
def embedding_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    full = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    e = full.filter(F.col("vec_id") < KM_MAX_ID)
    cent = full.filter(
        (F.col("vec_id") >= KM_SEED_BASE)
        & (F.col("vec_id") < KM_SEED_BASE + KM_K)
    ).select((F.col("vec_id") - KM_SEED_BASE).alias("c_id"), F.col("v").alias("cv"))
    return _km_lloyd(e, cent)


def _km_lloyd(e: DataFrame, cent: DataFrame, rounds: int = KM_ROUNDS) -> DataFrame:
    """Shared Lloyd loop over ``e`` (vec_id, v) from seed centroids
    ``cent`` (c_id, cv): ``rounds`` full assignment+update rounds, then
    the final assignment — returns (vec_id, cluster BIGINT, d2).
    Factored out in r13 so curation_semdedup clusters its twin-planted
    corpus with EXACTLY the algebra the registered trainer verifies."""
    d2 = F.expr(_KM_D2_SPARK)

    def _assign(cent_df):
        return (
            e.crossJoin(F.broadcast(cent_df))
            .withColumn("d2", d2)
            .groupBy("vec_id")
            .agg(F.min(F.struct("d2", "c_id")).alias("m"))
            .select("vec_id", F.col("m.c_id").alias("cluster"), F.col("m.d2").alias("d2"))
        )

    for _ in range(rounds):
        assign = _assign(cent).select("vec_id", "cluster")
        sums = (
            e.join(assign, "vec_id")
            .select("cluster", F.posexplode("v").alias("pos0", "val"))
            .groupBy("cluster", (F.col("pos0") + 1).alias("dim"))
            .agg(
                F.sum(
                    F.floor(F.col("val") * F.lit(1e12)).cast("bigint")
                ).alias("s"),
                F.count("*").alias("cnt"),
            )
        )
        cent = (
            sums.select(
                F.col("cluster").alias("c_id"),
                "dim",
                (
                    F.col("s").cast("double")
                    / (F.col("cnt").cast("double") * F.lit(1e12))
                ).alias("mval"),
            )
            .groupBy("c_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mval"))),
                    lambda x: x["mval"],
                ).alias("cv")
            )
        )
    return _assign(cent).select(
        "vec_id", F.col("cluster").cast("bigint").alias("cluster"), "d2"
    )


# ----------------------- SemDeDup (semantic dedup via cluster-local cosine)

#: Cosine threshold for "semantic duplicate" within a cluster — the
#: SemDeDup paper's eps-dedup at high similarity; the fixture's
#: organic within-cluster pairs top out at cos ~ 0.51 and the planted
#: twins sit at ~ 0.9999, so 0.95 separates cleanly (no boundary
#: sensitivity in the hash gate).
SEMDEDUP_COS = 0.95
#: Twin ids offset — distinct from SIGN_LSH_TWIN_OFFSET's namespace so
#: the two planted corpora can never be confused in a debug session.
SEMDEDUP_TWIN_OFFSET = 100_000

_SEMDEDUP_DUCK_CORPUS = f"""SELECT vec_id, v FROM (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings WHERE vec_id < {KM_MAX_ID}) e0
  UNION ALL
  SELECT vec_id + {SEMDEDUP_TWIN_OFFSET} AS vec_id,
         list_prepend(v[1] * 1.0625, v[2:]) AS v FROM (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings WHERE vec_id < {KM_MAX_ID}) e0"""


def _duck_semdedup_oracle() -> str:
    dot = (
        "list_reduce(list_prepend(0.0, "
        "list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])), "
        "(p, q) -> p + q)"
    )
    return f"""
WITH {_duck_km_ctes(_SEMDEDUP_DUCK_CORPUS)},
fin AS (
  {_duck_km_final()}
), vv AS (
  SELECT f.vec_id, f.cluster, f.d2, e.v,
         sqrt(list_reduce(list_prepend(0.0,
             list_transform(e.v, x -> x * x)), (a, b) -> a + b)) AS nrm
  FROM fin f JOIN e ON e.vec_id = f.vec_id
), drp AS (
  SELECT DISTINCT a.vec_id
  FROM vv a JOIN vv b
    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
  WHERE {dot} / (a.nrm * b.nrm) >= {SEMDEDUP_COS}
    AND (b.d2 > a.d2 OR (b.d2 = a.d2 AND b.vec_id < a.vec_id))
)
SELECT v.vec_id, v.cluster, d.vec_id IS NULL AS keep
FROM vv v LEFT JOIN drp d ON d.vec_id = v.vec_id
"""


@register(
    "curation_semdedup",
    oracle=_duck_semdedup_oracle(),
    description="SemDeDup (Abbas et al. 2023) — SEMANTIC dedup, the "
    "standard curation stage between exact/MinHash dedup (surface "
    "overlap) and sign-LSH near-dup (hash-bucket recall): k-means the "
    "embedding space, then within each cluster drop every vector that "
    "has a semantic duplicate (cos >= "
    f"{SEMDEDUP_COS}) ranked above it — keeping, per the paper, the "
    "example FARTHEST from its centroid (most atypical; d2 desc, "
    "vec_id tie-break), expressed as one anti-join against the "
    "cluster-local 'a better twin exists' pair set, no iteration. "
    "Clustering IS the registered embedding_kmeans_lloyd algebra "
    "(shared _km_lloyd helper + shared unrolled-CTE oracle chain) on "
    "the twin-planted corpus, so the trainer the oracle verifies is "
    "the trainer this query deploys. Scale shape: assignment is a "
    "broadcast-centroid map-side argmin; the only quadratic work is "
    "cluster-LOCAL (equi-keyed on cluster, fan-out bounded by "
    "(N/K)^2 per cluster — K is the knob, exactly how the paper runs "
    "on LAION-scale corpora); output is one keep/drop row per vector",
    tags=("curation", "dedup", "similarity", "scale", "llm"),
)
def curation_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    full = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    base = full.filter(F.col("vec_id") < KM_MAX_ID)
    twins = base.select(
        (F.col("vec_id") + F.lit(SEMDEDUP_TWIN_OFFSET)).alias("vec_id"),
        F.expr(
            "concat(array(v[0] * 1.0625D), slice(v, 2, size(v) - 1))"
        ).alias("v"),
    )
    e = base.unionAll(twins)
    cent = full.filter(
        (F.col("vec_id") >= KM_SEED_BASE)
        & (F.col("vec_id") < KM_SEED_BASE + KM_K)
    ).select(
        (F.col("vec_id") - KM_SEED_BASE).alias("c_id"), F.col("v").alias("cv")
    )
    # Persisted: the assigned-vector frame feeds both sides of the
    # cluster-local pair join AND the final keep/drop projection.
    vv = (
        _km_lloyd(e, cent)
        .join(e, "vec_id")
        .select(
            "vec_id", "cluster", "d2", "v",
            F.sqrt(
                F.expr("aggregate(transform(v, x -> x * x), 0D, (a, b) -> a + b)")
            ).alias("nrm"),
        )
        .persist()
        .transform(track_cache)
    )
    x = vv.select(
        F.col("vec_id").alias("a_id"), F.col("cluster").alias("cl"),
        F.col("d2").alias("ad2"), F.col("v").alias("av"),
        F.col("nrm").alias("anrm"),
    )
    y = vv.select(
        F.col("vec_id").alias("b_id"), F.col("cluster").alias("bcl"),
        F.col("d2").alias("bd2"), F.col("v").alias("bv"),
        F.col("nrm").alias("bnrm"),
    )
    dot = "aggregate(zip_with(av, bv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    beaten = (
        x.join(y, (F.col("cl") == F.col("bcl")) & (F.col("a_id") != F.col("b_id")))
        .withColumn("cos", F.expr(dot) / (F.col("anrm") * F.col("bnrm")))
        .filter(
            (F.col("cos") >= F.lit(SEMDEDUP_COS))
            & (
                (F.col("bd2") > F.col("ad2"))
                | ((F.col("bd2") == F.col("ad2")) & (F.col("b_id") < F.col("a_id")))
            )
        )
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
        .withColumn("__drp", F.lit(1))
    )
    return vv.join(beaten, "vec_id", "left").select(
        "vec_id", "cluster", F.col("__drp").isNull().alias("keep")
    )


def _duck_recall_matrix_oracle() -> str:
    from cc_pyspark_spark.plans.registry import QUERIES  # noqa: PLC0415

    exact = QUERIES["sim_cosine_topk"].oracle
    retrievers = {
        "ivf": QUERIES["sim_ann_ivf"].oracle,
        "pq_adc": QUERIES["sim_ann_pq_adc"].oracle,
        "ivf_pq": QUERIES["sim_ann_ivf_pq"].oracle,
    }
    arms = " UNION ALL ".join(
        f"SELECT '{m}' AS method, q_id, n_id FROM ({sql})"
        for m, sql in retrievers.items()
    )
    return f"""
WITH exact AS (
  SELECT q_id, n_id FROM ({exact}) WHERE rnk <= {IVF_TOP_K}
), approx AS ({arms})
SELECT a.method, e.q_id, CAST(COUNT(x.n_id) AS BIGINT) AS hits,
       CAST(COUNT(x.n_id) AS DOUBLE) / {float(IVF_TOP_K)} AS recall
FROM (SELECT DISTINCT method FROM approx) a
CROSS JOIN exact e
LEFT JOIN approx x
  ON x.method = a.method AND x.q_id = e.q_id AND x.n_id = e.n_id
GROUP BY a.method, e.q_id
"""


@register(
    "sim_eval_recall_matrix",
    oracle=_duck_recall_matrix_oracle(),
    description="The full ANN evaluation matrix: recall@"
    f"{IVF_TOP_K} of every registered index — IVF (full vectors, "
    "bucket-pruned), PQ-ADC (compressed domain, whole corpus), and the "
    "composed IVF+PQ — against the exact brute-force neighbors, per "
    "(method, query). The index-selection table an ANN deployment "
    "decision reads: it quantifies what bucket pruning loses vs what "
    "quantization loses, separately and combined — on this fixture the "
    "seed-sliced (untrained) PQ codebooks score near-zero recall@3, "
    "which is exactly the deployment mistake (shipping an untrained "
    "codebook) this harness exists to catch; k-means-trained codebooks "
    "(embedding_kmeans_lloyd is that trainer) recover it. Composes all four "
    "registered oracles verbatim (rank tables are k rows per query, so "
    "the evaluation costs nothing at corpus scale)",
    tags=("similarity",),
)
def sim_eval_recall_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = (
        sim_cosine_topk(spark, sf_dir)
        .filter(F.col("rnk") <= IVF_TOP_K)
        .select("q_id", "n_id")
        .persist().transform(track_cache)
    )
    arms = [
        ("ivf", sim_ann_ivf(spark, sf_dir)),
        ("pq_adc", sim_ann_pq_adc(spark, sf_dir)),
        ("ivf_pq", sim_ann_ivf_pq(spark, sf_dir)),
    ]
    outs = []
    for name, df in arms:
        approx = df.select("q_id", "n_id", F.lit(1).alias("hit"))
        j = exact.join(approx, ["q_id", "n_id"], "left")
        outs.append(
            j.groupBy("q_id").agg(
                F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("hits"),
                (
                    F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                    / F.lit(float(IVF_TOP_K))
                ).alias("recall"),
            ).select(F.lit(name).alias("method"), "q_id", "hits", "recall")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# ----------------------------------------------------- k-center coreset (r9)

#: Centers selected by the greedy farthest-point (Gonzalez) sweep —
#: the classic 2-approximation for the k-center objective, used in
#: data curation as coreset/diversity selection: each round adds the
#: vector FARTHEST (min-distance) from everything selected so far, so
#: k rounds cover the embedding space's extremes instead of its modes
#: (the complement of k-means, which picks density centers).
KCENTER_K = 4

_KC_D = (
    "aggregate(zip_with(pv, cv, (a, b) -> (a - b) * (a - b)), "
    "cast(0.0 as double), (acc, z) -> acc + z)"
)


def _duck_kcenter_oracle(k: int = KCENTER_K) -> str:
    d = (
        "list_reduce(list_prepend(0.0, list_transform("
        "range(1, len(p.v) + 1), i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i]))), "
        "(a, b) -> a + b)"
    )
    parts = [
        "pts AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        "cents1 AS (SELECT CAST(0 AS BIGINT) AS rnk, vec_id, v FROM pts "
        "ORDER BY vec_id LIMIT 1)",
    ]
    for r in range(1, k):
        parts.append(
            f"s{r} AS (SELECT p.vec_id, MIN({d}) AS dmin "
            f"FROM pts p CROSS JOIN cents{r} c GROUP BY 1)"
        )
        parts.append(
            f"n{r} AS (SELECT CAST({r} AS BIGINT) AS rnk, s.vec_id, p.v "
            f"FROM s{r} s JOIN pts p ON s.vec_id = p.vec_id "
            f"ORDER BY s.dmin DESC, s.vec_id LIMIT 1)"
        )
        parts.append(
            f"cents{r + 1} AS (SELECT * FROM cents{r} "
            f"UNION ALL SELECT * FROM n{r})"
        )
    return (
        "WITH " + ",\n".join(parts) + f""",
a AS (
  SELECT p.vec_id, c.vec_id AS center_id, {d} AS d,
         ROW_NUMBER() OVER (PARTITION BY p.vec_id
                            ORDER BY {d}, c.vec_id) AS rn
  FROM pts p CROSS JOIN cents{k} c
)
SELECT vec_id, center_id, d FROM a WHERE rn = 1
"""
    )


@register(
    "embedding_kcenter_coreset",
    oracle=_duck_kcenter_oracle(),
    description="Greedy farthest-point (Gonzalez) k-center coreset "
    "selection over the embedding corpus — k=4 rounds, each adding "
    "the vector with the LARGEST min-distance to the selected set "
    "(deterministic: squared-euclidean folds in dimension order, "
    "global top-1 tie-broken by vec_id), then every vector assigned "
    "to its nearest center (row_number over (d, center_id)). The "
    "diversity-selection complement of embedding_kmeans_lloyd. "
    "Collect-free: the center set is a k-row DataFrame grown by "
    "union each round, always BROADCAST to the N-row side, so each "
    "round is one broadcast join + one TakeOrdered(1) global top-1 — "
    "no shuffle of the corpus, ever; k scans total (pts persisted). "
    "For k beyond ~16 checkpoint the center frame every few rounds "
    "(lineage doubles per round through the union) — the fixed small "
    "k here keeps the plan oracle-replayable as generated SQL stages",
    tags=("similarity", "curation", "scale"),
)
def embedding_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return kcenter_coreset_frame(t.embeddings)


def kcenter_coreset_frame(
    emb: DataFrame,
    k: int = KCENTER_K,
    checkpoint_every: int = 8,
) -> DataFrame:
    """(vec_id, center_id, d) k-center assignment over any embeddings
    frame — the registered query's compute, exposed for the
    `coreset_select` CLI job. For k beyond the oracle-sized default
    the center frame's lineage is truncated every `checkpoint_every`
    rounds (it is referenced by every later round; untruncated, plan
    depth grows linearly and planning cost quadratically in k)."""
    pts = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).persist().transform(track_cache)
    centers = pts.orderBy("vec_id").limit(1).select(
        F.lit(0).cast("bigint").alias("rnk"), "vec_id", "v"
    )
    for r in range(1, k):
        paired = pts.alias("p").crossJoin(
            F.broadcast(centers.alias("c"))
        ).select(
            F.col("p.vec_id").alias("vec_id"),
            F.expr(_KC_D.replace("pv", "p.v").replace("cv", "c.v")).alias("d"),
        )
        dmin = paired.groupBy("vec_id").agg(F.min("d").alias("dmin"))
        nxt = (
            dmin.join(pts, "vec_id")
            .orderBy(F.desc("dmin"), F.asc("vec_id"))
            .limit(1)
            .select(F.lit(r).cast("bigint").alias("rnk"), "vec_id", "v")
        )
        centers = centers.unionAll(nxt)
        if r % checkpoint_every == 0:
            centers = centers.localCheckpoint(eager=True)
    a = pts.alias("p").crossJoin(F.broadcast(centers.alias("c"))).select(
        F.col("p.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("center_id"),
        F.expr(_KC_D.replace("pv", "p.v").replace("cv", "c.v")).alias("d"),
    )
    w = W.partitionBy("vec_id").orderBy("d", "center_id")
    return (
        a.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "center_id", "d")
    )


# --------------------- Okapi BM25 ranking (r9, lexical retrieval)
#
# sim_sparse_tfidf_topk covers doc-doc lexical similarity; BM25 is the
# query-doc half — THE default first-stage ranker for retrieval-based
# curation (finding benchmark contamination, sourcing domain-specific
# training data, hybrid-RRF's lexical leg). Classic Okapi scoring with
# the idf expressed as the log-free rational (N - df + 0.5)/(df + 0.5)
# — the same convention the tfidf query established (ln() is 1-ulp
# cross-engine and would break the value hash; the rational is a
# monotone transform of the Robertson idf wherever it is positive, so
# top-k ORDER is the textbook order for any query whose terms appear
# in under half the corpus).
#
# Scale shape: the query set is tiny and broadcasts; the corpus-side
# work is the same (doc_id, token) inverted index every lexical
# operator here shares; scoring touches ONLY postings of query terms
# (the token join prunes everything else at the shuffle). Per-doc
# length norm joins on doc_id — O(matching docs), never O(corpus).

#: Fixed retrieval query set (literal in both engines).
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "table scan"),
    (2, "hash join order"),
    (3, "stream batch window"),
    (4, "customer query"),
)
BM25_K1 = "1.2"
BM25_B = "0.75"
BM25_TOPK = 10

_BM25_QTERM_VALUES = ",".join(
    f"({qid},'{tok}')"
    for qid, q in BM25_QUERIES
    for tok in sorted(set(q.split()))
)


def _duck_bm25_oracle() -> str:
    from cc_pyspark_spark.functions.text import TOKEN_PATTERN

    toks = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1
), df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
), qt(query_id, token) AS (
  SELECT * FROM (VALUES {_BM25_QTERM_VALUES}) AS v(query_id, token)
), contrib AS (
  SELECT qt.query_id, tf.doc_id, tf.token,
         ((CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
            / (CAST(df.df AS DOUBLE) + 0.5))
         * (CAST(tf.tf AS DOUBLE) * ({BM25_K1} + 1.0))
         / (CAST(tf.tf AS DOUBLE)
            + {BM25_K1} * (1.0 - {BM25_B}
                           + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl)) AS c
  FROM tf JOIN qt USING (token)
          JOIN df USING (token)
          JOIN dl USING (doc_id)
          CROSS JOIN stats s
), scored AS (
  SELECT query_id, doc_id,
         list_reduce(list_prepend(0.0, list(c ORDER BY token)),
                     (a, x) -> a + x) AS score
  FROM contrib GROUP BY 1, 2
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
FROM scored QUALIFY rnk <= {BM25_TOPK}
"""


@register(
    "sim_bm25_topk",
    oracle=_duck_bm25_oracle(),
    description="Okapi BM25 retrieval (beyond-reference): k1=1.2 b=0.75 "
    "with length normalization against a broadcast 1-row (N, avgdl) "
    "aggregate; idf is the log-free rational (N-df+0.5)/(df+0.5) so the "
    "full-value oracle holds bit-for-bit (monotone in the Robertson idf "
    "for df < N/2 — rank-identical for any discriminative term). The "
    "query-term join prunes the inverted index to query-term postings "
    "BEFORE any shuffle, so cost scales with posting length, not corpus "
    "size; per-query top-k with doc_id tiebreak. The query-doc twin of "
    "sim_sparse_tfidf_topk and the lexical leg sim_hybrid_rrf fuses",
    tags=("similarity", "text"),
)
def sim_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.functions.text import tokenize

    t = Catalog(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    df = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    qt = spark.createDataFrame(
        [
            (qid, tok_)
            for qid, q in BM25_QUERIES
            for tok_ in sorted(set(q.split()))
        ],
        "query_id int, token string",
    )
    k1, b = float(BM25_K1), float(BM25_B)
    contrib = (
        tf.join(F.broadcast(qt), "token")
        .join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "token",
            (
                (
                    (
                        F.col("n_docs").cast("double")
                        - F.col("df").cast("double")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b)
                        * F.col("dl").cast("double")
                        / F.col("avgdl")
                    )
                )
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("score")
    )
    win = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rnk") <= BM25_TOPK)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            "doc_id",
            "score",
            "rnk",
        )
    )


# --------------------- JL random projection (r9, embedding shrink)
#
# Johnson-Lindenstrauss sign projection (Achlioptas 2003, public
# literature): a +-1 matrix preserves pairwise distances within
# (1 +- eps) w.h.p. at k = O(log n / eps^2) output dims. In a 100 TB
# pipeline this is the cheapest lever against the REAL ANN cost
# driver — shuffle bytes: projecting 64-d float vectors to 16-d
# before the LSH/IVF stages cuts every downstream exchange 4x, and
# the projection itself is a pure per-row column expression (zero
# shuffle, whole-stage codegen, folds into the parquet scan
# projection). The sign matrix derives from md5 at module import —
# deterministic, seedless, identical literals in both engines.

RP_IN_DIMS = 64
RP_OUT_DIMS = 16


def _rp_signs() -> list[list[float]]:
    import hashlib  # noqa: PLC0415

    return [
        [
            1.0
            if hashlib.md5(f"rp:{j}:{i}".encode()).digest()[0] < 128
            else -1.0
            for i in range(RP_IN_DIMS)
        ]
        for j in range(RP_OUT_DIMS)
    ]


RP_SIGNS = _rp_signs()
#: 1/sqrt(RP_OUT_DIMS) — exact in binary (sqrt(16) = 4).
_RP_SCALE = "4.0"


def _duck_rp_oracle() -> str:
    cols = []
    for j, signs in enumerate(RP_SIGNS):
        chain = "0.0"
        for i, s in enumerate(signs):
            op = "+" if s > 0 else "-"
            chain += f" {op} CAST(embedding[{i + 1}] AS DOUBLE)"
        cols.append(f"({chain}) / {_RP_SCALE} AS p{j:02d}")
    body = ",\n       ".join(cols)
    return f"SELECT vec_id,\n       {body}\nFROM embeddings"


@register(
    "embedding_random_projection",
    oracle=_duck_rp_oracle(),
    description="Johnson-Lindenstrauss sign random projection (beyond-"
    "reference, Achlioptas +-1 variant): 64-d -> 16-d via an md5-derived "
    "deterministic sign matrix, scaled 1/sqrt(k). Pure per-row column "
    "expressions — zero shuffle, whole-stage codegen, folds into the "
    "scan projection — so at corpus scale it runs at read throughput "
    "and cuts every downstream ANN exchange 4x in bytes. Left-assoc "
    "fold order is pinned identically in both engines, so the full "
    "double-value oracle holds bit-for-bit",
    tags=("similarity", "embedding"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    cols = [F.col("vec_id")]
    for j, signs in enumerate(RP_SIGNS):
        sarr = F.array(*[F.lit(s) for s in signs])
        cols.append(
            (
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        sarr,
                        lambda v, s: v.cast("double") * s,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.lit(float(_RP_SCALE))
            ).alias(f"p{j:02d}")
        )
    return t.embeddings.select(*cols)


# --------------------- hard-negative mining (r9, contrastive training)
#
# Contrastive/embedding training (SimCLR, sentence-transformers, CLIP
# fine-tunes) needs NEGATIVES THAT ARE HARD: for each anchor, the
# most-similar corpus items with a DIFFERENT label, plus the margin to
# the best same-label positive (FaceNet's semi-hard criterion decides
# per-triplet whether margin > 0). This is the mining pass a training-
# data pipeline runs over its labeled embedding table every epoch.
# Same broadcast-anchors x partitioned-corpus envelope as
# sim_cosine_topk; at deployment scale the corpus side is IVF-pruned
# first (sim_ann_ivf's assign CTE) — this query is the exact-scoring
# core both shapes share.

HARDNEG_TOP_K = 5


def _duck_hardneg_oracle() -> str:
    dot = _DUCK_DOT
    return f"""
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, label, v,
         sqrt({dot.format(a='v', b='v')}) AS nrm
  FROM e
), p AS (
  SELECT q.vec_id AS q_id, q.label AS q_label,
         c.vec_id AS n_id, c.label AS n_label,
         {dot.format(a='q.v', b='c.v')} / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
), pos AS (
  SELECT q_id, MAX(cos) AS pos_cos
  FROM p WHERE n_label = q_label GROUP BY q_id
), neg AS (
  SELECT q_id, n_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos DESC, n_id) AS rnk
  FROM p WHERE n_label <> q_label
)
SELECT neg.q_id, neg.n_id, neg.cos, neg.rnk,
       pos.pos_cos, pos.pos_cos - neg.cos AS margin
FROM neg JOIN pos ON pos.q_id = neg.q_id
WHERE neg.rnk <= {HARDNEG_TOP_K}
"""


@register(
    "sim_hard_negatives",
    oracle=_duck_hardneg_oracle(),
    description="Hard-negative mining for contrastive training (beyond-"
    "reference): per anchor, the top-5 most-similar DIFFERENT-label "
    "corpus vectors plus the margin to its best same-label positive "
    "(the FaceNet semi-hard criterion is margin > 0 per row). Broadcast "
    "anchors x partitioned corpus, exact cosine; pos_cos is a per-"
    "anchor max aggregate that broadcasts back onto the ranked "
    "negatives. MAX of identical doubles is order-free, so the full-"
    "value oracle holds without an ordered fold",
    tags=("similarity", "embedding"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return sim_hard_negatives_frame(t.embeddings)


def sim_hard_negatives_frame(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = HARDNEG_TOP_K,
) -> DataFrame:
    """(q_id, n_id, cos, rnk, pos_cos, margin) — the
    `mine_hard_negatives` CLI shares this with the registered query.
    Anchors = vec_id < ``n_queries`` (swap the filter for an anchors
    table in deployment; the broadcast shape is unchanged)."""
    dot_self = (
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    )
    emb = embeddings.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("nrm", F.expr(f"sqrt({dot_self})"))
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("n_label"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    dot = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    p = c.join(F.broadcast(q), F.col("n_id") != F.col("q_id")).withColumn(
        "cos", F.expr(dot) / (F.col("qnrm") * F.col("cnrm"))
    )
    pos = (
        p.filter(F.col("n_label") == F.col("q_label"))
        .groupBy("q_id")
        .agg(F.max("cos").alias("pos_cos"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    neg = (
        p.filter(F.col("n_label") != F.col("q_label"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )
    return neg.join(F.broadcast(pos), "q_id").select(
        "q_id",
        "n_id",
        "cos",
        "rnk",
        "pos_cos",
        (F.col("pos_cos") - F.col("cos")).alias("margin"),
    )


# --------------------- MMR diversified re-ranking (r10)
#
# Retrieval for curation (dataset sourcing, eval-set construction,
# contrastive-pair mining) wants relevant-AND-diverse results; Maximal
# Marginal Relevance (Carbonell & Goldstein 1998) is the standard
# greedy re-ranker. Scale shape: stage 1 is the ordinary distributed
# exact-cosine top-N over the corpus (TakeOrderedAndProject — the
# corpus never shuffles); stage 2 runs the greedy MMR chain on the
# N-row candidate frame, collect-free (the selected set is a grown-by-
# union DataFrame, always broadcast) — its cost is O(k*N) independent
# of corpus size, the kcenter discipline applied to retrieval.

MMR_POOL = 16
MMR_K = 8
MMR_QUERY_ID = 0

_MMR_DOT_QP = (
    "aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
)
_MMR_DOT_PS = (
    "aggregate(zip_with(p.v, s.v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
)


def _duck_mmr_oracle(pool: int = MMR_POOL, k: int = MMR_K) -> str:
    dot_qc = (
        "list_reduce(list_prepend(0.0, list_transform("
        "range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])), (a, b) -> a + b)"
    )
    dot_ps = (
        "list_reduce(list_prepend(0.0, list_transform("
        "range(1, len(p2.v) + 1), i -> p2.v[i] * s.v[i])), (a, b) -> a + b)"
    )
    parts = [
        """e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                          (a, b) -> a + b)) AS nrm
  FROM e
), q AS (SELECT v, nrm FROM n WHERE vec_id = """
        + str(MMR_QUERY_ID)
        + f"""),
pool AS MATERIALIZED (
  SELECT c.vec_id, c.v, c.nrm, {dot_qc} / (q.nrm * c.nrm) AS rel
  FROM n c CROSS JOIN q WHERE c.vec_id <> {MMR_QUERY_ID}
  ORDER BY rel DESC, c.vec_id LIMIT {pool}
),
sel1 AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS rnk, vec_id, v, nrm, rel FROM pool
  ORDER BY rel DESC, vec_id LIMIT 1
)"""
    ]
    for r in range(1, k):
        parts.append(f"""n{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS rnk, p.vec_id, p.v, p.nrm, p.rel
  FROM pool p JOIN (
    SELECT p2.vec_id, MAX({dot_ps} / (p2.nrm * s.nrm)) AS maxsim
    FROM pool p2 CROSS JOIN sel{r} s
    WHERE p2.vec_id NOT IN (SELECT vec_id FROM sel{r})
    GROUP BY p2.vec_id
  ) m ON p.vec_id = m.vec_id
  ORDER BY 0.7 * p.rel - 0.3 * m.maxsim DESC, p.vec_id LIMIT 1
),
sel{r + 1} AS MATERIALIZED (
  SELECT * FROM sel{r} UNION ALL SELECT * FROM n{r}
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT rnk, vec_id, rel FROM sel{k}"
    )


@register(
    "sim_mmr_rerank",
    oracle=_duck_mmr_oracle(),
    description="Maximal-Marginal-Relevance diversified re-ranking: "
    f"exact-cosine top-{MMR_POOL} candidates for the query vector "
    f"(TakeOrdered over the corpus — no corpus shuffle), then {MMR_K} "
    "greedy rounds each selecting argmax of 0.7*relevance - "
    "0.3*max-similarity-to-selected (ties to vec_id — a total order). "
    "Collect-free: the selected set is a grown-by-union DataFrame "
    "broadcast into each round's candidate scoring, so stage-2 cost is "
    "O(k*pool) regardless of corpus size (the kcenter discipline). All "
    "cosine folds run in dimension order on both engines; the DuckDB "
    "oracle replays the greedy chain as generated per-round SQL",
    tags=("similarity", "curation"),
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    dot_self = (
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    )
    emb = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("nrm", F.expr(f"sqrt({dot_self})"))
    q = emb.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    pool = (
        emb.filter(F.col("vec_id") != MMR_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "rel", F.expr(_MMR_DOT_QP) / (F.col("qnrm") * F.col("nrm"))
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_POOL)
        .select("vec_id", "v", "nrm", "rel")
        # referenced by every greedy round: materialize once
        .localCheckpoint(eager=True)
    )
    # Greedy selection in ONE single-partition Arrow pass (r16
    # optimization round, guide §5 — fewer driver actions): the r10-r15
    # shape ran one anti-join + broadcast scoring + TakeOrdered(1) +
    # eager localCheckpoint PER ROUND — measured 8 checkpoint actions
    # x ~0.17 s plus ~0.9 s of per-round plan construction at sf0.1,
    # all to pick 8 rows out of a 16-row pool. The pool stays a
    # distributed TakeOrdered over the corpus (no corpus collect); the
    # greedy chain over the <= MMR_POOL checkpointed rows is a single
    # mapInPandas task. Bit-identical arithmetic: Python floats are
    # the same IEEE binary64 as JVM doubles, the dot product folds in
    # dimension order exactly like the old aggregate(zip_with(...))
    # expression (sequential left fold, acc + x*y), maxsim is an
    # order-independent max, and the argmax tie-break replays
    # (score desc, vec_id asc) — the DuckDB oracle pins all of it.
    def _greedy(batches):  # pragma: no cover — executor-side
        import pandas as pd  # noqa: PLC0415

        rows = pd.concat(list(batches), ignore_index=True)
        cand = [
            (
                int(t.vec_id),
                [float(x) for x in t.v],
                float(t.nrm),
                float(t.rel),
            )
            for t in rows.itertuples()
        ]

        def dot(a: list, b: list) -> float:
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        sel: list = []
        chosen: set = set()
        for r in range(min(MMR_K, len(cand))):
            best = None
            best_key = None
            for vec_id, v, nrm, rel in cand:
                if vec_id in chosen:
                    continue
                if r == 0:
                    score = rel
                else:
                    maxsim = max(
                        dot(v, sv) / (nrm * snrm)
                        for _, sv, snrm, _ in sel
                    )
                    score = 0.7 * rel - 0.3 * maxsim
                key = (-score, vec_id)
                if best_key is None or key < best_key:
                    best, best_key = (vec_id, v, nrm, rel), key
            sel.append(best)
            chosen.add(best[0])
        yield pd.DataFrame(
            {
                "rnk": list(range(len(sel))),
                "vec_id": [s[0] for s in sel],
                "rel": [s[3] for s in sel],
            }
        )

    return pool.coalesce(1).mapInPandas(
        _greedy, "rnk bigint, vec_id bigint, rel double"
    )


# --------------------- margin-based bitext mining (r10)
#
# Parallel-corpus mining (Artetxe & Schwenk 2019; the CCMatrix /
# LASER recipe): candidate translation pairs are MUTUAL nearest
# neighbors whose cosine clears a margin over each side's average
# k-NN similarity — the ratio margin kills hub vectors that are
# near-everything. Scale shape here: the X side is a broadcast-sized
# query set (the sim_cosine_topk convention), so scoring is ONE
# map-only pass over the Y corpus with X broadcast; per-X top-k rides
# WindowGroupLimit on |X| keys, per-Y top-k is row-local array algebra
# (each Y row already holds all |X| scores). No Y-Y or all-pairs work
# anywhere. For corpus-x-corpus mining both sides go through the IVF
# index (sim_ann_ivf) first and this operator runs per bucket-pair.

BITEXT_K = 4
BITEXT_NX = 30


def _duck_bitext_oracle() -> str:
    dot = (
        "list_reduce(list_prepend(0.0, list_transform("
        "range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])), (a, b) -> a + b)"
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, z -> CAST(z AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0, list_transform(v, z -> z * z)),
                          (a, b) -> a + b)) AS nrm
  FROM e
), x AS (SELECT * FROM n WHERE vec_id % 2 = 0 AND vec_id < {2 * BITEXT_NX}),
y AS (SELECT * FROM n WHERE vec_id % 2 = 1),
s AS MATERIALIZED (
  SELECT x.vec_id AS x_id, y.vec_id AS y_id,
         {dot} / (x.nrm * y.nrm) AS cos
  FROM x CROSS JOIN y
), xr AS (
  SELECT x_id, y_id, cos,
         ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY cos DESC, y_id) AS rk
  FROM s
), xa AS (
  SELECT x_id,
         list_reduce(list_prepend(0.0, list(cos ORDER BY cos DESC, y_id)),
                     (a, b) -> a + b) / {BITEXT_K}.0 AS ax,
         MIN(CASE WHEN rk = 1 THEN y_id END) AS y1
  FROM xr WHERE rk <= {BITEXT_K} GROUP BY x_id
), yr AS (
  SELECT x_id, y_id, cos,
         ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY cos DESC, x_id) AS rk
  FROM s
), ya AS (
  SELECT y_id,
         list_reduce(list_prepend(0.0, list(cos ORDER BY cos DESC, x_id)),
                     (a, b) -> a + b) / {BITEXT_K}.0 AS ay,
         MIN(CASE WHEN rk = 1 THEN x_id END) AS x1
  FROM yr WHERE rk <= {BITEXT_K} GROUP BY y_id
)
SELECT s.x_id, s.y_id, s.cos,
       s.cos / ((xa.ax + ya.ay) / 2.0) AS margin
FROM s JOIN xa ON s.x_id = xa.x_id AND s.y_id = xa.y1
       JOIN ya ON s.y_id = ya.y_id AND s.x_id = ya.x1
WHERE s.cos / ((xa.ax + ya.ay) / 2.0) > 1.0
"""


@register(
    "sim_bitext_mine",
    oracle=_duck_bitext_oracle(),
    description="Margin-based bitext mining (Artetxe & Schwenk ratio "
    "margin, the CCMatrix recipe): mutual nearest neighbors between "
    f"the X side ({BITEXT_NX} broadcast query vectors) and the Y "
    "corpus whose cosine clears cos / ((avgK_x + avgK_y)/2) > 1.0 "
    f"with k={BITEXT_K} — the hub-vector killer. One map-only scoring "
    "pass (X broadcast into the Y scan); per-X top-k rides "
    "WindowGroupLimit on |X| keys, per-Y top-k on the y_id-keyed "
    "window (|Y| keys, k rows per key cross the exchange); every "
    "float fold runs in (cos desc, id) order on both engines. "
    "Corpus-x-corpus deployments run this per IVF bucket-pair "
    "(sim_ann_ivf) instead of broadcasting X",
    tags=("similarity", "llm", "scale"),
)
def sim_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    dot_self = (
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    )
    emb = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("nrm", F.expr(f"sqrt({dot_self})"))
    x = emb.filter(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 2 * BITEXT_NX)
    ).select(
        F.col("vec_id").alias("x_id"),
        F.col("v").alias("xv"),
        F.col("nrm").alias("xnrm"),
    )
    y = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("y_id"),
        F.col("v").alias("yv"),
        F.col("nrm").alias("ynrm"),
    )
    dot = "aggregate(zip_with(xv, yv, (a, b) -> a * b), 0D, (acc, z) -> acc + z)"
    s = (
        y.crossJoin(F.broadcast(x))
        .withColumn("cos", F.expr(dot) / (F.col("xnrm") * F.col("ynrm")))
        .select("x_id", "y_id", "cos")
        # scored once, read by both top-k passes
        .localCheckpoint(eager=True)
    )
    k = BITEXT_K
    wx = W.partitionBy("x_id").orderBy(F.desc("cos"), F.asc("y_id"))
    xa = (
        s.withColumn("rk", F.row_number().over(wx))
        .filter(F.col("rk") <= k)
        .groupBy(F.col("x_id").alias("xa_xid"))
        .agg(
            (
                F.expr(
                    "aggregate(transform(array_sort(collect_list("
                    "struct(-cos as nc, y_id, cos))), e -> e.cos), "
                    "0D, (acc, z) -> acc + z)"
                )
                / F.lit(float(k))
            ).alias("ax"),
            F.min(F.when(F.col("rk") == 1, F.col("y_id"))).alias("y1"),
        )
    )
    wy = W.partitionBy("y_id").orderBy(F.desc("cos"), F.asc("x_id"))
    ya = (
        s.withColumn("rk", F.row_number().over(wy))
        .filter(F.col("rk") <= k)
        .groupBy(F.col("y_id").alias("ya_yid"))
        .agg(
            (
                F.expr(
                    "aggregate(transform(array_sort(collect_list("
                    "struct(-cos as nc, x_id, cos))), e -> e.cos), "
                    "0D, (acc, z) -> acc + z)"
                )
                / F.lit(float(k))
            ).alias("ay"),
            F.min(F.when(F.col("rk") == 1, F.col("x_id"))).alias("x1"),
        )
    )
    out = (
        s.join(
            xa,
            (F.col("x_id") == F.col("xa_xid")) & (F.col("y_id") == F.col("y1")),
        )
        .join(
            ya,
            (F.col("y_id") == F.col("ya_yid")) & (F.col("x_id") == F.col("x1")),
        )
        .select(
            "x_id",
            "y_id",
            "cos",
            (F.col("cos") / ((F.col("ax") + F.col("ay")) / F.lit(2.0))).alias(
                "margin"
            ),
        )
        .filter(F.col("margin") > 1.0)
    )
    return out


#: Impact-ordered posting prune: keep only the top-M postings per
#: token by weight. Pair fan-out per token becomes <= M^2 — bounded
#: INDEPENDENT of document frequency and corpus size, where the
#: absolute df cap still admits up to max_posting^2 pairs. M trades
#: recall (low-weight postings can't be retrieved) for a hard
#: per-token cost ceiling — the WAND-family idea as a static index
#: prune.
SPARSE_IMPACT_M = 64


def _duck_sparse_impact_oracle() -> str:
    from cc_pyspark_spark.functions.text import TOKEN_PATTERN

    toks = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), w0 AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS DOUBLE) * ((CAST(nd.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                                  / (CAST(df.df AS DOUBLE) + 0.5)) AS w
  FROM tf JOIN df USING (token) CROSS JOIN nd
  WHERE df.df * {SPARSE_DF_CAP_DEN} <= nd.n_docs * {SPARSE_DF_CAP_NUM}
    AND df.df <= {SPARSE_DF_ABS_CAP}
), w AS (
  SELECT doc_id, token, w FROM (
    SELECT doc_id, token, w,
           ROW_NUMBER() OVER (PARTITION BY token
                              ORDER BY w DESC, doc_id) AS ir
    FROM w0
  ) WHERE ir <= {SPARSE_IMPACT_M}
), nrm AS (
  SELECT doc_id,
         sqrt(list_reduce(list_prepend(0.0, list(w * w ORDER BY token)),
                          (a, x) -> a + x)) AS nrm
  FROM w GROUP BY 1
), contrib AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.token, a.w * b.w AS p
  FROM w a JOIN w b ON a.token = b.token AND a.doc_id <> b.doc_id
), dots AS (
  SELECT a_id, b_id,
         list_reduce(list_prepend(0.0, list(p ORDER BY token)),
                     (a, x) -> a + x) AS dot
  FROM contrib GROUP BY 1, 2
), cosd AS (
  SELECT d.a_id, d.b_id, d.dot / (na.nrm * nb.nrm) AS cos
  FROM dots d JOIN nrm na ON na.doc_id = d.a_id
              JOIN nrm nb ON nb.doc_id = d.b_id
)
SELECT a_id, b_id, cos,
       CAST(ROW_NUMBER() OVER (PARTITION BY a_id
                               ORDER BY cos DESC, b_id) AS BIGINT) AS rnk
FROM cosd QUALIFY rnk <= {SPARSE_TOPK}
"""


@register(
    "sim_sparse_impact_topk",
    oracle=_duck_sparse_impact_oracle(),
    description="Impact-ordered sparse retrieval (the WAND-family "
    "static prune — THE scale answer to the posting-pair join): after "
    "the df caps, keep only the TOP-64 postings per token by weight "
    "(one token-keyed row_number, WindowGroupLimit pushes the prune "
    "map-side), so pair fan-out per token is <= 64^2 — bounded "
    "independent of document frequency and corpus size, where "
    "sim_sparse_tfidf_topk's absolute df cap still admits 10^8 pairs "
    "per token. Norms, cosines, and the per-doc top-k are computed "
    "within the pruned universe (token-ordered folds, bit-stable); "
    "recall loss is exactly the low-impact postings, the documented "
    "WAND trade. The r12 10x probe measured the unpruned family "
    "~linear-plus from passing-token df^2 growth — this variant makes "
    "the ceiling a constant",
    tags=("similarity", "text", "scale"),
)
def sim_sparse_impact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W  # noqa: PLC0415

    from cc_pyspark_spark.functions.text import tokenize  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    tf = (
        t.documents.select("doc_id", F.explode(tokenize("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    nd = t.documents.agg(F.count("*").cast("bigint").alias("n_docs"))
    w0 = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(nd))
        .filter(
            (
                F.col("df") * SPARSE_DF_CAP_DEN
                <= F.col("n_docs") * SPARSE_DF_CAP_NUM
            )
            & (F.col("df") <= F.lit(SPARSE_DF_ABS_CAP))
        )
        .select(
            "doc_id",
            "token",
            (
                F.col("tf").cast("double")
                * (
                    (
                        F.col("n_docs").cast("double")
                        - F.col("df").cast("double")
                        + F.lit(0.5)
                    )
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
            ).alias("w"),
        )
    )
    iw = W.partitionBy("token").orderBy(F.desc("w"), F.asc("doc_id"))
    w = (
        w0.withColumn("ir", F.row_number().over(iw))
        .filter(F.col("ir") <= SPARSE_IMPACT_M)
        .drop("ir")
        .persist()
        .transform(track_cache)
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct("token", (F.col("w") * F.col("w")).alias("w2"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["w2"],
            )
        ).alias("nrm")
    )
    a = w.select(F.col("doc_id").alias("a_id"), "token", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("b_id"), "token", F.col("w").alias("wb"))
    dots = (
        a.join(b, "token")
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct("token", (F.col("wa") * F.col("wb")).alias("p"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["p"],
            ).alias("dot")
        )
    )
    cosd = (
        dots.join(nrm.select(F.col("doc_id").alias("a_id"), F.col("nrm").alias("na")), "a_id")
        .join(nrm.select(F.col("doc_id").alias("b_id"), F.col("nrm").alias("nb")), "b_id")
        .select("a_id", "b_id", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cos"))
    )
    rw = W.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("b_id"))
    return (
        cosd.withColumn("rnk", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rnk") <= SPARSE_TOPK)
    )
