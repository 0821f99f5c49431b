"""Mergeable-sketch operators — the re-aggregation story at 100 TB.

Beyond-reference: the reference (word_count.py, server_count.py) always
re-scans raw records to answer cardinality/frequency questions. At
100 TB the deployment pattern is *pre-aggregated mergeable sketches*:
each ingest shard persists a small sketch, and any later rollup merges
sketches without touching raw data. Families:

* ``agg_hll_sketch_union`` — HyperLogLog (Apache DataSketches HLL via
  Spark's ``hll_sketch_agg``/``hll_union_agg``): per-(lang, source)
  shard sketches are built in one partial aggregation, then *merged*
  per lang — the union path a warehouse rollup would run daily over
  stored shard sketches. The raw estimate is engine-specific, so the
  oracle follows the ``agg_approx_count_distinct`` convention: emit the
  exact distinct count plus a within-bound boolean and assert TRUE.

* ``agg_count_min_heavy_hitters`` — a count-min sketch built as pure
  DataFrame algebra (polynomial row hashes in Catalyst higher-order
  functions, one (row, bucket) hash aggregation). Because every step is
  exact integer arithmetic, DuckDB replays the *identical* sketch and
  the estimates themselves are hash-compared — a full-value oracle for
  an approximate structure. depth×width is the scale knob: the sketch
  is 4×1024 longs regardless of corpus size, and merging shard sketches
  is elementwise addition (the same groupBy(i, b) SUM that builds it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.functions.text import TOKEN_PATTERN, tokenize
from cc_pyspark_spark.plans.registry import register

_DUCK_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"

#: Count-min parameters. P is the shared polynomial-hash modulus
#: (matches ROLL_P in plans/text.py); W buckets per row, D hash rows.
#: Row-i hash is ((base * (131 + 2i) + 17 + 31i) mod P) mod W — all
#: intermediates < 1.4e11, safe under ANSI bigint arithmetic in both
#: engines.
CM_P = 1_000_000_007
CM_W = 1024
CM_D = 4
CM_TOP = 20


@register(
    "agg_hll_sketch_union",
    oracle="""
SELECT lang,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_shards,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_fps,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       TRUE AS within_2pct
FROM documents GROUP BY 1
""",
    description="Mergeable HLL rollup (beyond-reference): per-(lang, source) "
    "shard sketches over md5 content fingerprints, merged per lang with "
    "hll_union_agg — the persist-shard-sketches / merge-later pattern for "
    "100 TB distinct counts. Estimate is engine-specific, so the gate "
    "follows the approx_count_distinct convention: exact count + "
    "within-bound boolean (lgConfigK=14 → ~0.8% rsd, asserted at 2%)",
    tags=("agg", "sketch"),
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    base = t.documents.select(
        "lang", "source", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    # Stage 1: one sketch per ingest shard (what each writer would
    # persist); stage 2: merge per lang (what the rollup would run).
    shard = base.groupBy("lang", "source").agg(
        F.hll_sketch_agg("fp", F.lit(14)).alias("sk")
    )
    merged = shard.groupBy("lang").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("__approx"),
        F.count("*").alias("n_shards"),
    )
    exact = base.groupBy("lang").agg(
        F.count_distinct("fp").alias("exact_fps"),
        F.count("*").alias("n_docs"),
    )
    tol = F.col("exact_fps").cast("double") * F.lit(0.02)
    err = F.abs(F.col("__approx") - F.col("exact_fps")).cast("double")
    return merged.join(exact, "lang").select(
        "lang", "n_shards", "exact_fps", "n_docs", (err <= tol).alias("within_2pct")
    )


def _char_hash_spark(col: str) -> str:
    """SQL expr: polynomial char fold of ``col`` mod CM_P (Catalyst
    higher-order functions; same fold as text_rolling_fingerprint)."""
    return (
        f"aggregate(sequence(1, length({col})), 0L, "
        f"(a, i) -> (a * 131 + ascii(substr({col}, i, 1))) % {CM_P})"
    )


_DUCK_CHAR_HASH = f"""list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(range(1, length(token) + 1),
                   i -> ascii(substr(token, i, 1)))),
    (a, c) -> (a * 131 + c) % {CM_P})"""


@register(
    "agg_count_min_heavy_hitters",
    oracle=f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKS}) AS token FROM documents
), tc AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1
), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tc),
hb AS (
  SELECT token, c, {_DUCK_CHAR_HASH} AS h FROM tc
), buckets AS (
  SELECT token, c, i,
         ((h * (131 + 2 * i) + 17 + 31 * i) % {CM_P}) % {CM_W} AS b
  FROM hb CROSS JOIN (SELECT unnest(range(0, {CM_D})) AS i)
), sketch AS (
  SELECT i, b, CAST(SUM(c) AS BIGINT) AS cnt FROM buckets GROUP BY 1, 2
), top AS (
  SELECT token, c AS exact FROM tc ORDER BY c DESC, token LIMIT {CM_TOP}
), probed AS (
  SELECT t.token, t.exact, MIN(s.cnt) AS est
  FROM top t
  JOIN buckets bk ON bk.token = t.token
  JOIN sketch s ON s.i = bk.i AND s.b = bk.b
  GROUP BY 1, 2
)
SELECT token, exact, est,
       est >= exact AND est <= exact + (SELECT 2 * n // {CM_W} FROM tot)
         AS bound_ok
FROM probed
""",
    description="Count-min sketch heavy hitters (beyond-reference): depth-4 × "
    "width-1024 sketch built as one hash aggregation over deterministic "
    "polynomial row hashes; top-20 exact tokens probed back (min over rows). "
    "Every step is exact integer algebra, so the oracle replays the "
    "IDENTICAL sketch in DuckDB and the estimates are hash-compared — a "
    "full-value gate on an approximate structure. Sketch size is 4×1024 "
    "longs independent of corpus size; shard merge = elementwise addition",
    tags=("agg", "sketch"),
)
def agg_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    tc = (
        t.documents.select(F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    hb = tc.withColumn("h", F.expr(_char_hash_spark("token")))
    buckets = hb.select(
        "token",
        "c",
        F.posexplode(
            F.array(
                *[
                    ((F.col("h") * (131 + 2 * i) + (17 + 31 * i)) % CM_P) % CM_W
                    for i in range(CM_D)
                ]
            )
        ).alias("i", "b"),
    )
    sketch = buckets.groupBy("i", "b").agg(F.sum("c").alias("cnt"))
    top = (
        tc.orderBy(F.desc("c"), "token")
        .limit(CM_TOP)
        .select("token", F.col("c").alias("exact"))
    )
    # Probe: each (token, i) hits exactly one bucket; the sketch is
    # 4×1024 rows → broadcast both small sides of the probe join.
    probe = (
        F.broadcast(top)
        .join(buckets.select("token", "i", "b"), "token")
        .join(F.broadcast(sketch), ["i", "b"])
        .groupBy("token", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    total = tc.agg(F.sum("c").alias("n"))
    return (
        probe.crossJoin(F.broadcast(total))
        .select(
            "token",
            "exact",
            "est",
            (
                (F.col("est") >= F.col("exact"))
                & (
                    F.col("est")
                    <= F.col("exact") + F.expr(f"2 * n div {CM_W}")
                )
            ).alias("bound_ok"),
        )
    )


@register(
    "agg_approx_percentile_bound",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.9) AS p90,
       TRUE AS ok50,
       TRUE AS ok90
FROM lineitem GROUP BY 1
""",
    description="Quantile sketch gate (beyond-reference): percentile_approx "
    "(Greenwald-Khanna, rank error <= 1/accuracy) is the 100 TB quantile "
    "path — mergeable partial summaries, no global sort. Its raw output is "
    "engine-specific, so per the approx_count_distinct convention the gate "
    "emits the exact interpolated percentiles plus booleans pinning the "
    "sketch value inside the exact [q-0.02, q+0.02] quantile envelope "
    "(accuracy=10000 -> rank error 1e-4, two orders inside the envelope)",
    tags=("agg", "sketch"),
)
def agg_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    agg = t.lineitem.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_approx(l_quantity, array(0.5D, 0.9D), 10000)"
        ).alias("__a"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90"),
        F.expr("percentile(l_quantity, 0.48)").alias("__lo50"),
        F.expr("percentile(l_quantity, 0.52)").alias("__hi50"),
        F.expr("percentile(l_quantity, 0.88)").alias("__lo90"),
        F.expr("percentile(l_quantity, 0.92)").alias("__hi90"),
    )
    return agg.select(
        "l_returnflag",
        "p50",
        "p90",
        (
            (F.col("__a")[0] >= F.col("__lo50"))
            & (F.col("__a")[0] <= F.col("__hi50"))
        ).alias("ok50"),
        (
            (F.col("__a")[1] >= F.col("__lo90"))
            & (F.col("__a")[1] <= F.col("__hi90"))
        ).alias("ok90"),
    )


@register(
    "agg_exact_median_histogram",
    oracle="""
WITH h AS (
  SELECT l_returnflag, l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, v, c,
         SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY l_returnflag) AS n
  FROM h
)
SELECT l_returnflag,
       MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS p50,
       MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END) AS p90,
       CAST(MAX(n) AS BIGINT) AS n
FROM cum GROUP BY 1
""",
    description="EXACT distributed percentiles via value histogram "
    "(beyond-reference): for bounded-cardinality columns the scale path to "
    "an exact median is groupBy(value) counts + one cumulative window over "
    "the (group, distinct-value) histogram — state is O(distinct values), "
    "never O(rows), unlike percentile()'s in-memory value buffer. Lower "
    "discrete percentile: smallest v whose cumulative count reaches "
    "ceil(q(n+1))-ish rank, same integer formula in both engines",
    tags=("agg", "scale"),
)
def agg_exact_median_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Catalog(spark, sf_dir)
    h = t.lineitem.groupBy("l_returnflag", F.col("l_quantity").alias("v")).agg(
        F.count("*").alias("c")
    )
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("l_returnflag")
    cum = h.select(
        "l_returnflag",
        "v",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("v"))
            ).alias("p50"),
            F.min(
                F.when(F.col("cum") >= F.expr("(9 * n + 9) div 10"), F.col("v"))
            ).alias("p90"),
            F.max("n").cast("bigint").alias("n"),
        )
    )


# --------------------- KMV theta sketch: set algebra on sketches (r9)
#
# HLL unions but cannot intersect; the theta/KMV sketch (k-minimum-
# values — Beyer et al. 2007, Apache DataSketches theta, public
# literature) supports BOTH: keep the k smallest distinct hash values
# per set; theta = k-th smallest. Union of two sketches = k smallest
# of the merged samples (valid because each sketch holds >= k values
# below its own theta). Intersection = count common samples below
# theta_cap = min(theta_a, theta_b), scaled by P/theta_cap — the
# audience-overlap / corpus-overlap primitive a warehouse cannot get
# from HLL. Every step is exact integer algebra over the deterministic
# polynomial char hash, so DuckDB replays the IDENTICAL sketch and the
# ESTIMATES are value-hash-compared (the count-min convention) —
# a full-value oracle for an approximate structure.
#
# Scale shape: one distinct-aggregation to (set, h), then a windowed
# bottom-k per set — Spark's WindowGroupLimit pushes the k-limit
# map-side, so the exchange carries at most k rows per set per input
# partition, NOT the full distinct stream. Sketches are k longs per
# set regardless of corpus size; the pairwise stage is a broadcast
# self-join over 20 sketch rows.

KMV_K = 256
KMV_SHINGLE = 3


def _duck_char_hash(col: str) -> str:
    return f"""list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(range(1, length({col}) + 1),
                   i -> ascii(substr({col}, i, 1)))),
    (a, c) -> (a * 131 + c) % {CM_P})"""


def _duck_kmv_est(n: str, theta: str) -> str:
    return (
        f"CASE WHEN {n} < {KMV_K} THEN CAST({n} AS DOUBLE) "
        f"ELSE CAST(({KMV_K} - 1) AS DOUBLE) * {CM_P} "
        f"/ CAST({theta} AS DOUBLE) END"
    )


@register(
    "agg_theta_sketch_intersect",
    oracle=f"""
WITH t AS (SELECT source, {_DUCK_TOKS} AS toks FROM documents),
sh AS (
  SELECT source,
         unnest(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
  FROM t WHERE len(toks) >= {KMV_SHINGLE}
),
hs AS (SELECT DISTINCT source, {_duck_char_hash("g")} AS h FROM sh),
rn AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hs
),
sk AS (
  SELECT source, list(h ORDER BY h) AS sk,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM rn WHERE rn <= {KMV_K} GROUP BY source
),
th AS (
  SELECT source, sk, n,
         CASE WHEN n >= {KMV_K} THEN sk[{KMV_K}] ELSE {CM_P} END AS theta
  FROM sk
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         a.sk AS ask, a.n AS an, a.theta AS ath,
         b.sk AS bsk, b.n AS bn, b.theta AS bth,
         list_sort(list_distinct(list_concat(a.sk, b.sk))) AS u,
         least(a.theta, b.theta) AS ti
  FROM th a JOIN th b ON a.source < b.source
),
calc AS (
  SELECT src_a, src_b,
         {_duck_kmv_est("an", "ath")} AS est_a,
         {_duck_kmv_est("bn", "bth")} AS est_b,
         {_duck_kmv_est("len(u)",
                        f"u[{KMV_K}]")} AS est_union,
         CAST(len(list_intersect(list_filter(ask, x -> x < ti),
                                 list_filter(bsk, x -> x < ti)))
              AS DOUBLE) * {CM_P} / CAST(ti AS DOUBLE) AS est_intersect
  FROM pairs
)
SELECT src_a, src_b, est_a, est_b, est_union, est_intersect,
       est_intersect / est_union AS jaccard_est
FROM calc
""",
    description="KMV/theta distinct sketch with set algebra (beyond-"
    "reference): bottom-256 polynomial-hash samples of each source's "
    "3-gram shingle set; union = merged bottom-k (re-sketchable), "
    "intersection = common samples below min(theta) scaled by P/theta "
    "— the estimate HLL structurally cannot give. The windowed "
    "bottom-k build rides Spark's WindowGroupLimit (k rows per set "
    "per partition cross the exchange, not the distinct stream); "
    "pairwise algebra is a broadcast self-join over 20 k-long sketch "
    "rows. Exact integer hashing end-to-end, so the DuckDB oracle "
    "replays the identical sketch and the ESTIMATES value-hash-match; "
    "accuracy vs exact overlap is pinned in pytest (KMV rel-err "
    "~1/sqrt(k-1))",
    tags=("agg", "sketch", "dedup"),
)
def agg_theta_sketch_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return theta_sketch_pairs_frame(t.documents, k=KMV_K)


def kmv_sketches_frame(
    documents: DataFrame, k: int = KMV_K, set_col: str = "source"
) -> DataFrame:
    """(s, sk, n, theta) — one bottom-k sketch row per ``set_col``
    group, pre-checkpoint (the plan-shape pytest pins the
    WindowGroupLimit bottom-k on this frame; theta_sketch_pairs_frame
    checkpoints it before the pair join)."""
    from pyspark.sql import Window as W  # noqa: PLC0415

    from cc_pyspark_spark.functions.text import shingles  # noqa: PLC0415

    sh = documents.select(
        F.col(set_col).alias("s"), tokenize("text").alias("toks")
    ).select("s", F.explode(shingles("toks", KMV_SHINGLE)).alias("g"))
    hs = sh.select(
        "s", F.expr(_char_hash_spark("g")).cast("bigint").alias("h")
    ).distinct()
    rn = hs.withColumn(
        "rn", F.row_number().over(W.partitionBy("s").orderBy("h"))
    ).filter(F.col("rn") <= k)
    sk = rn.groupBy("s").agg(
        F.sort_array(F.collect_list("h")).alias("sk"),
        F.count("*").cast("bigint").alias("n"),
    )
    return sk.select(
        "s",
        "sk",
        "n",
        F.when(F.col("n") >= k, F.element_at("sk", k))
        .otherwise(F.lit(CM_P))
        .cast("bigint")
        .alias("theta"),
    )


def theta_sketch_pairs_frame(
    documents: DataFrame, k: int = KMV_K, set_col: str = "source"
) -> DataFrame:
    """Pairwise (union, intersection, jaccard) estimates between the
    shingle sets of each ``set_col`` group, via exact-replayable KMV
    sketches. ``k`` > universe size degrades gracefully to exact-mode
    (theta = P, estimate = true distinct count) — pinned in pytest."""
    # Both sides of the pair self-join reference th; without the
    # checkpoint Catalyst re-builds the whole corpus-side sketch
    # subtree (scan -> distinct -> bottom-k) twice. th is one k-long
    # row per set — materializing it is free and halves the plan.
    th = kmv_sketches_frame(documents, k=k, set_col=set_col).localCheckpoint(
        eager=True
    )
    a = th.select(
        F.col("s").alias("src_a"),
        F.col("sk").alias("ask"),
        F.col("n").alias("an"),
        F.col("theta").alias("ath"),
    )
    b = th.select(
        F.col("s").alias("src_b"),
        F.col("sk").alias("bsk"),
        F.col("n").alias("bn"),
        F.col("theta").alias("bth"),
    )
    # sketch frames are k longs per set — broadcast the pair join
    pairs = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b")).select(
        "src_a",
        "src_b",
        "an",
        "ath",
        "bn",
        "bth",
        "ask",
        "bsk",
        F.array_sort(F.array_distinct(F.concat("ask", "bsk"))).alias("u"),
        F.least("ath", "bth").alias("ti"),
    )

    def est(n, theta):
        return (
            F.when(n < k, n.cast("double"))
            .otherwise(
                F.lit(float(k - 1)) * F.lit(CM_P) / theta.cast("double")
            )
        )

    inter_n = F.size(
        F.array_intersect(
            F.filter("ask", lambda x: x < F.col("ti")),
            F.filter("bsk", lambda x: x < F.col("ti")),
        )
    ).cast("bigint")
    calc = pairs.select(
        "src_a",
        "src_b",
        est(F.col("an"), F.col("ath")).alias("est_a"),
        est(F.col("bn"), F.col("bth")).alias("est_b"),
        est(F.size("u").cast("bigint"), F.element_at("u", k)).alias(
            "est_union"
        ),
        (
            inter_n.cast("double")
            * F.lit(CM_P)
            / F.col("ti").cast("double")
        ).alias("est_intersect"),
    )
    return calc.select(
        "*",
        (F.col("est_intersect") / F.col("est_union")).alias("jaccard_est"),
    )
