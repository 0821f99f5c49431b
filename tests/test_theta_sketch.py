"""KMV/theta sketch set algebra (plans/sketches.py, r9).

The oracle pins that DuckDB replays the identical sketch; these tests
pin that the sketch is a USEFUL estimator — accuracy vs exact overlap
at k=256 (rel-err ~ 1/sqrt(k-1) ≈ 6%), and graceful exact-mode
degradation when k exceeds the universe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_pyspark_spark.functions.text import shingles, tokenize
from cc_pyspark_spark.plans import QUERIES
from cc_pyspark_spark.plans.sketches import (
    KMV_SHINGLE,
    theta_sketch_pairs_frame,
)
from tests.conftest import SF_DIR


def _exact_overlaps(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = docs.select(
        F.col("source").alias("s"), tokenize("text").alias("toks")
    ).select("s", F.explode(shingles("toks", KMV_SHINGLE)).alias("g"))
    sets = {
        r["s"]: set(r["gs"])
        for r in sh.groupBy("s").agg(F.collect_set("g").alias("gs")).collect()
    }
    return sets


def test_estimates_track_exact_overlap(spark):
    est = {
        (r["src_a"], r["src_b"]): r
        for r in QUERIES["agg_theta_sketch_intersect"]
        .spark(spark, SF_DIR)
        .collect()
    }
    sets = _exact_overlaps(spark)
    assert len(est) == len(sets) * (len(sets) - 1) // 2
    import math
    import statistics

    worst_u = 0.0
    ri_all = []
    for (a, b), r in est.items():
        exact_u = len(sets[a] | sets[b])
        exact_i = len(sets[a] & sets[b])
        ru = abs(r["est_union"] - exact_u) / exact_u
        ri = abs(r["est_intersect"] - exact_i) / exact_i
        worst_u = max(worst_u, ru)
        ri_all.append(ri)
        # theta-intersection rel-err scales 1/sqrt(samples landing in
        # the intersection): exp_n = exact_i * (k-1)/max(|A|,|B|)
        # (~11-14 samples on this fixture). 5/sqrt(exp_n) is ~5 sigma;
        # measured worst over 190 pairs is ~0.8 vs bound ~1.5.
        exp_n = exact_i * 255.0 / max(len(sets[a]), len(sets[b]))
        assert ri < 5.0 / math.sqrt(max(1.0, exp_n)), (a, b, ri, exp_n)
        jac = exact_i / exact_u
        assert abs(r["jaccard_est"] - jac) < 0.15
    # union sketches hold ~256 effective samples: worst of 190 pairs
    # stays inside 4 sigma of 1/sqrt(k-1) ~ 6.3%
    assert worst_u < 0.25, worst_u
    assert statistics.mean(ri_all) < 0.30, statistics.mean(ri_all)


def test_exact_mode_when_k_exceeds_universe(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    out = {
        (r["src_a"], r["src_b"]): r
        for r in theta_sketch_pairs_frame(docs, k=1_000_000).collect()
    }
    sh = docs.select(
        F.col("source").alias("s"), tokenize("text").alias("toks")
    ).select("s", F.explode(shingles("toks", KMV_SHINGLE)).alias("g"))
    sets = {
        r["s"]: set(r["gs"])
        for r in sh.groupBy("s").agg(F.collect_set("g").alias("gs")).collect()
    }
    for (a, b), r in out.items():
        assert r["est_a"] == float(len(sets[a]))
        assert r["est_b"] == float(len(sets[b]))
        assert r["est_union"] == float(len(sets[a] | sets[b]))
        # exact mode keeps every hash below theta=P, so the
        # intersection estimate is exact too (modulo hash collisions,
        # absent at this universe size)
        assert r["est_intersect"] == float(len(sets[a] & sets[b]))


def test_priority_sample_unbiased_total(spark):
    """Priority sampling's defining property: for each draw (salt),
    sum(max(w, tau)) over the kept k estimates the TOTAL token mass;
    averaging over salts converges on the exact total (DLT 2007)."""
    from cc_pyspark_spark.plans.curation import priority_sample_frame

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = docs.select(
        F.sum(F.size(tokenize("text")).cast("bigint")).alias("t")
    ).collect()[0]["t"]
    ests = []
    for i in range(12):
        kept = priority_sample_frame(docs, k=100, salt=f"s{i}:")
        est = kept.agg(F.sum("adj_weight").alias("e")).collect()[0]["e"]
        # every single draw is within the k=100 concentration envelope
        assert abs(est - exact) / exact < 0.25, (i, est, exact)
        ests.append(est)
    mean = sum(ests) / len(ests)
    assert abs(mean - exact) / exact < 0.06, (mean, exact)


def test_priority_sample_keeps_everything_when_k_exceeds_corpus(spark):
    """DLT n <= k degenerate case: tau = 0, every doc kept with
    adj_weight = its own w (regression: an empty (k+1)-th-priority
    frame used to annihilate the whole result via the cross join)."""
    from cc_pyspark_spark.plans.curation import priority_sample_frame

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    kept = priority_sample_frame(docs, k=n + 100)
    rows = kept.collect()
    assert len(rows) == n
    for r in rows:
        assert r["adj_weight"] == float(r["w"])
