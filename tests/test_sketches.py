"""Mergeable-sketch operators (plans/sketches.py).

Oracle parity itself is covered by test_oracle_parity.py (both queries
carry full oracles); these tests pin the *structural* sketch
guarantees that the gate columns summarize.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.sketches import (
    CM_D,
    CM_P,
    CM_W,
    _char_hash_spark,
    agg_count_min_heavy_hitters,
    agg_hll_sketch_union,
)
from cc_pyspark_spark.functions.text import tokenize
from tests.conftest import SF_DIR


def test_cms_never_undercounts(spark):
    """Count-min is one-sided: est >= exact for every probed key."""
    rows = agg_count_min_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.est >= r.exact, (r.token, r.est, r.exact)
        assert r.bound_ok, (r.token, r.est, r.exact)


def test_cms_sketch_size_is_bounded(spark):
    """The sketch is at most D×W cells regardless of corpus size —
    that bound IS the 100 TB story (rebuild of the plan fragment in
    agg_count_min_heavy_hitters up to the sketch aggregation)."""
    t = Catalog(spark, SF_DIR)
    tc = (
        t.documents.select(F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    hb = tc.withColumn("h", F.expr(_char_hash_spark("token")))
    buckets = hb.select(
        F.posexplode(
            F.array(
                *[
                    ((F.col("h") * (131 + 2 * i) + (17 + 31 * i)) % CM_P) % CM_W
                    for i in range(CM_D)
                ]
            )
        ).alias("i", "b")
    )
    sketch = buckets.groupBy("i", "b").count()
    assert sketch.count() <= CM_D * CM_W
    # Bucket values live in [0, W): the hash is mod-reduced, not raw.
    mx = buckets.agg(F.max("b").alias("mx"), F.min("b").alias("mn")).first()
    assert 0 <= mx.mn and mx.mx < CM_W


def test_hll_union_matches_global_sketch(spark):
    """HLL merge is lossless at fixed lgConfigK: estimating the union
    of per-shard sketches equals estimating one global sketch — the
    property that makes persisted shard sketches re-aggregable."""
    t = Catalog(spark, SF_DIR)
    base = t.documents.select(
        "lang", "source", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    merged = (
        base.groupBy("lang", "source")
        .agg(F.hll_sketch_agg("fp", F.lit(14)).alias("sk"))
        .groupBy("lang")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("est"))
    )
    direct = base.groupBy("lang").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("fp", F.lit(14))).alias("est")
    )
    m = {r.lang: r.est for r in merged.collect()}
    d = {r.lang: r.est for r in direct.collect()}
    assert m == d


def test_hll_within_bound_column_true(spark):
    out = agg_hll_sketch_union(spark, SF_DIR).collect()
    assert out and all(r.within_2pct for r in out)
    # shard count = distinct sources per lang — confirms the two-level
    # (shard then merge) aggregation actually grouped by source.
    t = Catalog(spark, SF_DIR)
    exp = {
        r.lang: r.n
        for r in t.documents.groupBy("lang")
        .agg(F.count_distinct("source").alias("n"))
        .collect()
    }
    assert {r.lang: r.n_shards for r in out} == exp


def test_cms_shard_merge_is_elementwise_addition(spark):
    """The mergeability claim: building per-shard sketches and adding
    them cell-wise equals the whole-corpus sketch — the groupBy(i, b)
    SUM is both the build and the merge."""
    t = Catalog(spark, SF_DIR)

    def sketch_of(df):
        tc = (
            df.select(F.explode(tokenize("text")).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("c"))
        )
        hb = tc.withColumn("h", F.expr(_char_hash_spark("token")))
        return (
            hb.select(
                F.posexplode(
                    F.array(
                        *[
                            ((F.col("h") * (131 + 2 * i) + (17 + 31 * i)) % CM_P)
                            % CM_W
                            for i in range(CM_D)
                        ]
                    )
                ).alias("i", "b"),
                "c",
            )
            .groupBy("i", "b")
            .agg(F.sum("c").alias("cnt"))
        )

    whole = {(r.i, r.b): r.cnt for r in sketch_of(t.documents).collect()}
    sa = sketch_of(t.documents.filter(F.col("doc_id") % 2 == 0)).collect()
    sb = sketch_of(t.documents.filter(F.col("doc_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in [*sa, *sb]:
        merged[(r.i, r.b)] = merged.get((r.i, r.b), 0) + r.cnt
    assert merged == whole
