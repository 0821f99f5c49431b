"""curation_pipeline_full: gate → C4 → near-dedup → split → pack.

The driver oracle takes the all-pairs exact-Jaccard set as the near-dup
stage's twin, which binds only while MinHash-LSH recall on the CLEANED
corpus is complete — pin that here (at BOTH driver SFs, since per-SF
texts differ) so drift fails locally before it fails the driver gate.
Re-verify this test before committing regenerated testdata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cc_pyspark_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _cleaned_corpus(spark, sf_dir):
    from cc_pyspark_spark.catalog import Catalog
    from cc_pyspark_spark.plans.c4 import _AUG_SPARK, c4_clean_frame
    from cc_pyspark_spark.plans.text import gopher_signals_frame

    docs = Catalog(spark, sf_dir).documents
    keep = (
        gopher_signals_frame(docs, carry=("lang", "text"))
        .filter(F.col("gopher_pass") == 1)
        .select("doc_id", "lang", "text")
    )
    aug = keep.select("doc_id", "lang", F.expr(_AUG_SPARK).alias("text"))
    return (
        c4_clean_frame(aug, carry=("lang",))
        .filter(F.col("c4_pass") == 1)
        .select("doc_id", "lang", F.col("cleaned_text").alias("text"))
    )


@pytest.mark.parametrize("sf", [SF_DIR, "/root/testdata/sf0.01"])
def test_pipeline_full_minhash_recall(spark, sf):
    """LSH pairs over the cleaned corpus == exact all-pairs Jaccard —
    the oracle's load-bearing assumption, at both driver SFs."""
    from cc_pyspark_spark.functions.text import shingles, tokenize
    from cc_pyspark_spark.operators.dedup import minhash_lsh_pairs

    cleaned = _cleaned_corpus(spark, sf).persist()
    got = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(cleaned, threshold=0.5).collect()
    }
    sh = (
        cleaned.select("doc_id", tokenize("text").alias("toks"))
        .select(
            "doc_id", F.explode(F.array_distinct(shingles("toks"))).alias("s")
        )
        .persist()
    )
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
    exact = {
        (r["a_id"], r["b_id"])
        for r in (
            inter.join(
                sizes.withColumnsRenamed({"doc_id": "a_id", "n": "na"}), "a_id"
            )
            .join(
                sizes.withColumnsRenamed({"doc_id": "b_id", "n": "nb"}), "b_id"
            )
            .filter(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")) >= 0.5
            )
        ).collect()
    }
    assert exact, "cleaned corpus has no near-dup pairs — recall untested"
    assert got == exact
    cleaned.unpersist()
    sh.unpersist()


def test_pipeline_full_survivor_semantics(spark):
    """Packed docs are exactly: c4-passing gate survivors, minus
    non-canonical cluster members, minus the eval split."""
    from cc_pyspark_spark.operators.dedup import minhash_lsh_pairs

    cleaned = _cleaned_corpus(spark, SF_DIR).persist()
    pairs = minhash_lsh_pairs(cleaned, threshold=0.5).collect()
    # union-find over the pair set (tiny at sf0.001)
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for p in pairs:
        union(p["a_id"], p["b_id"])
    ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    survivors = {i for i in ids if find(i) == i}
    import hashlib

    train = {
        i
        for i in survivors
        if hashlib.md5(str(i).encode()).hexdigest()[0] in "0123456789ab"
    }
    packed = QUERIES["curation_pipeline_full"].spark(spark, SF_DIR).collect()
    assert {r["doc_id"] for r in packed} == train
    # packing well-formed: offsets restart at 0 per (lang, shard, seq)
    seen = {}
    for r in sorted(packed, key=lambda r: (r["lang"], r["shard"], r["doc_id"])):
        key = (r["lang"], r["shard"], r["pack_seq"])
        if key not in seen:
            assert r["pack_offset"] == 0
        seen[key] = r["pack_offset"] + r["n_tokens"]
    cleaned.unpersist()


def test_pipeline_full_scan_count(spark):
    """Plan pin: ≤ 2 documents scans (C4's frequency + rebuild passes);
    banding, survivor filter, and packing read the persisted cleaned
    corpus, never the source again."""
    df = QUERIES["curation_pipeline_full"].spark(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("documents.parquet") <= 2, plan
