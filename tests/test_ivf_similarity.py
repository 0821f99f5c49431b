"""IVF ANN: nprobe=k is exact; small nprobe trades recall for touch-set."""

from __future__ import annotations

import pytest

from cc_pyspark_spark.operators.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_topk,
)
from tests.conftest import SF_DIR

QUERIES = list(range(10))
K = 8


@pytest.fixture(scope="module")
def built(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, centroids = ivf_build(emb, k=K)
    truth = {
        (r["q_id"], r["n_id"])
        for r in brute_force_topk(emb, QUERIES, top_k=5).collect()
    }
    return assigned, centroids, truth


def test_ivf_exhaustive_probe_equals_brute_force(spark, built):
    assigned, centroids, truth = built
    got = {
        (r["q_id"], r["n_id"])
        for r in ivf_topk(assigned, centroids, QUERIES, top_k=5, nprobe=K).collect()
    }
    assert got == truth


def test_ivf_partial_probe_recall(spark, built):
    assigned, centroids, truth = built
    got = {
        (r["q_id"], r["n_id"])
        for r in ivf_topk(assigned, centroids, QUERIES, top_k=5, nprobe=2).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"nprobe=2 recall too low: {recall}"


def test_sparse_tfidf_abs_posting_cap(spark, tmp_path):
    """r8 (VERDICT r7 ask #3): the absolute posting-list cap is a real
    operator parameter, not SCALING.md prose. On a corpus with a df=2
    token and a df=3 token (both under the n/2 relative cap), capping
    max_posting=2 must (a) hash-match the identically-capped DuckDB
    oracle, (b) drop exactly the df=3 token's pairs while keeping the
    df=2 pairs — the per-token fan-out bound (<= cap^2 candidate pairs)
    binding for real, with a non-empty result."""
    import duckdb

    from cc_pyspark_spark.plans.similarity import (
        _duck_sparse_tfidf_oracle,
        sim_sparse_tfidf_topk,
    )
    from tests.oracle_compare import assert_frames_match

    docs = [
        (0, "pairtok fill0a fill0b"),
        (1, "pairtok fill1a fill1b"),
        (2, "tritok fill2a fill2b"),
        (3, "tritok fill3a fill3b"),
        (4, "tritok fill4a fill4b"),
        (5, "fill5a fill5b fill5c"),
        (6, "fill6a fill6b fill6c"),
        (7, "fill7a fill7b fill7c"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )

    def pairs(pdf):
        return set(map(tuple, pdf[["a_id", "b_id"]].itertuples(index=False)))

    capped = sim_sparse_tfidf_topk(spark, sf_dir, max_posting=2).toPandas()
    want = con.sql(_duck_sparse_tfidf_oracle(max_posting=2)).df()
    assert_frames_match(capped, want, "sim_sparse_tfidf_topk[max_posting=2]")
    # df=2 token's pair survives (both directions of the top-k listing)
    assert pairs(capped) == {(0, 1), (1, 0)}

    default = sim_sparse_tfidf_topk(spark, sf_dir).toPandas()
    dwant = con.sql(_duck_sparse_tfidf_oracle()).df()
    assert_frames_match(default, dwant, "sim_sparse_tfidf_topk[default]")
    # uncapped: the df=3 token's pairs are present too
    assert pairs(default) == {
        (0, 1), (1, 0),
        (2, 3), (3, 2), (2, 4), (4, 2), (3, 4), (4, 3),
    }
