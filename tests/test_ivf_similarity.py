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
