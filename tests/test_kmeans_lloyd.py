"""embedding_kmeans_lloyd vs an independent numpy Lloyd iteration.

The DuckDB oracle replays the same algebra; this check runs a THIRD
implementation (numpy float64, no fixed-point) — agreement on the
final assignments shows the fixed-point quantization is faithful to
real k-means, not just self-consistent."""

from __future__ import annotations

import numpy as np

from cc_pyspark_spark.plans.similarity import (
    KM_K,
    KM_MAX_ID,
    KM_ROUNDS,
    KM_SEED_BASE,
)
from cc_pyspark_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_kmeans_assignments_match_numpy(spark):
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    X = np.stack([emb[i] for i in range(KM_MAX_ID)])
    C = np.stack([emb[KM_SEED_BASE + j] for j in range(KM_K)])

    def assign(C):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        # (dist, id) tie-break — argmin takes the lowest id on ties
        return d2.argmin(axis=1)

    for _ in range(KM_ROUNDS):
        a = assign(C)
        C = np.stack(
            [
                X[a == j].mean(axis=0) if (a == j).any() else C[j]
                for j in range(KM_K)
            ]
        )
    want = assign(C)

    got = {
        r["vec_id"]: r["cluster"]
        for r in QUERIES["embedding_kmeans_lloyd"].spark(spark, SF_DIR).collect()
    }
    mismatches = [i for i in range(KM_MAX_ID) if got[i] != want[i]]
    # the engine floors at 1e-12 per centroid coordinate; only points
    # near-equidistant to two centroids could flip — none on the fixture
    assert not mismatches, mismatches[:10]
