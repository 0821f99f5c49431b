"""curation_semdedup (r13): cluster-local semantic dedup must find the
planted near-dup twins and behave like SemDeDup's keep-the-atypical
rule, independently of the DuckDB oracle replay."""

from __future__ import annotations

from cc_pyspark_spark.plans.registry import QUERIES
from cc_pyspark_spark.plans.similarity import (
    KM_MAX_ID,
    SEMDEDUP_TWIN_OFFSET,
)
from tests.conftest import SF_DIR


def _rows(spark):
    return QUERIES["curation_semdedup"].spark(spark, SF_DIR).collect()


def test_semdedup_drops_exactly_one_of_each_twin_pair(spark):
    rows = {r["vec_id"]: r for r in _rows(spark)}
    n = min(KM_MAX_ID, max(v for v in rows if v < SEMDEDUP_TWIN_OFFSET) + 1)
    assert len(rows) == 2 * n  # corpus + twins, one verdict row each
    dropped = {v for v, r in rows.items() if not r["keep"]}
    same_cluster_pairs = 0
    for i in range(n):
        twin = i + SEMDEDUP_TWIN_OFFSET
        if rows[i]["cluster"] == rows[twin]["cluster"]:
            same_cluster_pairs += 1
            # a twin pair at cos ~0.9999 in one cluster: exactly one
            # side survives (the drop rule is a strict total order on
            # (d2, vec_id), so mutual-drop and mutual-keep are both
            # impossible unless a third >=0.95 neighbor exists — and
            # the fixture's organic pairs top out at ~0.51)
            assert (i in dropped) != (twin in dropped), (i, twin)
    # clustering must actually co-locate the twins for the query to
    # mean anything — require the overwhelming majority do
    assert same_cluster_pairs >= 0.9 * n, same_cluster_pairs


def test_semdedup_survivor_is_the_atypical_side(spark):
    """SemDeDup keeps the example farthest from its centroid: for every
    same-cluster twin pair, the dropped side must be the one nearer the
    centroid (or the higher vec_id on an exact d2 tie)."""
    from pyspark.sql import functions as F  # noqa: PLC0415
    from cc_pyspark_spark.plans.similarity import _km_lloyd  # noqa: PLC0415
    from cc_pyspark_spark.catalog import Catalog  # noqa: PLC0415
    from cc_pyspark_spark.plans.similarity import (  # noqa: PLC0415
        KM_K,
        KM_SEED_BASE,
    )

    t = Catalog(spark, SF_DIR)
    full = t.embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    base = full.filter(F.col("vec_id") < KM_MAX_ID)
    twins = base.select(
        (F.col("vec_id") + F.lit(SEMDEDUP_TWIN_OFFSET)).alias("vec_id"),
        F.expr("concat(array(v[0] * 1.0625D), slice(v, 2, size(v) - 1))").alias("v"),
    )
    cent = full.filter(
        (F.col("vec_id") >= KM_SEED_BASE)
        & (F.col("vec_id") < KM_SEED_BASE + KM_K)
    ).select((F.col("vec_id") - KM_SEED_BASE).alias("c_id"), F.col("v").alias("cv"))
    d2 = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in _km_lloyd(base.unionAll(twins), cent).collect()
    }
    rows = {r["vec_id"]: r for r in _rows(spark)}
    n = max(v for v in rows if v < SEMDEDUP_TWIN_OFFSET) + 1
    for i in range(n):
        twin = i + SEMDEDUP_TWIN_OFFSET
        if d2[i][0] != d2[twin][0]:
            continue
        drop_side = i if not rows[i]["keep"] else twin
        keep_side = twin if drop_side == i else i
        beats = d2[keep_side][1] > d2[drop_side][1] or (
            d2[keep_side][1] == d2[drop_side][1] and keep_side < drop_side
        )
        assert beats, (i, twin, d2[i], d2[twin])
