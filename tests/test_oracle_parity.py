"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (CORRECTNESS_r{N}.json) so failures
surface locally first.
"""

from __future__ import annotations

import pytest

from cc_pyspark_spark.plans import QUERIES
from tests.conftest import SF_DIR
from tests.oracle_compare import assert_frames_match

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
NO_ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    spark_pdf = q.spark(spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(q.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_query_runs(spark, name):
    q = QUERIES[name]
    df = q.spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_bloom_novelty_one_sided_vs_exact(spark):
    """Bloom membership can only over-report (false positives, never
    false negatives): per doc, n_seen_bloom >= exact n_seen and
    novelty_bloom <= exact novelty — and at the fixture's ~5% fill
    factor the two should agree on the vast majority of docs."""
    exact = {
        r["doc_id"]: (r["n_seen"], r["novelty"])
        for r in QUERIES["text_ngram_novelty"].spark(spark, SF_DIR).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_seen_bloom"], r["novelty_bloom"])
        for r in QUERIES["text_ngram_novelty_bloom"]
        .spark(spark, SF_DIR)
        .collect()
    }
    assert exact.keys() == bloom.keys()
    agree = 0
    for d, (ns, nov) in exact.items():
        nsb, novb = bloom[d]
        assert nsb >= ns, f"doc {d}: bloom under-reported membership"
        assert novb <= nov + 1e-12, f"doc {d}: bloom novelty exceeded exact"
        agree += nsb == ns
    assert agree >= 0.9 * len(exact), (
        f"only {agree}/{len(exact)} docs agree — fill factor off"
    )
