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
