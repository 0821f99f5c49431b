from __future__ import annotations

import duckdb
import pytest

from cc_pyspark_spark.catalog import TABLES
from cc_pyspark_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="cc-pyspark-spark-tests", master="local[4]", shuffle_partitions=8
    )
    yield spark


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Free operator-internal persists after every test.

    The whole suite shares ONE local JVM; without this, ~160 oracled
    queries' LSH band tables / adjacency frames accumulate as cached
    blocks over the 13-minute session until broadcast builds start
    failing with notEnoughMemoryToBuildAndBroadcastTableError late in
    the run (observed r9). Releasing per-test is always correct —
    plans recompute — and exercises the production cache-lifecycle
    contract (ADVICE r8) on every test.
    """
    yield
    from cc_pyspark_spark.caching import release_caches

    release_caches()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
