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


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
