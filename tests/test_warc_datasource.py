"""spark.read.format('warc') Python DataSource."""

from __future__ import annotations

import pytest

from cc_pyspark_spark.sources.fixtures import generate_warc_corpus
from cc_pyspark_spark.sources.warc import warc_records
from cc_pyspark_spark.sources.warc_datasource import WarcDataSource


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("ds-corpus")
    return generate_warc_corpus(str(out))


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(WarcDataSource)


def test_format_warc_matches_mapinpandas_source(spark, corpus):
    via_ds = (
        spark.read.format("warc")
        .option("manifest", corpus["manifest"])
        .load()
    )
    via_mp = warc_records(spark, corpus["manifest"], num_input_partitions=2)
    key = ["warc_filename", "warc_record_offset"]
    a = {tuple(r) for r in via_ds.select(*key, "record_type", "target_uri").collect()}
    b = {tuple(r) for r in via_mp.select(*key, "record_type", "target_uri").collect()}
    assert a == b
    assert via_ds.rdd.getNumPartitions() == len(corpus["files"])  # 1 file = 1 split


def test_format_warc_record_type_option(spark, corpus):
    df = (
        spark.read.format("warc")
        .option("manifest", corpus["manifest"])
        .option("record_types", "conversion")
        .load()
    )
    types = {r[0] for r in df.select("record_type").distinct().collect()}
    assert types == {"conversion"}


def test_format_warc_jobs_compose(spark, corpus):
    from cc_pyspark_spark.jobs import server_count

    df = (
        spark.read.format("warc")
        .option("manifest", corpus["manifest"])
        .option("record_types", "response")
        .load()
    )
    out = dict(server_count(df).collect())
    assert out and sum(out.values()) > 0
