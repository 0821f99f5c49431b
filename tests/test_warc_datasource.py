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


def test_warc_stream_reader_incremental_manifest(spark, corpus, tmp_path):
    """readStream.format('warc'): each availableNow pass consumes only
    the manifest lines appended since the checkpointed offset —
    exactly-once per archive, parse on executors."""
    from cc_pyspark_spark.sources.warc_datasource import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    manifest = tmp_path / "manifest.txt"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    manifest.write_text(corpus["files"][0] + "\n")

    def run_pass():
        q = (
            spark.readStream.format("warc")
            .option("manifest", str(manifest))
            .option("record_types", "response")
            .load()
            .select("warc_filename", "warc_record_offset", "target_uri")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_pass()
    first = spark.read.parquet(out)
    assert first.select("warc_filename").distinct().count() == 1
    n_after_first = first.count()
    assert n_after_first > 0

    # append a second archive; the next pass must add ONLY its records
    manifest.write_text(
        corpus["files"][0] + "\n" + corpus["files"][1] + "\n"
    )
    run_pass()
    both = spark.read.parquet(out)
    assert both.select("warc_filename").distinct().count() == 2
    assert both.count() > n_after_first
    # no re-ingestion of the first archive (exactly-once per line range)
    dup = (
        both.groupBy("warc_filename", "warc_record_offset")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0


def test_registered_warcq_partitioning(spark):
    """The registered warc_source_payload_digest query reads one
    InputPartition per derived archive and covers every document."""
    from cc_pyspark_spark.plans import QUERIES
    from cc_pyspark_spark.plans.warcq import _N_FILES
    from tests.conftest import SF_DIR

    df = QUERIES["warc_source_payload_digest"].spark(spark, SF_DIR)
    assert df.rdd.getNumPartitions() == _N_FILES
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert df.count() == docs.count()


def test_tiny_fixture_publishes_all_shards_header_only(spark, tmp_path):
    """A documents table smaller than _N_FILES must still publish all
    _N_FILES archives (empty residue classes backfilled as valid
    header-only WARCs) — ADVICE r8: the r8 executor-side build used to
    RuntimeError because tasks never write zero-doc shards."""
    import shutil

    from cc_pyspark_spark.plans.warcq import _N_FILES, derived_warc_manifest
    from cc_pyspark_spark.sources.warcio_lite import iter_warc_records

    sf_dir = tmp_path / "sf_tiny"
    sf_dir.mkdir()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.filter("doc_id < 2").coalesce(1).write.parquet(
        str(sf_dir / "documents.parquet")
    )
    # the builder memoizes on /tmp path derived from the basename
    shutil.rmtree("/tmp/cc_pyspark_spark_warcq_sf_tiny", ignore_errors=True)
    manifest = derived_warc_manifest(spark, str(sf_dir))
    paths = open(manifest).read().split()
    assert len(paths) == _N_FILES
    n_responses = 0
    for p in paths:
        with open(p, "rb") as fh:
            recs = list(iter_warc_records(fh))
        assert recs, f"{p} must hold at least the warcinfo record"
        assert recs[0].rec_type == "warcinfo"
        n_responses += sum(1 for r in recs if r.rec_type == "response")
    assert n_responses == 2
    shutil.rmtree("/tmp/cc_pyspark_spark_warcq_sf_tiny", ignore_errors=True)
