"""WET side-output, md5sum, text sinks, generic table IO, accumulators."""

from __future__ import annotations

import gzip
import hashlib
import os

import pytest

from cc_pyspark_spark.jobs.md5sum import md5sum
from cc_pyspark_spark.operators.graph import host_links_to_graph
from cc_pyspark_spark.operators.wet import extract_wet_files
from cc_pyspark_spark.sources.fixtures import generate_warc_corpus
from cc_pyspark_spark.sources.tables import (
    checkpoint_table,
    load_csv,
    load_tsv_pairs,
    write_table,
    write_text_gz,
)
from cc_pyspark_spark.sources.warc import WarcMetrics, warc_records
from cc_pyspark_spark.sources.warcio_lite import iter_warc_records


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("sink-corpus")
    return generate_warc_corpus(str(out))


def test_wet_extraction_side_output(spark, corpus, tmp_path):
    records = warc_records(spark, corpus["manifest"], num_input_partitions=2)
    out_dir = str(tmp_path / "wet_out")
    manifest = extract_wet_files(records, out_dir).collect()
    written = {r["warc_filename"]: r for r in manifest}
    assert all(not r["skipped"] for r in manifest)
    total = 0
    for r in manifest:
        assert os.path.exists(r["wet_path"])
        with open(r["wet_path"], "rb") as f:
            recs = list(iter_warc_records(f.read()))
        conv = [x for x in recs if x.rec_type == "conversion"]
        assert len(conv) == r["n_records"] > 0
        # text must be tag-free
        assert all(b"<" not in x.payload for x in conv)
        total += len(conv)
    assert total > 0

    # idempotence: second run skips everything
    manifest2 = extract_wet_files(
        warc_records(spark, corpus["manifest"], num_input_partitions=2), out_dir
    ).collect()
    assert all(r["skipped"] for r in manifest2)
    assert {r["warc_filename"] for r in manifest2} == set(written)


def test_md5sum_matches_hashlib(spark, corpus):
    files = [f for f in corpus["files"] if f.endswith(".warc.gz")][:3]
    got = {
        r["file"]: r["md5"]
        for r in md5sum(spark, os.path.dirname(files[0]) + "/*.warc.gz").collect()
    }
    for f in files:
        want = hashlib.md5(open(f, "rb").read()).hexdigest()
        assert got[os.path.basename(f)] == want


def test_graph_text_sink(spark, tmp_path):
    edges = spark.createDataFrame(
        [("com.a", "com.b"), ("com.b", "com.c")], ["s", "t"]
    )
    vertices, int_edges = host_links_to_graph(edges)
    vpath = str(tmp_path / "vertices")
    write_text_gz(vertices, vpath)
    parts = [p for p in os.listdir(vpath) if p.endswith(".txt.gz")]
    assert parts
    lines = []
    for p in parts:
        with gzip.open(os.path.join(vpath, p), "rt") as fh:
            lines += [ln.strip() for ln in fh if ln.strip()]
    assert sorted(lines) == ["com.a\t1", "com.b\t2", "com.c\t3"]


def test_generic_table_io(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    csv_path = str(tmp_path / "t.csv")
    df.write.option("header", "true").csv(csv_path)
    back = load_csv(spark, csv_path)
    assert {tuple(r) for r in back.collect()} == {(1, "x"), (2, "y")}

    tsv_path = str(tmp_path / "pairs.tsv")
    spark.createDataFrame([("a", "b")], ["s", "t"]).write.option("sep", "\t").csv(
        tsv_path
    )
    pairs = load_tsv_pairs(spark, tsv_path)
    assert pairs.collect()[0].asDict() == {"s": "a", "t": "b"}

    orc_path = str(tmp_path / "t.orc")
    write_table(df, orc_path, fmt="orc", compression="gzip")  # zlib fixup
    assert spark.read.orc(orc_path).count() == 2

    ckpt = checkpoint_table(df, spark, str(tmp_path / "ckpt"))
    assert ckpt.count() == 2


def test_warc_metrics_accumulators(spark, corpus):
    metrics = WarcMetrics(spark)
    manifest_plus_bogus = corpus["files"] + ["/nonexistent/bogus.warc.gz"]
    df = warc_records(
        spark, manifest_plus_bogus, num_input_partitions=2, metrics=metrics
    )
    n = df.count()
    logged = metrics.log()
    assert logged["files_processed"] == len(corpus["files"])
    assert logged["files_failed"] == 1
    assert logged["records_processed"] == n


def test_linkmap_to_parquet(spark, tmp_path):
    from cc_pyspark_spark.jobs.pipelines import linkmap_to_parquet

    tsv_dir = str(tmp_path / "pairs_in")
    spark.createDataFrame(
        [("com.a", "com.b"), ("com.a", "com.b"), ("com.b", "com.c")], ["s", "t"]
    ).write.option("sep", "\t").csv(tsv_dir)
    out = linkmap_to_parquet(spark, tsv_dir, str(tmp_path / "pairs_out"))
    got = sorted(tuple(r) for r in out.collect())
    assert got == [("com.a", "com.b"), ("com.b", "com.c")]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join with zero shuffles and
    a bucket-key groupBy skips its exchange — the pay-once co-location
    contract write_bucketed_table exists for."""
    from pyspark.sql import functions as F

    from cc_pyspark_spark.sources.tables import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.range(0, 5000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 97).alias("feat")
        )
        scores = spark.range(0, 5000).select(
            F.col("id").alias("doc_id"), (F.col("id") * 7 % 101).alias("score")
        )
        write_bucketed_table(docs, "b_docs", "doc_id", num_buckets=8,
                             sort_cols="doc_id")
        write_bucketed_table(scores, "b_scores", "doc_id", num_buckets=8,
                             sort_cols="doc_id")
        a = spark.table("b_docs")
        b = spark.table("b_scores")
        joined = a.join(b, "doc_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000

        agg = a.groupBy("doc_id").agg(F.sum("feat").alias("s"))
        plan2 = agg._sc._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan2, plan2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_scores")


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """partition_by writes hive-style dirs and an equality filter on the
    partition column reaches the scan as partition pruning (the
    cc-index crawl=/subset= layout)."""
    from pyspark.sql import functions as F

    from cc_pyspark_spark.sources.tables import write_table

    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang"), (F.col("id") % 4).cast("string")).alias("lang"),
        (F.col("id") * 3).alias("payload"),
    )
    out = str(tmp_path / "parts")
    write_table(docs, out, partition_by="lang")
    import os

    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) == [
        f"lang=lang{i}" for i in range(4)
    ]
    back = spark.read.parquet(out).filter(F.col("lang") == "lang2")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters:" in l]
    assert pf_lines, plan
    assert any("lang" in l and "lang2" in l for l in pf_lines), pf_lines
    assert back.count() == 750
