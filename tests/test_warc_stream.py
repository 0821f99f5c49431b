"""Incremental WARC ingestion: only newly published manifests are parsed."""

from __future__ import annotations

import os

import pytest

from cc_pyspark_spark.sources.fixtures import generate_warc_corpus
from cc_pyspark_spark.streaming.warc_stream import stream_warc_records


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("stream-corpus")
    return generate_warc_corpus(str(out))


def _drain_to_parquet(spark, manifest_dir, ckpt, out_dir):
    stream = stream_warc_records(spark, manifest_dir, record_types={"response"})
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_incremental_manifest_processing(spark, corpus, tmp_path):
    mdir = tmp_path / "manifests"
    mdir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "records")

    warcs = [f for f in corpus["files"] if f.endswith(".warc.gz")
             and "robotstxt" not in f]
    (mdir / "m1.txt").write_text("\n".join(warcs[:2]) + "\n")
    _drain_to_parquet(spark, str(mdir), ckpt, out)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 > 0
    assert set(
        r[0] for r in first.select("warc_filename").distinct().collect()
    ) == set(warcs[:2])

    # publish a second manifest → only its files are newly processed
    (mdir / "m2.txt").write_text("\n".join(warcs[2:]) + "\n")
    _drain_to_parquet(spark, str(mdir), ckpt, out)
    both = spark.read.parquet(out)
    assert set(
        r[0] for r in both.select("warc_filename").distinct().collect()
    ) == set(warcs)
    # no duplicates: file count equals per-file record sums exactly
    per_file = dict(both.groupBy("warc_filename").count().collect())
    assert all(v > 0 for v in per_file.values())
    assert both.count() == both.dropDuplicates(
        ["warc_filename", "warc_record_offset"]
    ).count()
