"""Streaming per-domain quota gate (applyInPandasWithState): lifetime
caps across micro-batches with deterministic within-batch admission."""

from __future__ import annotations

import shutil

import pytest

from cc_pyspark_spark.streaming.curation import (
    domain_quota_gate,
    stream_documents,
)
from cc_pyspark_spark.streaming.windows import run_available_now
from tests.conftest import SF_DIR

CAP = 7


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs-quota-stream")
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "part-000.parquet")
    return str(d)


def test_quota_gate_single_batch_matches_batch_prefix(spark, docs_dir):
    """One micro-batch: admitted set == the first CAP docs per domain
    by doc_id — the deterministic batch prefix."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    stream = domain_quota_gate(stream_documents(spark, docs_dir), CAP)
    q = run_available_now(stream, "quota_out", "append")
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["source"])
        for r in spark.table("quota_out").collect()
    }
    docs = spark.read.parquet(docs_dir)
    w = W.partitionBy("source").orderBy("doc_id")
    want = {
        (r["doc_id"], r["source"])
        for r in docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= CAP)
        .collect()
    }
    assert got == want
    # ... and the batch-side contract frame (plans/curation.py
    # quota_admission_frame — the admission leg of the registered
    # curation_quota_semantics query) replays the SAME set, tying the
    # driver-gated query to the real applyInPandasWithState gate
    from cc_pyspark_spark.plans.curation import quota_admission_frame

    contract = {
        (r["doc_id"], r["source"])
        for r in quota_admission_frame(docs, CAP).collect()
    }
    assert contract == got
    per = {}
    for _, s in got:
        per[s] = per.get(s, 0) + 1
    assert per and all(n <= CAP for n in per.values())


def test_quota_gate_state_spans_batches(spark, docs_dir, tmp_path):
    """The admitted count persists across micro-batches: batch 1 fills
    part of each domain's quota, batch 2 only gets the remainder."""
    from pyspark.sql import functions as F

    import glob
    import os

    land = str(tmp_path / "landing")
    os.makedirs(land)
    docs = spark.read.parquet(docs_dir)
    b1 = docs.filter(F.col("doc_id") < 100)
    b2 = docs.filter(F.col("doc_id") >= 100)

    def land_batch(df, tag):
        stage = str(tmp_path / f"stage_{tag}")
        df.coalesce(1).write.parquet(stage)
        for i, part in enumerate(glob.glob(f"{stage}/part-*.parquet")):
            shutil.copy(part, f"{land}/{tag}-{i}.parquet")

    land_batch(b1, "b1")

    chk = str(tmp_path / "chk")
    sink = str(tmp_path / "admitted")

    def drain():
        q = (
            domain_quota_gate(stream_documents(spark, land), CAP)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            (r["doc_id"], r["source"])
            for r in spark.read.parquet(sink).collect()
        ]

    rows1 = drain()
    n1: dict[str, int] = {}
    for _, s in rows1:
        n1[s] = n1.get(s, 0) + 1

    land_batch(b2, "b2")
    all_rows = drain()  # same checkpoint: state resumes, b2 drains
    per: dict[str, int] = {}
    for _, s in all_rows:
        per[s] = per.get(s, 0) + 1
    # lifetime cap holds across micro-batches; nothing admitted twice
    assert per and all(n <= CAP for n in per.values())
    assert len(set(all_rows)) == len(all_rows)
    assert len(all_rows) > len(rows1)  # batch 2 really added admissions
    # batch 2 only got what batch 1 left open in each domain
    for s, n in per.items():
        assert n >= n1.get(s, 0)
