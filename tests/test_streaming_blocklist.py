"""Streaming blocklist gate must equal its batch twin exactly.

Stateless gates have structural batch parity (same expression, no
state) — the pin here is that the expression actually RUNS under
Structured Streaming (pandas UDFs inside a streaming plan, schema
inference on the landing dir) and that drop mode removes exactly the
batch-matched rows across micro-batches.
"""

from __future__ import annotations

import shutil

import pytest

from cc_pyspark_spark.plans.text import BLOCKLIST_PHRASES, blocklist_annotate
from cc_pyspark_spark.streaming.curation import (
    blocklist_gate_stream,
    stream_documents,
)
from cc_pyspark_spark.streaming.windows import run_available_now
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs-stream")
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "part-000.parquet")
    return str(d)


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_gate_matches_batch(spark, docs_dir):
    stream = blocklist_gate_stream(
        stream_documents(spark, docs_dir), BLOCKLIST_PHRASES
    )
    q = run_available_now(stream, "blocklist_clean", "append")
    q.awaitTermination(120)
    got = spark.table("blocklist_clean")
    batch = blocklist_gate_stream(
        spark.read.parquet(docs_dir), BLOCKLIST_PHRASES
    )
    cols = sorted(batch.columns)
    assert sorted(got.columns) == cols
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
    # the gate must actually drop something on this fixture
    assert got.count() < spark.read.parquet(docs_dir).count()


def test_streaming_annotate_matches_batch(spark, docs_dir):
    stream = blocklist_gate_stream(
        stream_documents(spark, docs_dir), BLOCKLIST_PHRASES,
        drop_matched=False,
    )
    q = run_available_now(stream, "blocklist_ann", "append")
    q.awaitTermination(120)
    got = spark.table("blocklist_ann")
    batch = blocklist_annotate(
        spark.read.parquet(docs_dir), BLOCKLIST_PHRASES
    )
    cols = sorted(batch.columns)
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
