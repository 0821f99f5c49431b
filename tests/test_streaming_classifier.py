"""Streaming quality-classifier gate must equal its batch twin exactly.

The gate is stateless (broadcast trained-model row + map-side fold),
so parity is structural — the pin is that the higher-order-function
fold actually RUNS inside a Structured Streaming plan with a
stream-static broadcast join, and that drop mode removes exactly the
batch-negative rows across micro-batches.
"""

from __future__ import annotations

import shutil

import pytest

from cc_pyspark_spark.plans.text import (
    classifier_score_frame,
    text_classifier_train,
)
from cc_pyspark_spark.streaming.curation import (
    classifier_gate_stream,
    stream_documents,
)
from cc_pyspark_spark.streaming.windows import run_available_now
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs-cls-stream")
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "part-000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def model_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cls-model") / "model")
    text_classifier_train(spark, SF_DIR).write.parquet(d)
    return d


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_gate_matches_batch(spark, docs_dir, model_dir):
    model = spark.read.parquet(model_dir)
    stream = classifier_gate_stream(stream_documents(spark, docs_dir), model)
    q = run_available_now(stream, "cls_clean", "append")
    q.awaitTermination(120)
    got = spark.table("cls_clean")
    batch = classifier_gate_stream(spark.read.parquet(docs_dir), model)
    cols = sorted(batch.columns)
    assert sorted(got.columns) == cols
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
    # the trained gate must actually reject something on this fixture
    n_all = spark.read.parquet(docs_dir).count()
    assert 0 < got.count() < n_all


def test_streaming_annotate_matches_batch(spark, docs_dir, model_dir):
    model = spark.read.parquet(model_dir)
    stream = classifier_gate_stream(
        stream_documents(spark, docs_dir), model, drop_negative=False
    )
    q = run_available_now(stream, "cls_ann", "append")
    q.awaitTermination(120)
    got = spark.table("cls_ann")
    batch = classifier_score_frame(
        spark.read.parquet(docs_dir), model
    )
    cols = sorted(batch.columns)
    assert sorted(got.columns) == cols
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
    # both predicted classes are present in the annotation
    preds = {r["pred"] for r in got.select("pred").distinct().collect()}
    assert preds == {True, False}
