#!/usr/bin/env python
"""One-off 10x-scale probe for the classifier trainer/serving tier.

Claims under test (SCALING.md "Classifier training at scale"):

  * classifier_train_frame — per GD round: one scan of the cached
    featurized frame + a 65-key gradient exchange; cost should be
    rounds x scan, i.e. near-linear in corpus size with a large
    constant floor from the fixed per-round stages.
  * classifier_score_frame — stateless broadcast-model map; should be
    flat-to-linear at scan throughput.

Same harness as late_r9_scale_probe.py: salted unions of the sf0.1
documents table (fresh doc_ids), warm-up at 1x, median of 3.

Usage: python scripts/classifier_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cc_pyspark_spark.caching import release_caches  # noqa: E402
from cc_pyspark_spark.plans.text import (  # noqa: E402
    classifier_score_frame,
    classifier_train_frame,
)
from cc_pyspark_spark.session import build_session  # noqa: E402

SCALES = (1, 2, 5, 10)


def scaled_docs(base, factor: int):
    out = base
    for i in range(1, factor):
        out = out.unionAll(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    return out


def timed(fn, runs: int = 3) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        release_caches()
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(
        app_name="classifier-scale-probe", master="local[32]",
        shuffle_partitions=32,
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = classifier_train_frame(spark, base).localCheckpoint(eager=True)
    release_caches()
    ops = {
        "train": lambda d: classifier_train_frame(spark, d),
        "score": lambda d: classifier_score_frame(d, model),
    }
    for op in ops.values():  # warm-up at 1x
        op(base).write.format("noop").mode("overwrite").save()
        release_caches()
    result: dict[str, dict[str, float]] = {}
    for factor in SCALES:
        # persist (NOT localCheckpoint: unpersist() is a no-op on
        # checkpoint blocks, so the 1x+2x+5x+10x corpora would pile up
        # in the block store and the later rows would time under
        # growing memory pressure)
        docs = scaled_docs(base, factor).persist()
        docs.count()  # materialize before timing
        result[f"{factor}x"] = {
            name: timed(lambda op=op: op(docs)) for name, op in ops.items()
        }
        docs.unpersist(blocking=True)
    print(json.dumps({"sf_dir": sf_dir, "scales": result}))


if __name__ == "__main__":
    main()
