#!/usr/bin/env python
"""One-off 10x-scale probe for the late-r9 operators.

The late-r9 bench rows run on sf0.1 (~5k documents); this script gives
the linearity claims a second data point at 2x/5x/10x the corpus
WITHOUT an sf1 testdata drop: it unions salted copies of the sf0.1
documents table (fresh doc_ids, identical text — realistic for a
dedup-bearing corpus) and times, per scale:

  * blocklist_hits_frame — claim: map-only, linear in corpus bytes
  * kmv theta pairs      — claim: one distinct + windowed bottom-k;
                           the pairwise stage is constant (20 sets)
  * priority_sample      — claim: map-only priorities + a
                           TakeOrderedAndProject head; near-linear

Each op runs once untimed (JIT/codegen warm-up at 1x), then the
median of 3 timed runs per scale is printed as one JSON line for
SCALING.md. Deterministic end to end — no RNG anywhere.

Usage: python scripts/late_r9_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cc_pyspark_spark.caching import release_caches  # noqa: E402
from cc_pyspark_spark.plans.curation import priority_sample_frame  # noqa: E402
from cc_pyspark_spark.plans.sketches import theta_sketch_pairs_frame  # noqa: E402
from cc_pyspark_spark.plans.text import blocklist_hits_frame  # noqa: E402
from cc_pyspark_spark.session import build_session  # noqa: E402

SCALES = (1, 2, 5, 10)


def scaled_docs(base, factor: int):
    out = base
    for i in range(1, factor):
        out = out.unionAll(
            base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            )
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
        app_name="late-r9-scale-probe", master="local[32]",
        shuffle_partitions=32,
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ops = {
        "blocklist": lambda d: blocklist_hits_frame(d),
        "theta_pairs": lambda d: theta_sketch_pairs_frame(d),
        "priority_sample": lambda d: priority_sample_frame(d),
    }
    # warm-up at 1x
    for op in ops.values():
        op(base).write.format("noop").mode("overwrite").save()
        release_caches()
    result: dict[str, dict[str, float]] = {}
    for factor in SCALES:
        # persist (not localCheckpoint): unpersist() actually releases
        # persist()-ed blocks, so scales don't pile 18x corpus into the
        # block manager and skew the very timings this probe measures.
        docs = scaled_docs(base, factor).persist()
        n = docs.count()
        row: dict[str, float] = {"n_docs": n}
        for name, op in ops.items():
            row[name] = timed(lambda op=op: op(docs))
        result[f"{factor}x"] = row
        docs.unpersist()
    print(json.dumps({"sf_dir": sf_dir, "scales": result}))
    spark.stop()


if __name__ == "__main__":
    main()
