#!/usr/bin/env python
"""One-off 10x-scale probe for the r10 operators.

Claims under test (SCALING.md r10 sections):

  * classifier_train_sparse_frame — per GD round ONE O(nnz) gradient
    exchange with D+1 keys; cost near-linear in corpus (nnz) with the
    fixed per-round floor.
  * domain_cap_frame — WindowGroupLimit keeps K rows per domain
    map-side; cost = scan, near-linear.
  * dedup_url_canonical path (canonicalize + group) — pure codegen +
    one exchange; near-linear.
  * hits_fixed — two O(V) score exchanges per round against the cached
    edge frame; near-linear in edges.

Same harness as classifier_scale_probe.py: salted unions of the sf0.1
tables (fresh ids), warm-up at 1x, median of 3.

Usage: python scripts/r10_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cc_pyspark_spark.caching import release_caches  # noqa: E402
from cc_pyspark_spark.functions.url import canonicalize_url  # noqa: E402
from cc_pyspark_spark.operators.pagerank import hits_fixed  # noqa: E402
from cc_pyspark_spark.plans.curation import domain_cap_frame  # noqa: E402
from cc_pyspark_spark.plans.dedup import _messy_url  # noqa: E402
from cc_pyspark_spark.plans.text import (  # noqa: E402
    classifier_train_sparse_frame,
)
from cc_pyspark_spark.session import build_session  # noqa: E402

SCALES = (1, 2, 10)


def scaled(base, factor: int, idcol: str):
    out = base
    for i in range(1, factor):
        out = out.unionAll(
            base.withColumn(idcol, F.col(idcol) + F.lit(i * 10_000_000))
        )
    return out


def timed(fn, runs: int = 2) -> float:
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
        app_name="r10-scale-probe", master="local[32]",
        shuffle_partitions=32,
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    edges0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .select((2 * F.col("c")).alias("s"), (2 * F.col("s") + 1).alias("t"))
    )

    def url_dedup(d):
        return (
            d.select("doc_id", _messy_url().alias("url"))
            .select("doc_id", canonicalize_url("url").alias("canon_url"))
            .groupBy("canon_url")
            .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
        )

    doc_ops = {
        "train_sparse": lambda d: classifier_train_sparse_frame(spark, d),
        "domain_cap": lambda d: domain_cap_frame(d, 15),
        "url_canonical": url_dedup,
    }
    for op in doc_ops.values():  # warm-up at 1x
        op(docs0).write.format("noop").mode("overwrite").save()
        release_caches()
    hits_fixed(edges0).write.format("noop").mode("overwrite").save()
    release_caches()

    result: dict[str, dict[str, float]] = {}
    for factor in SCALES:
        docs = scaled(docs0, factor, "doc_id").persist()
        docs.count()
        row = {
            name: timed(lambda op=op: op(docs)) for name, op in doc_ops.items()
        }
        docs.unpersist(blocking=True)
        edges = scaled(edges0, factor, "s").persist()
        edges.count()
        row["hits"] = timed(lambda: hits_fixed(edges))
        edges.unpersist(blocking=True)
        result[f"{factor}x"] = row
    print(json.dumps({"sf_dir": sf_dir, "scales": result}))


if __name__ == "__main__":
    main()
