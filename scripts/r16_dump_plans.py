#!/usr/bin/env python
"""Dump explain("formatted") for the r16 optimization-round queries.

Usage: python scripts/r16_dump_plans.py <suffix> [name ...]

Writes plans/r16/<query>_<suffix>.txt for every named query (default:
the r16 optimization candidate set). Iterative queries execute their
checkpointed loops at construction, so dumping them is not free — the
recorded top-level plan is the post-checkpoint tail, which is exactly
what the bench times after construction; loop-internal round shapes
are narrated in OPTIMIZATION_r16.md. graph_pagerank's tail carries
rounds 5-8 (after the cadence-4 checkpoint), so per-round Exchange
shapes ARE visible there.

Runs at the bench SF (sf0.1) with the bench shuffle-partition count so
plan claims are comparable with bench claims.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cc_pyspark_spark.caching import release_caches  # noqa: E402
from cc_pyspark_spark.plans import QUERIES  # noqa: E402
from cc_pyspark_spark.session import build_session  # noqa: E402

DEFAULT = [
    "graph_pagerank", "wat_host_pagerank", "graph_lpa_converged",
    "graph_modularity", "graph_cc_alternating", "graph_cc_converged",
    "curation_soft_dedup", "dedup_cluster_histogram",
    "curation_pipeline_full", "graph_kcore", "graph_kcore_converged",
    "sim_mmr_rerank", "text_bpe_train", "text_classifier_train_sparse",
    "dedup_prefix_jaccard", "graph_label_propagation",
]


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="r16-dump-plans", shuffle_partitions=32)
    from bench import EXTRA_OPS  # noqa: PLC0415

    for name in names:
        builder = EXTRA_OPS.get(name) or QUERIES[name].spark
        df = builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
        release_caches()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
