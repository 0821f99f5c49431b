#!/usr/bin/env python
"""Dump explain("formatted") for the r15 optimization-round queries.

Usage: python scripts/r15_dump_plans.py <suffix> [name ...]

Writes plans/r15/<query>_<suffix>.txt for every named query (default:
the r15 optimization candidate set). Iterative queries execute their
checkpointed loops at construction, so dumping them is not free — the
recorded top-level plan is the post-checkpoint tail, which is exactly
what the bench times after construction; the OPTIMIZATION_r15.md
narrative carries the per-round operator shapes separately.

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
    "graph_cc_alternating", "graph_cc_converged", "dedup_cluster_canonical",
    "dedup_cluster_histogram", "curation_soft_dedup", "curation_pipeline_full",
    "curation_pipeline_e2e", "graph_pagerank", "wat_host_pagerank",
    "graph_label_propagation", "graph_lpa_converged", "graph_modularity",
    "graph_hits", "graph_kcore", "graph_kcore_converged",
    "graph_triangle_stats", "graph_link_prediction", "text_kneser_ney_bigram",
    "curation_dsir_importance", "text_bpe_train",
    "text_classifier_train_sparse", "agg_theta_sketch_intersect",
    "sim_bitext_mine", "dedup_lsh_recall_eval", "dedup_prefix_jaccard",
    "graph_degree_assortativity", "wat_links_host_graph",
]


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="r15-dump-plans", shuffle_partitions=32)
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
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
