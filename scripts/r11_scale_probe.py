#!/usr/bin/env python
"""10x-scale probe for the r10 heavy queries the r10 probe didn't
cover (VERDICT r10 ask #5): graph_modularity (the most expensive
benched row), text_kneser_ney_bigram, curation_soft_dedup,
sim_bitext_mine, sim_mmr_rerank.

Unlike the earlier frame-level probes, this one runs the REGISTERED
queries end-to-end against materialized scaled SF directories
(scripts/gen_scaled_sf.py output), so the measured plan is exactly
the benched plan. Timing mirrors bench.py: eager-construction
queries time construction + execution; median of 2, one warm-up at
1x per query.

Usage: python scripts/r11_scale_probe.py [base_sf_dir] [name ...]
  (expects .scale/sf0.2 and .scale/sf1 to exist — run
   gen_scaled_sf.py first; extra args override the default TARGETS,
   so the same harness probes any registered query)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from cc_pyspark_spark.caching import release_caches  # noqa: E402
from cc_pyspark_spark.plans import QUERIES  # noqa: E402
from cc_pyspark_spark.session import build_session  # noqa: E402

TARGETS = (
    "graph_modularity",
    "text_kneser_ney_bigram",
    "curation_soft_dedup",
    "sim_bitext_mine",
    "sim_mmr_rerank",
)

#: Same membership as bench.py's eager_construction for these names.
EAGER = {
    "graph_modularity",
    "curation_soft_dedup",
    "sim_bitext_mine",
    "sim_mmr_rerank",
    "graph_lpa_converged",
    "graph_kcore_converged",
    "dedup_cluster_histogram",
}


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = tuple(sys.argv[2:]) or TARGETS
    dirs = {"1x": base, "2x": ".scale/sf0.2", "10x": ".scale/sf1"}
    spark = build_session(
        app_name="r11-scale-probe", master="local[32]", shuffle_partitions=32
    )

    def one(name: str, sf_dir: str, runs: int = 2) -> float:
        samples = []
        for _ in range(runs):
            if name in EAGER:
                t0 = time.perf_counter()
                df = QUERIES[name].spark(spark, sf_dir)
            else:
                df = QUERIES[name].spark(spark, sf_dir)
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            release_caches()
        return round(statistics.median(samples), 3)

    for name in targets:  # warm-up: JIT + codegen at 1x
        one(name, base, runs=1)

    result: dict[str, dict[str, float]] = {}
    for scale, d in dirs.items():
        result[scale] = {name: one(name, d) for name in targets}
        print(json.dumps({scale: result[scale]}), flush=True)
    print(json.dumps({"base": base, "scales": result}))
    spark.stop()


if __name__ == "__main__":
    main()
