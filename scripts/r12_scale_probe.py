#!/usr/bin/env python
"""r12 scale probes (VERDICT r11 asks #3/#4/#5):

* the four "artifact-quad" pair-family queries whose r11 sf1 ratios
  were generator artifacts (verbatim replicas => quadratic pair
  growth) — re-measured against the SALTED scaled directories
  (gen_scaled_sf.py now perturbs replica content deterministically,
  so cross-replica near-dups vanish and the ratio measures the PLAN);
* first 10x rows for pagerank_converged / hits_converged (bench-only
  EXTRA_OPS builders — no registered query) and the two new r12
  gates, curation_pipeline_full and dedup_minhash_capped.

Runs REGISTERED queries (or bench.EXTRA_OPS builders) end-to-end, so
the measured plan is exactly the benched plan. Timing mirrors
bench.py: eager-construction queries time construction + execution;
median of 2, one warm-up at 1x per query.

Usage: python scripts/r12_scale_probe.py [base_sf_dir] [name ...]
  (expects SALTED .scale/sf0.2 and .scale/sf1 — regenerate with
   scripts/gen_scaled_sf.py, which salts by default since r12)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from bench import EAGER_CONSTRUCTION, EXTRA_OPS  # noqa: E402
from cc_pyspark_spark.caching import release_caches  # noqa: E402
from cc_pyspark_spark.plans import QUERIES  # noqa: E402
from cc_pyspark_spark.session import build_session  # noqa: E402

TARGETS = (
    # artifact quad (ask #3) — salted re-reads
    "dedup_prefix_jaccard",
    "sim_sparse_tfidf_topk",
    "dedup_minhash_scale",
    "dedup_embedding_scale_wide",
    # first probe rows (asks #4/#5 + the new cap)
    "pagerank_converged",
    "hits_converged",
    "curation_pipeline_full",
    "dedup_minhash_capped",
)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = tuple(sys.argv[2:]) or TARGETS
    dirs = {"1x": base, "2x": ".scale/sf0.2", "10x": ".scale/sf1"}

    def one(name: str, sf_dir: str, runs: int = 2) -> float:
        """Each (query, scale) gets a FRESH SparkSession. The r11-style
        shared-session probe wedged non-deterministically once the
        converged wrappers' checkpoint blocks + released caches
        accumulated: a later query's object-hash aggregate would fall
        back to sort-based aggregation inside an AQE-coalesced
        single partition and spill-loop for CPU-hours (observed twice,
        jstack-verified, same queries instant in a fresh session).
        Session isolation trades ~10 s startup per cell for
        reproducible, state-free measurements — and one warm-up run
        inside the session keeps JIT/codegen out of the sample."""
        spark = build_session(
            app_name=f"r12-scale-probe-{name}",
            master="local[32]",
            shuffle_partitions=32,
        )
        try:
            builder = EXTRA_OPS.get(name) or QUERIES[name].spark
            samples = []
            for _ in range(runs + 1):  # first iteration = in-session warm-up
                if name in EAGER_CONSTRUCTION:
                    t0 = time.perf_counter()
                    df = builder(spark, sf_dir)
                else:
                    df = builder(spark, sf_dir)
                    t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
                release_caches()
            return round(statistics.median(samples[1:]), 3)
        finally:
            spark.stop()

    result: dict[str, dict[str, float]] = {}
    for scale, d in dirs.items():
        result[scale] = {}
        for name in targets:
            result[scale][name] = one(name, d)
            print(json.dumps({scale: {name: result[scale][name]}}), flush=True)
    print(json.dumps({"base": base, "scales": result}))


if __name__ == "__main__":
    main()
