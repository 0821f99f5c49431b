#!/usr/bin/env python
"""r14 scale probes (VERDICT r13 asks #2/#3 follow-through):

The r14 change made the salt@64 bucket cap the operator-signature
DEFAULT and re-pointed dedup_lsh_recall_eval at the capped geometry,
so several long-standing rows now run a capped band join they didn't
run in r13. The sf1 suite (RUNS=1) showed them all improving or flat
at 10x; this probe re-measures the load-bearing ones median-of-3,
session-isolated, so the "cap premium is fixed keyed-window overhead,
not SF-growing" claim rests on medians rather than single samples:

* dedup_lsh_recall_eval — the re-pointed S-curve eval (heaviest
  changed row at sf1);
* curation_soft_dedup, graph_cc_alternating — newly capped via the
  flipped default;
* dedup_minhash_scale (explicit uncapped reference) vs
  dedup_minhash_scale_capped — the premium pair, both scales.

Per-cell session isolation and eager-construction timing semantics
are inherited verbatim from scripts/r12_scale_probe.py (see its
docstring for the shared-session wedge post-mortem).

Usage: python scripts/r14_scale_probe.py [base_sf_dir] [name ...]
  (expects the SALTED .scale/sf1 from scripts/gen_scaled_sf.py)
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
    "dedup_lsh_recall_eval",
    "curation_soft_dedup",
    "graph_cc_alternating",
    "dedup_minhash_scale",
    "dedup_minhash_scale_capped",
)

N_RUNS = 3


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = tuple(sys.argv[2:]) or TARGETS
    dirs = {"1x": base, "10x": ".scale/sf1"}

    def one(name: str, sf_dir: str, runs: int = N_RUNS) -> dict:
        spark = build_session(
            app_name=f"r14-scale-probe-{name}",
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
            timed = samples[1:]
            return {
                "median": round(statistics.median(timed), 3),
                "n_runs": len(timed),
                "samples": [round(s, 3) for s in timed],
            }
        finally:
            spark.stop()

    result: dict[str, dict[str, dict]] = {}
    for scale, d in dirs.items():
        result[scale] = {}
        for name in targets:
            result[scale][name] = one(name, d)
            print(json.dumps({scale: {name: result[scale][name]}}), flush=True)
    print(json.dumps({"base": base, "scales": result}))


if __name__ == "__main__":
    main()
