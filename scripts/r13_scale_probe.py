#!/usr/bin/env python
"""r13 scale probes (VERDICT r12 asks #5/#6):

* first 10x row for curation_dsir_importance's r12 reformulation —
  the exact-median gate now rides the W2 range-shuffle rank selection
  instead of a single-group percentile(); the r12 8-cell probe
  predates that change, so the flat-to-linear shape claim has no
  measurement yet;
* first 10x row for dedup_minhash_scale_capped (new r13 registration:
  the deployed geometry under the production salt@64 cap) — the claim
  its bench row watches is that the cap premium is FIXED overhead,
  so its 10x ratio should track dedup_minhash_scale's;
* n_runs = 3 minimum (ask #6: "median of 2" is a midpoint, not a
  median) — every cell records its sample count.

Per-cell session isolation and eager-construction timing semantics
are inherited verbatim from scripts/r12_scale_probe.py (see its
docstring for the shared-session wedge post-mortem).

Usage: python scripts/r13_scale_probe.py [base_sf_dir] [name ...]
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
    "curation_dsir_importance",
    "dedup_minhash_scale_capped",
    # ratio reference for the capped row (same geometry, no cap):
    "dedup_minhash_scale",
)

N_RUNS = 3


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = tuple(sys.argv[2:]) or TARGETS
    dirs = {"1x": base, "10x": ".scale/sf1"}

    def one(name: str, sf_dir: str, runs: int = N_RUNS) -> dict:
        spark = build_session(
            app_name=f"r13-scale-probe-{name}",
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
