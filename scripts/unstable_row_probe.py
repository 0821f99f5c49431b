#!/usr/bin/env python
"""Session-isolated probe gate for the named unstable iterative rows
(r15, VERDICT r14 ask #3).

`graph_label_propagation` read 4.21 / 2.85 / 5.09 / 17.9 s across
four same-code r14 records; `pagerank_converged` and
`graph_cc_converged` carry spread_notes in multiple records on
unchanged code. Their IN-SUITE medians are host samples, not code
signal — each query runs ~90 queries deep in a shared JVM whose
ambient GC/contention state dominates a 3-5 s iterative plan. The
cross-round gate for these rows is therefore THIS probe: one fresh
SparkSession per row (the r12_scale_probe session-isolation
discipline), median of 3 timed runs after an untimed warm-up,
committed as r{N}_probe.json under "unstable_rows".
scripts/compare_bench.py exempts these rows from its mover list and
points readers here.

Usage: python scripts/unstable_row_probe.py [sf_dir] [--out FILE] [name ...]
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
    "graph_label_propagation",
    "pagerank_converged",
    "graph_cc_converged",
)

N_RUNS = 3


def one(name: str, sf_dir: str, runs: int = N_RUNS) -> dict:
    spark = build_session(
        app_name=f"unstable-row-probe-{name}",
        master="local[32]",
        shuffle_partitions=32,
    )
    try:
        builder = EXTRA_OPS.get(name) or QUERIES[name].spark
        samples = []
        # NO release_caches() between runs: the bench's within-row
        # semantics (bench.py EAGER_CONSTRUCTION comment) keep the
        # operator's checkpoint/cache blocks warm across a row's runs
        # — sweeping between runs doubles iterative rows (the r13
        # 8.0 -> 15.4 s A/B) and is exactly what a first cut of this
        # probe reproduced (LPA 13.8 s probed vs ~4 s in-suite).
        # One sweep after the row, before the session dies anyway.
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


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out = "r15_probe.json"
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out = argv[i + 1]
            i += 2
        elif argv[i].startswith("/") or argv[i].startswith("."):
            sf_dir = argv[i]
            i += 1
        else:
            names.append(argv[i])
            i += 1
    names = names or list(TARGETS)

    results = {}
    for name in names:
        results[name] = one(name, sf_dir)
        print(name, results[name])

    # Merge with an existing record (the r*_probe.json files also hold
    # scale-probe cells under other keys); never clobber sibling keys.
    try:
        with open(out) as f:
            record = json.load(f)
    except FileNotFoundError:
        record = {}
    record.setdefault("base", sf_dir)
    record.setdefault("unstable_rows", {}).update(results)
    with open(out, "w") as f:
        json.dump(record, f)
    print(f"-> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
