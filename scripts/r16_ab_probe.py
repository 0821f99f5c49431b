#!/usr/bin/env python
"""Interleaved same-session A/B probe (r16): toggles an env knob
between timed runs of the SAME query inside ONE session, so both arms
see the same ambient host state — the sandwich discipline taken to
per-run granularity. Use for knobs read at loop_shuffle call time
(SPARK_GRAFT_LOOP_AQE, SPARK_GRAFT_LOOP_TARGET_BYTES).

Usage:
  python scripts/r16_ab_probe.py KEY A_VALUE B_VALUE query [query ...]
      [--runs N]

Arm A runs with os.environ[KEY]=A_VALUE, arm B with B_VALUE; runs
alternate ABAB.. after one untimed warm-up per query (arm A). Prints
per-arm medians and the B/A ratio.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cc_pyspark_spark.caching import release_caches  # noqa: E402
from cc_pyspark_spark.plans import QUERIES  # noqa: E402
from cc_pyspark_spark.session import build_session  # noqa: E402


def main() -> int:
    key, a_val, b_val = sys.argv[1], sys.argv[2], sys.argv[3]
    names = [a for a in sys.argv[4:] if not a.startswith("--")]
    n_runs = 4
    if "--runs" in sys.argv:
        n_runs = int(sys.argv[sys.argv.index("--runs") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="r16-ab-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from bench import EAGER_CONSTRUCTION, EXTRA_OPS, _sweep_persistent_state  # noqa: E402,PLC0415

    def one_run(name: str) -> float:
        builder = EXTRA_OPS.get(name) or QUERIES[name].spark
        if name in EAGER_CONSTRUCTION:
            start = time.perf_counter()
            df = builder(spark, sf_dir)
        else:
            df = builder(spark, sf_dir)
            start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    for name in names:
        os.environ[key] = a_val
        one_run(name)  # untimed warm-up
        arms: dict[str, list[float]] = {"A": [], "B": []}
        for _ in range(n_runs):
            for arm, val in (("A", a_val), ("B", b_val)):
                os.environ[key] = val
                arms[arm].append(one_run(name))
        ma = statistics.median(arms["A"])
        mb = statistics.median(arms["B"])
        print(
            f"{name:30s} A={ma:7.3f} B={mb:7.3f} B/A={mb / ma:5.2f}  "
            f"a={['%.2f' % s for s in arms['A']]} "
            f"b={['%.2f' % s for s in arms['B']]}",
            flush=True,
        )
        release_caches()
        _sweep_persistent_state(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
