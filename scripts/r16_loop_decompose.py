#!/usr/bin/env python
"""r16 measurement aid: per-action timing decomposition of an
iterative bench row (guide §1 — find where the loop seconds go before
changing anything).

Monkeypatches the DataFrame action entry points the loop operators use
(localCheckpoint, count, collect) to log wall time per call, then runs
one warm-up + one timed construction+execution of a named bench row.

Usage: python scripts/r16_loop_decompose.py <query> [n_warm]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from cc_pyspark_spark.caching import release_caches  # noqa: E402
from cc_pyspark_spark.plans import QUERIES  # noqa: E402
from cc_pyspark_spark.session import build_session  # noqa: E402

LOG: list[tuple[str, float]] = []
ENABLED = False


def _wrap(name, fn):
    def inner(self, *a, **kw):
        t0 = time.perf_counter()
        out = fn(self, *a, **kw)
        dt = time.perf_counter() - t0
        if ENABLED:
            LOG.append((f"{name}{a or ''}", dt))
        return out

    return inner


def main() -> int:
    global ENABLED
    name = sys.argv[1]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="r16-decompose", shuffle_partitions=32)
    from bench import EXTRA_OPS  # noqa: PLC0415

    builder = EXTRA_OPS.get(name) or QUERIES[name].spark
    for fname in ("localCheckpoint", "count", "collect"):
        setattr(DataFrame, fname, _wrap(fname, getattr(DataFrame, fname)))

    for i in range(n_warm):
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(
            f"warm {i}: construct {t1 - t0:.3f}s "
            f"exec {time.perf_counter() - t1:.3f}s"
        )
    ENABLED = True
    t0 = time.perf_counter()
    df = builder(spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    print(f"timed: construct {t1 - t0:.3f}s exec {t2 - t1:.3f}s")
    tot = 0.0
    for i, (what, dt) in enumerate(LOG):
        tot += dt
        print(f"  [{i:02d}] {dt:7.3f}s  {what}")
    print(f"actions total {tot:.3f}s of {t2 - t0:.3f}s")
    release_caches()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
