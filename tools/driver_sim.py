#!/usr/bin/env python
"""Simulate the round driver: vanilla SparkSession, sf0.01, every
`queries()` entry vs its `oracle_sql()` DuckDB result, canonical compare.

Usage: python tools/driver_sim.py [sf_dir] [name ...]
With names, only those queries run (plus `window` = the first 50 =
the driver's cap, mirroring the real gate).  Prints one line per query
(MATCH / rows-only / MISMATCH) and a summary; exit code 1 on any
mismatch or error.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from tests.oracle_compare import assert_frames_match  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )
    n = e.entry(spark).count()
    print(f"entry(): {n} rows OK")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    queries = e.queries()
    oracles = e.oracle_sql()
    if len(sys.argv) > 2:
        want = set(sys.argv[2:])
        names = list(queries)
        keep = set(names[:50]) if "window" in want else set()
        keep |= want & set(names)
        queries = {n: q for n, q in queries.items() if n in keep}
    bad, empty = [], []
    for name, fn in queries.items():
        try:
            spdf = fn(spark, sf).toPandas()
            if name not in oracles:
                print(f"{name}: rows-only ({len(spdf)} rows)")
                if len(spdf) == 0:
                    empty.append(name)
                continue
            ddf = con.sql(oracles[name]).df()
            assert_frames_match(spdf, ddf, name)
            flag = " (EMPTY)" if len(spdf) == 0 else ""
            print(f"{name}: MATCH ({len(spdf)} rows){flag}")
            if len(spdf) == 0:
                empty.append(name)
        except Exception as ex:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: MISMATCH/ERROR: {ex}")
            traceback.print_exc(limit=3)
    print(
        f"\nsummary: {len(queries)} queries, {len(bad)} bad, "
        f"{len(empty)} empty, oracled={len(oracles)}"
    )
    if bad:
        print("BAD:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
