#!/usr/bin/env python
"""Materialize a scaled copy of a testdata SF directory.

Replicates every table ``factor`` times with per-replica key shifts
(fresh ids, join-consistent across tables: replica i shifts every
surrogate key by i * 10_000_000, the scripts/*_scale_probe.py
convention), writing real parquet so the registered queries run
UNMODIFIED against the scaled directory via their normal Catalog scans
— this is what lets one harness probe any query at 2x/10x and lets
bench.py run the whole headliner suite at sf1 (SCALING.md, VERDICT r10
asks #5/#6).

Known probe artifacts (documented, deliberate):
  * string columns (text, source, lang, event_type) replicate
    verbatim, so content-keyed group sizes grow by the factor and
    NEAR-DUP PAIR counts in the dedup families grow ~quadratically
    within unchanged LSH buckets — read those rows as upper bounds,
    not linear-scaling claims.
  * dims (region, nation) copy unscaled, like TPC-H's fixed dims.

Usage: python scripts/gen_scaled_sf.py <base_sf_dir> <out_dir> <factor>
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from cc_pyspark_spark.catalog import TABLES, load_table  # noqa: E402
from cc_pyspark_spark.session import build_session  # noqa: E402

#: Per-replica shift applied to every surrogate key (big enough that
#: replicas never collide at any base SF the driver generates).
KEY_SHIFT = 10_000_000

#: Key columns to shift per table (join-consistency: a key shifted in
#: one table is shifted identically everywhere it appears).
SHIFT_COLS: dict[str, tuple[str, ...]] = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def scaled_table(base, factor: int, keys: tuple[str, ...]):
    if not keys or factor <= 1:
        return base
    out = base
    for i in range(1, factor):
        rep = base
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.lit(i * KEY_SHIFT))
        out = out.unionAll(rep)
    return out


def main() -> None:
    base_dir, out_dir, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = build_session(
        app_name="gen-scaled-sf", master="local[32]", shuffle_partitions=32
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        df = load_table(spark, base_dir, name)
        scaled_table(df, factor, SHIFT_COLS[name]).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: written x{factor}")
    spark.stop()


if __name__ == "__main__":
    main()
