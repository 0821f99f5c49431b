#!/usr/bin/env python
"""Generate the simhash oracle fixture: {md5(text): simhash}.

`simhash_signatures` derives bit votes from Spark's xxhash64, which
DuckDB cannot replay — so its oracle is a committed fixture produced by
this script (one run of the deployment pipeline itself at sf0.001 and
sf0.01). That makes the driver row a *determinism pin* (the pipeline
must reproduce its committed output bit-for-bit across rounds and
machines), not an independent recomputation; the independent
correctness evidence for simhash stays in tests/test_scale_dedup.py.
Re-run after a driver testdata regeneration.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = os.path.join(
    os.path.dirname(__file__), "..", "cc_pyspark_spark", "plans",
    "simhash_fixture.json",
)


def main() -> None:
    from pyspark.sql import SparkSession

    from cc_pyspark_spark.catalog import Catalog
    from cc_pyspark_spark.operators.dedup import simhash_signatures

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    fixture: dict[str, int] = {}
    for sf in SF_DIRS:
        docs = Catalog(spark, sf).documents
        sigs = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs).collect()
        }
        for r in docs.select("doc_id", "text").collect():
            h = hashlib.md5(r["text"].encode("utf-8")).hexdigest()
            sig = sigs[r["doc_id"]]
            assert fixture.get(h, sig) == sig, "same text, different simhash?"
            fixture[h] = sig
    with open(OUT, "w") as f:
        json.dump(fixture, f, sort_keys=True)
    print(f"wrote {OUT}: {len(fixture)} texts")
    spark.stop()


if __name__ == "__main__":
    main()
