"""Deployment-path (scale-variant) registry entries — rows-only checks.

The oracle twins in plans/dedup.py derive shingle/token IDs from a
`row_number` global sort purely so DuckDB can replay them bit-for-bit;
that sort is the one plan fragment you would never run at 100 TB. These
entries wrap the operators/ deployment variants (xxhash64 IDs, no global
sort, no all-pairs join) so the BENCHMARK measures the plan you would
actually deploy, while the oracle variants keep carrying the hard
correctness signal.

No DuckDB oracle is possible (xxhash64 is Spark-specific), so these are
rows-only entries; their correctness evidence is tests/test_scale_dedup.py,
which pins precision == exact Jaccard and >=80% recall of planted
near-dups against the oracled baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.operators.dedup import minhash_lsh_pairs, simhash_signatures
from cc_pyspark_spark.plans.registry import register


@register(
    "dedup_minhash_scale",
    oracle=None,  # xxhash64 IDs — verified against the exact baseline in pytest
    description="Deployment MinHash+LSH near-dup pairs: xxhash64 shingle IDs "
    "(no global sort), band-bucketed candidates, exact-Jaccard verification "
    "— the plan actually run at 100 TB",
    tags=("dedup", "bench", "scale"),
)
def dedup_minhash_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return minhash_lsh_pairs(t.documents, threshold=0.5)


@register(
    "dedup_simhash_scale",
    oracle=None,  # xxhash64 token hashes — structure pinned in pytest
    description="Deployment SimHash signatures: xxhash64 token hashes, one "
    "explode + one doc_id groupBy, no ID-assignment join or global sort",
    tags=("dedup", "bench", "scale"),
)
def dedup_simhash_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    return simhash_signatures(t.documents)


@register(
    "window_distributed_ids",
    oracle="""
SELECT c_custkey, CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS id
FROM customer
""",
    description="W2 scale path: dense sequential IDs via range-partition "
    "offsets + parallel per-partition row_number — bit-identical to the "
    "global-window variant (unique order key), no single-partition sort",
    tags=("window", "scale"),
)
def window_distributed_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.ids import assign_sequential_ids

    t = Catalog(spark, sf_dir)
    return assign_sequential_ids(
        t.customer.select("c_custkey"), "c_custkey", num_partitions=8
    )
