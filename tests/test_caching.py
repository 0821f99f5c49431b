"""Cache lifecycle: operator-internal persists are tracked and
releasable (ADVICE r8 — long-lived sessions must not accumulate cached
LSH band tables / adjacency blocks until eviction pressure)."""

from __future__ import annotations

from cc_pyspark_spark.caching import (
    release_caches,
    track_cache,
    tracked_count,
    tracked_persist,
)
from cc_pyspark_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_tracked_persist_registers_and_releases(spark):
    release_caches()
    df = tracked_persist(spark.range(100))
    assert tracked_count() == 1
    assert df.count() == 100
    assert df.storageLevel.useMemory or df.storageLevel.useDisk
    n = release_caches()
    assert n == 1 and tracked_count() == 0
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)


def test_track_cache_composes_with_transform(spark):
    release_caches()
    df = spark.range(10).persist().transform(track_cache)
    assert tracked_count() == 1
    assert df.count() == 10
    release_caches()
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)


def test_lsh_operator_caches_are_tracked_and_result_survives_release(spark):
    """minhash-LSH persists its shingle + band frames; after
    release_caches() the returned plan must still evaluate (recompute,
    not dangle) and produce identical rows."""
    release_caches()
    q = QUERIES["dedup_minhash_scale"].spark(spark, SF_DIR)
    assert tracked_count() >= 2, "operator persists should be tracked"
    before = sorted(map(tuple, q.collect()))
    released = release_caches()
    assert released >= 2 and tracked_count() == 0
    after = sorted(map(tuple, q.collect()))
    assert before == after


def test_release_caches_is_idempotent(spark):
    release_caches()
    assert release_caches() == 0
