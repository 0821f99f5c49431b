"""cap_lsh_buckets (r12, VERDICT r11 ask #2): the enforced
max_bucket_size on the LSH pair join — drop and salt semantics, the
bounded-fan-out pin, audit arithmetic, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cc_pyspark_spark.operators.dedup import cap_lsh_buckets, minhash_lsh_pairs

#: bucket (0, 11): 5 docs (hot at cap 3); bucket (1, 22): 2 docs (cool).
_BANDS = [(d, 0, 11) for d in (1, 2, 3, 4, 5)] + [(6, 1, 22), (7, 1, 22)]


def _bands(spark, rows=None):
    return spark.createDataFrame(
        rows or _BANDS, "doc_id long, band int, key long"
    )


def test_drop_removes_hot_buckets_and_audits(spark):
    capped, audit = cap_lsh_buckets(_bands(spark), 3, on_exceed="drop")
    rows = capped.collect()
    # the 5-doc bucket is gone entirely; the cool bucket survives, sub=0
    assert sorted((r["doc_id"], r["sub"]) for r in rows) == [(6, 0), (7, 0)]
    a = audit.collect()[0]
    assert (a["capped_buckets"], a["hot_docs"], a["dropped_pairs_est"]) == (
        1,
        5,
        10,  # 5*4/2 pairs the cap refused to generate
    )


def test_salt_splits_hot_buckets_deterministically(spark):
    capped, audit = cap_lsh_buckets(_bands(spark), 2, on_exceed="salt")
    sub = {
        r["doc_id"]: r["sub"]
        for r in capped.filter(F.col("band") == 0).collect()
    }
    # row_number over doc_id: docs 1..5 -> subs 0,0,1,1,2
    assert sub == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2}
    a = audit.collect()[0]
    # retained within subs: 1 + 1 + 0 = 2 of 10 -> 8 dropped
    assert (a["capped_buckets"], a["hot_docs"], a["dropped_pairs_est"]) == (
        1,
        5,
        8,
    )
    # cool bucket untouched
    cool = capped.filter(F.col("band") == 1).collect()
    assert sorted((r["doc_id"], r["sub"]) for r in cool) == [(6, 0), (7, 0)]


@pytest.mark.parametrize("mode", ["drop", "salt"])
def test_bounded_fanout_pin(spark, mode):
    """THE enforcement pin: after capping, NO (band, key, sub) group —
    the pair join's full equi-key — exceeds max_bucket_size, so the
    join's per-bucket fan-out is bounded by cap*(cap-1)/2 whatever
    the corpus does."""
    # one pathological bucket of 40 docs + assorted small buckets
    rows = [(d, 0, 99) for d in range(40)] + [
        (100 + i, 1, i % 7) for i in range(20)
    ]
    cap = 4
    capped, _ = cap_lsh_buckets(_bands(spark, rows), cap, on_exceed=mode)
    worst = (
        capped.groupBy("band", "key", "sub")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert worst is not None and worst <= cap


def test_salt_invariant_across_partitionings(spark):
    base = _bands(spark)
    a, _ = cap_lsh_buckets(base, 2, on_exceed="salt")
    b, _ = cap_lsh_buckets(base.repartition(7, "doc_id"), 2, on_exceed="salt")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_validation():
    with pytest.raises(ValueError, match="on_exceed"):
        cap_lsh_buckets(None, 3, on_exceed="nuke")
    with pytest.raises(ValueError, match="max_bucket_size"):
        cap_lsh_buckets(None, 1)


def test_minhash_pairs_cap_end_to_end(spark):
    """Through minhash_lsh_pairs: a 6-identical-doc boilerplate
    cluster lands in band buckets of size 6 (> cap 3) and is dropped;
    an independent 2-doc near-dup pair survives unharmed."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(1, 7)]
        + [(10, near_a), (11, near_b)],
        "doc_id long, text string",
    )
    uncapped = {
        (r["a_id"], r["b_id"]) for r in minhash_lsh_pairs(docs).collect()
    }
    # drop mode EXPLICIT since r14: the signature default is the
    # production salt@64 (tests/test_scale_dedup.py pins it), under
    # which within-sub boilerplate pairs would survive by design.
    capped = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(
            docs, max_bucket_size=3, on_exceed="drop"
        ).collect()
    }
    assert capped <= uncapped
    assert (10, 11) in capped  # the small cluster survives
    assert all(a >= 10 for a, _ in capped)  # every boilerplate pair dropped
    assert (1, 2) in uncapped  # ...and they were real pairs before the cap
