"""Aho-Corasick blocklist matching (functions/acmatch.py, r9).

The automaton is verified against an independent naive per-pattern
substring scan — the same independence the DuckDB oracle of
text_blocklist_phrases provides at the query level.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cc_pyspark_spark.functions.acmatch import AhoCorasick, match_phrases
from cc_pyspark_spark.plans import QUERIES
from cc_pyspark_spark.plans.text import BLOCKLIST_PHRASES
from tests.conftest import SF_DIR

VOCAB = (
    "the fast key order sort table scan merge part window small hash "
    "value row batch stream spark dup join line customer query big "
    "vector data column agg group slow filter"
).split()


def test_automaton_matches_naive_scan():
    pats = tuple(
        f" {p} "
        for p in (
            "table scan",
            "hash join",
            "key order sort",
            "dup",
            "window",
            "a",  # single char, prefix of nothing here
            "scan merge part",
        )
    )
    ac = AhoCorasick(pats)
    rng = random.Random(1234)
    for _ in range(3000):
        text = " ".join(rng.choices(VOCAB, k=rng.randint(0, 50)))
        t = f" {text} "
        assert ac.find_distinct(t) == sorted(p for p in pats if p in t)


def test_word_boundaries_and_overlaps():
    pats = tuple(f" {p} " for p in ("scan", "table scan", "scan merge"))
    ac = AhoCorasick(pats)
    # all three fire on one window: overlapping matches must all report
    assert ac.find_distinct(" table scan merge ") == sorted(pats)
    # no boundary -> no match
    assert ac.find_distinct(" rescans tablescan ") == []


def test_match_phrases_column(spark):
    df = spark.createDataFrame(
        [("table scan merge",), ("nothing here",), (None,)], "t string"
    )
    got = [
        r["m"]
        for r in df.select(
            match_phrases("t", ("table scan", "sort merge", "scan merge"))
            .alias("m")
        ).collect()
    ]
    assert got == ["scan merge,table scan", "", None]


def test_blocklist_query_nondegenerate(spark):
    out = QUERIES["text_blocklist_phrases"].spark(spark, SF_DIR)
    agg = out.agg(
        F.sum("n_hits").alias("hits"), F.count("*").alias("docs")
    ).collect()[0]
    assert agg["docs"] == 500
    # the phrase list is chosen to actually fire on the fixture corpus
    assert agg["hits"] > 0
    # n_hits always equals the number of comma-joined phrases
    bad = out.filter(
        F.when(F.col("hits") == "", F.lit(0))
        .otherwise(F.size(F.split("hits", ",")))
        != F.col("n_hits")
    ).count()
    assert bad == 0
