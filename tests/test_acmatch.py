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


def test_annotate_keeps_null_text_rows(spark):
    """NULL text matches nothing: (n_hits=0, hits='') — the ingest
    gate must KEEP such rows (regression: NULL n_hits used to be
    silently dropped by the n_hits == 0 filter)."""
    from cc_pyspark_spark.plans.text import blocklist_annotate
    from cc_pyspark_spark.streaming.curation import blocklist_gate_stream

    df = spark.createDataFrame(
        [(1, "table scan here"), (2, None), (3, "clean words only")],
        "doc_id bigint, text string",
    )
    ann = {r["doc_id"]: r for r in blocklist_annotate(df).collect()}
    assert (ann[2]["n_hits"], ann[2]["hits"]) == (0, "")
    kept = {r["doc_id"] for r in blocklist_gate_stream(df).collect()}
    assert kept == {2, 3}


def test_cli_blocklist_file_is_normalized(tmp_path):
    """Phrase files go through the same tokenizer as the match side —
    'Table Scan' / 'hash-join' must match (regression: raw lines
    silently never matched, failing the gate OPEN)."""
    from cc_pyspark_spark.jobs.runner import main

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "norm")
    bl = tmp_path / "phrases.txt"
    bl.write_text("Table Scan\nHASH-JOIN!\n\n  \n")
    rc = main([
        "blocklist_filter", src, out, "--blocklist_file", str(bl),
        "--num_output_partitions", "1", "--spark_master", "local[4]",
        "--output_compression", "snappy",
    ])
    assert rc == 0
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    got = spark.read.parquet(out)
    hits = {
        h for r in got.filter("n_hits > 0").collect()
        for h in r["hits"].split(",")
    }
    assert "table scan" in hits, "normalized multi-word phrase must fire"
    assert hits <= {"table scan", "hash join"}
