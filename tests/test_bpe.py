"""Vendored byte-level BPE tokenizer (functions/bpe.py).

Properties pinned: exact round-trip for arbitrary text (byte-level base
vocab), determinism, additivity over whitespace-joined concatenation
(merges never cross pre-token boundaries), fixture consistency (the
committed oracle fixture equals what the committed vocab produces), and
Spark-UDF vs pure-Python parity with `tokenizer=` wiring into packing
and the Gopher frame.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cc_pyspark_spark.functions import bpe

TEXTS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(TEXTS)
@settings(max_examples=300, deadline=None)
def test_roundtrip(text):
    assert bpe.decode(bpe.encode(text)) == text


@given(TEXTS)
@settings(max_examples=100, deadline=None)
def test_deterministic_and_count_consistent(text):
    ids = bpe.encode(text)
    assert bpe.encode(text) == ids
    assert bpe.token_count(text) == len(ids)


@given(
    st.text(alphabet=st.sampled_from("abc 123.xyz"), max_size=60),
    st.text(alphabet=st.sampled_from("abc 123.xyz"), max_size=60),
)
@settings(max_examples=100, deadline=None)
def test_additive_over_space_join(a, b):
    # The space separator pretokenizes as part of b's first word (or
    # alone), and merges never cross pre-token boundaries — so joining
    # with "\n" (always its own pre-token boundary) is exactly additive.
    joined = a + "\n" + b
    assert bpe.token_count(joined) == (
        bpe.token_count(a) + bpe.token_count("\n" + b)
    )


def test_vocab_well_formed():
    assert bpe.VOCAB_SIZE == 256 + len(bpe.MERGES)
    for k, (left, right) in enumerate(bpe.MERGES):
        # merges refer only to already-defined ids (bottom-up table)
        assert left < 256 + k and right < 256 + k
        assert bpe.TOKEN_BYTES[256 + k] == (
            bpe.TOKEN_BYTES[left] + bpe.TOKEN_BYTES[right]
        )


def test_compresses_fixture_vocabulary():
    # Trained merges must actually compress in-domain text.
    s = "key agg row scan slow fast table value part hash"
    assert bpe.token_count(s) < len(s.encode()) / 2


def test_fixture_matches_committed_vocab():
    path = os.path.join(
        os.path.dirname(bpe.__file__), "bpe_token_fixture.json"
    )
    with open(path) as f:
        fixture = json.load(f)
    assert len(fixture) >= 500
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        "SELECT text FROM '/root/testdata/sf0.001/documents.parquet' "
        "ORDER BY doc_id LIMIT 25"
    ).fetchall()
    for (text,) in rows:
        h = hashlib.md5(text.encode()).hexdigest()
        assert fixture[h] == bpe.token_count(text)


def test_udf_matches_python(spark):
    texts = ["hello world", "", "ünïcode 中文 test", "a b  c\n\nd"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", bpe.token_count_udf()(df["t"]).alias("n")
        ).collect()
    }
    assert got == {i: bpe.token_count(t) for i, t in enumerate(texts)}


def test_pack_sequences_bpe_capacity(spark):
    from cc_pyspark_spark.plans.curation import pack_sequences_frame
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    out = pack_sequences_frame(docs, capacity=512, tokenizer="bpe").collect()
    assert out
    by_pack = {}
    for r in out:
        key = (r["lang"], r["shard"], r["pack_seq"])
        by_pack.setdefault(key, []).append(r)
    for rows in by_pack.values():
        total = sum(r["n_tokens"] for r in rows)
        # a pack only exceeds capacity if it holds a single oversized doc
        assert total <= 512 or len(rows) == 1
        # offsets are the exclusive running sum in doc_id order
        rows = sorted(rows, key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["pack_offset"] == cum
            cum += r["n_tokens"]


def test_gopher_frame_bpe_column(spark):
    from cc_pyspark_spark.plans.text import gopher_signals_frame
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    out = gopher_signals_frame(docs, tokenizer="bpe")
    assert "n_bpe_tokens" in out.columns
    rows = out.collect()
    want = {r["doc_id"]: bpe.token_count(r["text"]) for r in docs.collect()}
    for r in rows:
        assert r["n_bpe_tokens"] == want[r["doc_id"]]


def test_unknown_tokenizer_rejected(spark):
    from cc_pyspark_spark.plans.curation import pack_sequences_frame
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError):
        pack_sequences_frame(docs, tokenizer="nope")


# ---------------------------------------------------------------------------
# BPE TRAINING (plans/text.py text_bpe_train, late r9): the learned
# merges must equal an independent pure-Python Sennrich reference loop
# run on the same corpus — a third implementation, separate from both
# the Spark plan and the DuckDB oracle chain.


def _reference_bpe_merges(texts, n_merges):
    import re
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            vocab[" ".join(w) + " </w>"] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, f in vocab.items():
            s = sym.split(" ")
            for a, b in zip(s, s[1:]):
                pairs[f"{a} {b}"] += f
        if not pairs:
            break
        # exact tie-break: count desc, pair asc — the plan's orderBy
        top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(top)
        merged = top[0].replace(" ", "")
        # subword-nmt-style boundary-anchored rewrite: the pair only
        # matches whole symbols, never a suffix/prefix of a neighbour
        # ('h e' must not fire inside 'th e').
        pat = re.compile(r"(?<!\S)" + re.escape(top[0]) + r"(?!\S)")
        vocab = Counter(
            {pat.sub(merged, sym): f for sym, f in vocab.items()}
        )
    return merges


def test_bpe_train_matches_reference_loop(spark):
    from cc_pyspark_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    want = _reference_bpe_merges(texts, 10)
    got = (
        QUERIES["text_bpe_train"]
        .spark(spark, SF_DIR)
        .orderBy("merge_rank")
        .collect()
    )
    assert [(r["pair"], r["cnt"]) for r in got] == want
    for r in got:
        assert r["merged"] == r["pair"].replace(" ", "")


def test_bpe_train_merges_feed_forward(spark):
    """Later rounds must see earlier merges: on a corpus engineered so
    the best pair in round 2 only exists AFTER round 1's merge, the
    learned sequence is ('a b' -> 'ab', then 'ab c' -> 'abc')."""
    from cc_pyspark_spark.plans.text import BPE_TRAIN_MERGES, text_bpe_train
    import tempfile

    rows = [(i, "abc abc abc abc ab") for i in range(3)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            f"{d}/documents.parquet"
        )
        got = [
            (r["merge_rank"], r["pair"], r["merged"])
            for r in text_bpe_train(spark, d).orderBy("merge_rank").collect()
        ]
    assert got[0] == (1, "a b", "ab")
    assert got[1] == (2, "ab c", "abc")
    assert len(got) <= BPE_TRAIN_MERGES


def test_bpe_train_rewrite_is_symbol_boundary_anchored(spark):
    """The merge rewrite must only fire on whole symbols: with corpus
    th*20 he*10 the*6 the learned sequence reaches round 4's
    ('h e</w>' -> 'he</w>'), at which point 'the' is the symbol string
    'th e</w>'. An unanchored substring replace would also rewrite the
    'h e</w>' TAIL of 'th e</w>' into 'the</w>' (merging symbols that
    were never the argmax pair), leaving no pairs for round 5; the
    anchored rewrite leaves 'th e</w>' intact so round 5 learns it."""
    from cc_pyspark_spark.plans.text import text_bpe_train
    import tempfile

    text = " ".join(["th"] * 20 + ["he"] * 10 + ["the"] * 6)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, text)], "doc_id long, text string"
        ).write.parquet(f"{d}/documents.parquet")
        got = [
            (r["pair"], r["cnt"])
            for r in text_bpe_train(spark, d).orderBy("merge_rank").collect()
        ]
    assert got == [
        ("t h", 26),
        ("th </w>", 20),
        ("e </w>", 16),
        ("h e</w>", 10),
        ("th e</w>", 6),
    ]
