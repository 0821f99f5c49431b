"""Scale-path dedup (xxhash64 IDs) must agree with the exact baseline.

LSH candidate generation is probabilistic in the hash family, but
verification is exact Jaccard — so everything reported is a true
near-dup pair, and on the planted fixture near-dups recall should be
essentially complete.
"""

from __future__ import annotations

from cc_pyspark_spark.operators.dedup import (
    exact_dedup_keep_first,
    minhash_lsh_pairs,
)
from cc_pyspark_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR


def test_scale_minhash_matches_exact_jaccard(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r["a_id"], r["b_id"]): r["jac"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    exact = {
        (r["a_id"], r["b_id"]): r["jac"]
        for r in QUERIES["dedup_ngram_jaccard"].spark(spark, SF_DIR).collect()
    }
    # precision: every reported pair is a true pair with the exact score
    for k, v in got.items():
        assert k in exact and abs(exact[k] - v) < 1e-12
    # recall on planted near-dups: LSH with 4 bands at jac>=0.5 should
    # find nearly all; require >= 80%
    assert exact, "fixture has no planted near-dups?"
    assert len(got) >= 0.8 * len(exact)


def test_scale_minhash_plan_has_no_global_sort(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=None)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the oracle variant needs a single-partition window sort; this one must not
    assert "Window" not in plan
    assert "Sort [s" not in plan
    # band bucket key is xxhash64 over the signature slice (8 B, r6) —
    # the only concat_ws left in the plan is shingle construction
    assert "key, xxhash64(h0" in plan
    assert "key, concat_ws" not in plan
    # r14 (defaults flipped): the BARE call now carries the production
    # cap's window — which must be KEYED by (band, key), never a
    # single-partition global sort (the failure mode this test pins).
    bare = minhash_lsh_pairs(docs, threshold=0.5)
    bplan = bare._sc._jvm.PythonSQLUtils.explainString(
        bare._jdf.queryExecution(), "formatted"
    )
    assert "windowspecdefinition(band#" in bplan
    assert "SinglePartition" not in bplan


def test_exact_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        ["id", "key", "v"],
    )
    out = {
        r["key"]: (r["id"], r["v"])
        for r in exact_dedup_keep_first(df, ["key"], "id").collect()
    }
    assert out == {"a": (1, 10.0), "b": (3, 30.0)}


def test_ml_minhash_agrees_with_exact(spark):
    from cc_pyspark_spark.operators.dedup import minhash_lsh_ml_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        (r["a_id"], r["b_id"]): r["jac_approx"]
        for r in minhash_lsh_ml_pairs(docs, threshold=0.5).collect()
    }
    exact = {
        (r["a_id"], r["b_id"]): r["jac"]
        for r in QUERIES["dedup_ngram_jaccard"].spark(spark, SF_DIR).collect()
    }
    # recall of planted near-dups
    assert len([k for k in exact if k in got]) >= 0.8 * len(exact)
    # reported scores are close to exact jaccard (feature-hash collisions
    # can only inflate or slightly distort)
    for k, v in got.items():
        if k in exact:
            assert abs(v - exact[k]) < 0.05

def test_shingles_short_docs_do_not_crash(spark):
    """ANSI regression: docs with fewer than k tokens must yield an empty
    shingle array, not [INVALID_ARRAY_INDEX] (sequence(0, size-k) goes
    negative without the guard)."""
    from pyspark.sql import functions as F

    from cc_pyspark_spark.functions.text import shingles, tokenize

    df = spark.createDataFrame(
        [("", ), ("one", ), ("two words", ), ("now three tokens", ),
         ("this one has four", )],
        ["text"],
    ).select(tokenize("text").alias("toks"))
    rows = df.select(F.size(shingles("toks", 3)).alias("n")).collect()
    assert [r["n"] for r in rows] == [0, 0, 0, 1, 2]
    # bigram helper path (k=2) used by text_bigram_counts
    rows2 = df.select(F.size(shingles("toks", 2)).alias("n")).collect()
    assert [r["n"] for r in rows2] == [0, 0, 1, 2, 3]


def test_minhash_pipeline_tolerates_short_docs(spark):
    """End-to-end: a corpus containing sub-k-token docs must not abort
    minhash_lsh_pairs (ADVICE r1, high)."""
    docs = spark.createDataFrame(
        [(1, "x"), (2, "tiny doc"), (3, "a longer document with enough tokens"),
         (4, "a longer document with enough tokens too")],
        ["doc_id", "text"],
    )
    # must run without raising; short docs simply produce no signatures
    pairs = minhash_lsh_pairs(docs, threshold=0.3).collect()
    assert all(p["a_id"] != p["b_id"] for p in pairs)

def test_simhash_scale_signatures(spark):
    """Deployment simhash: one row per doc, full signed-64-bit range, no
    window/global sort in the plan, and planted near-dups are closer in
    hamming distance than random pairs."""
    from pyspark.sql import functions as F

    from cc_pyspark_spark.operators.dedup import simhash_signatures
    from cc_pyspark_spark.plans.registry import QUERIES

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sig = simhash_signatures(docs)
    plan = sig._sc._jvm.PythonSQLUtils.explainString(
        sig._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan

    rows = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert len(rows) == docs.count()
    # 64-bit signatures live in the FULL signed bigint range (bit 63 is
    # the sign bit) — a 32-bit ceiling here would mean the default
    # silently regressed to the old narrow signature.
    assert all(-(1 << 63) <= v < (1 << 63) for v in rows.values())
    assert any(v < 0 or v >= (1 << 32) for v in rows.values()), (
        "no signature uses the top 32 bits — 64-bit default regressed?"
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    near = [
        ham(rows[r["a_id"]], rows[r["b_id"]])
        for r in QUERIES["dedup_ngram_jaccard"].spark(spark, SF_DIR).collect()
    ]
    ids = sorted(rows)
    rand = [ham(rows[ids[i]], rows[ids[i + 7]]) for i in range(0, 200, 2)]
    assert near, "fixture has no planted near-dups?"
    assert sum(near) / len(near) < 0.5 * sum(rand) / len(rand)


def test_embedding_scale_prunes_but_recalls(spark):
    """Sign-bit LSH twin: subset of the all-pairs baseline (precision 1.0
    on the cosine threshold by construction), recall >= 0.5 on the fixture,
    and no all-pairs cartesian in the plan (the join is band-bucket keyed).
    """
    from cc_pyspark_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.01"  # sf0.001 has too few threshold pairs
    base = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["dedup_embedding_cosine"].spark(spark, sf).collect()
    }
    lsh_df = QUERIES["dedup_embedding_fixture"].spark(spark, sf)
    lsh = {(r["a_id"], r["b_id"]) for r in lsh_df.collect()}
    assert base, "fixture has no cosine-dup pairs?"
    assert lsh <= base  # every returned pair really meets the threshold
    assert len(lsh) >= 0.5 * len(base)
    plan = lsh_df._sc._jvm.PythonSQLUtils.explainString(
        lsh_df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_wide_geometry_recall_and_pruning(spark):
    """Production sign-LSH geometry (16-bit bands x 8, one bigint per
    band — r7 VERDICT ask #2): on the planted-twin corpus it must find
    EVERY twin pair (cos ~ 0.9999 -> per-band collision p^16 ~ 0.93,
    miss-all-8 probability ~ 5e-10, and the arithmetic is deterministic
    so the outcome is fixed), return nothing else at the 0.95
    threshold, and actually prune: 2^16 buckets per band keeps the
    largest (band, bucket) group O(1) instead of the narrow demo
    geometry's N/16."""
    import pyspark.sql.functions as F

    from cc_pyspark_spark.operators.dedup import sign_lsh_sigs_and_norm
    from cc_pyspark_spark.plans.dedup import SIGN_LSH_TWIN_OFFSET

    sf = "/root/testdata/sf0.01"
    ids = [
        r["vec_id"]
        for r in spark.read.parquet(sf + "/embeddings.parquet")
        .select("vec_id")
        .collect()
    ]
    got = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["dedup_embedding_scale_wide"].spark(spark, sf).collect()
    }
    assert got == {(i, i + SIGN_LSH_TWIN_OFFSET) for i in ids}

    # bucket-cardinality pin: wide bands shatter the corpus. With 500
    # organic vectors in 65,536 buckets/band the biggest bucket must be
    # tiny; the narrow demo geometry packs ~N/16 per bucket.
    vecs = spark.read.parquet(sf + "/embeddings.parquet").select(
        F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    sizes = (
        vecs.select(sign_lsh_sigs_and_norm("v", 16, 8).alias("sn"))
        .select(F.posexplode("sn.sigs").alias("band", "bkey"))
        .groupBy("band", "bkey")
        .count()
    )
    stats = sizes.agg(
        F.max("count").alias("mx"), F.count("*").alias("n_buckets")
    ).collect()[0]
    assert stats["mx"] <= 8, "a 16-bit band bucket holding >8 of 500 vectors"
    assert stats["n_buckets"] >= len(ids) * 8 // 4  # most rows singleton

    narrow = (
        vecs.select(sign_lsh_sigs_and_norm("v", 4, 8).alias("sn"))
        .select(F.posexplode("sn.sigs").alias("band", "bkey"))
        .groupBy("band", "bkey")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert narrow > stats["mx"], "wide bands should prune harder than demo"


def test_sign_lsh_band_width_uncapped():
    """r7 packed all bands into ONE bigint and raised ValueError past 62
    total bits, making the documented production geometry unreachable.
    Now only the per-band width is bounded (62 bits per bigint)."""
    import pytest

    from cc_pyspark_spark.operators.dedup import sign_lsh_sigs_and_norm

    # 20 x 8 = 160 total bits — far beyond the old cap — constructs fine
    sign_lsh_sigs_and_norm("v", band_bits=20, n_bands=8)
    sign_lsh_sigs_and_norm("v", band_bits=62, n_bands=16)
    with pytest.raises(ValueError, match="band_bits"):
        sign_lsh_sigs_and_norm("v", band_bits=63, n_bands=1)


def test_incremental_exact_dedup(spark):
    """Delta dedup: in-batch duplicates collapse, corpus-known content
    is anti-joined out, genuinely new docs survive."""
    from cc_pyspark_spark.operators.dedup import (
        content_fingerprints,
        incremental_exact_dedup,
    )

    old = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),     # already in corpus → dropped
            (11, "brand new document"),   # new → kept
            (12, "brand new document"),   # in-batch dup of 11 → dropped
            (13, "another fresh one"),    # new → kept
        ],
        ["doc_id", "text"],
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_exact_dedup(new, content_fingerprints(old)).collect()
    )
    assert got == [11, 13]


def test_incremental_minhash_matches_full_run(spark):
    """Cross-generation candidates from the delta-vs-index probe,
    verified with exact jaccard, equal the full-corpus run's pairs
    restricted to (old, new) — the incremental path loses nothing."""
    from pyspark.sql import functions as F

    from cc_pyspark_spark.operators.dedup import (
        _shingle_rows,
        incremental_minhash_candidates,
        minhash_band_index,
        minhash_lsh_pairs,
        verify_jaccard,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    cut = 30
    old = docs.filter(F.col("doc_id") < cut)
    new = docs.filter(F.col("doc_id") >= cut)

    full = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    full_cross = {
        (a, b) for a, b in full if (a < cut) <= (b >= cut) and (a < cut) != (b < cut)
    }

    cand = incremental_minhash_candidates(new, minhash_band_index(old))
    pairs = cand.select(
        F.least("new_id", "old_id").alias("a_id"),
        F.greatest("new_id", "old_id").alias("b_id"),
    ).distinct()
    sh = _shingle_rows(docs, "doc_id", "text", 3).persist()
    got = {
        (r["a_id"], r["b_id"])
        for r in verify_jaccard(pairs, sh, 0.5).collect()
    }
    assert got == full_cross

def test_substring_spans_shuffles_on_hash_key(spark):
    """Both wide exchanges of dedup_substring_spans must carry the
    8-byte xxhash64(gram) key, never the raw span text (VERDICT r3/r5)."""
    import re

    df = QUERIES["dedup_substring_spans"].spark(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "xxhash64" in plan
    for part in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
        assert "gram#" not in part, f"text gram key in shuffle: {part}"

def test_scale_minhash_full_recall(spark):
    """The dedup_minhash_scale driver oracle (all-pairs exact Jaccard)
    binds only while LSH recall on the fixture is COMPLETE — pin it so
    any recall drift fails here before it fails the driver gate."""
    got = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["dedup_minhash_scale"].spark(spark, SF_DIR).collect()
    }
    exact = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["dedup_ngram_jaccard"].spark(spark, SF_DIR).collect()
    }
    assert got == exact


def test_capped_default_cap_headroom(spark):
    """PINNED INVARIANT behind dedup_minhash_scale_capped's oracle
    (r13, VERDICT r12 ask #3): the production default cap only yields
    an all-zero audit — and hence equality with the uncapped full-
    recall set — while the DEPLOYED xxhash64 banding's largest bucket
    stays under the cap. Require ~8x headroom so a fixture regen that
    even drifts TOWARD the cap fails here before the driver gate."""
    from pyspark.sql import functions as F

    from cc_pyspark_spark.operators.dedup import (
        LSH_DEFAULT_BUCKET_CAP,
        _band_structs,
        _shingle_rows,
        _perm,
        minhash_perms,
        MINHASH_P,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = _shingle_rows(docs, "doc_id", "text", 3)
    ds = sh.select("doc_id", (F.abs(F.xxhash64("s")) % MINHASH_P).alias("sid"))
    # Shared constant (r14, ADVICE r13): the pin measures the SAME
    # banding production deploys, by construction — a perm change in
    # the operator changes this test with it.
    sig = ds.groupBy("doc_id").agg(
        *[F.min(_perm(a, b, F.col("sid"))).alias(f"h{j}")
          for j, (a, b) in enumerate(minhash_perms(16))]
    )
    bands = sig.select(
        "doc_id", F.explode(F.array(*_band_structs(16, 4))).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")
    max_bucket = (
        bands.groupBy("band", "key").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_bucket * 8 <= LSH_DEFAULT_BUCKET_CAP, (
        f"deployed banding's max bucket {max_bucket} is within 8x of the "
        f"production cap {LSH_DEFAULT_BUCKET_CAP}; the capped-default "
        "oracle's all-zero-audit equality is no longer safe — regenerate "
        "per the procedure in plans/scale.py's module docstring"
    )


def test_signature_default_is_production_cap(spark):
    """r14 (VERDICT r13 ask #2): the operator SIGNATURE default is the
    production configuration — salt at LSH_DEFAULT_BUCKET_CAP — so a
    new call site composing either LSH pair operator gets the bounded
    band join without opting in. Two checks: (a) the defaults
    themselves (an inspect pin, so a signature regression is loud),
    (b) the default path's OUTPUT equals the explicit-uncapped
    reference below the cap — the same headroom invariant the capped
    oracles ride, now covering the path every bare call takes."""
    import inspect

    from pyspark.sql import functions as F  # noqa: PLC0415

    from cc_pyspark_spark.operators.dedup import (
        CAP_DEFAULT,
        LSH_DEFAULT_ON_EXCEED,
        sign_lsh_pairs,
    )

    for fn in (minhash_lsh_pairs, sign_lsh_pairs):
        params = inspect.signature(fn).parameters
        assert params["max_bucket_size"].default == CAP_DEFAULT, fn
        assert params["on_exceed"].default == LSH_DEFAULT_ON_EXCEED, fn

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bare = {
        (r["a_id"], r["b_id"], round(r["jac"], 12))
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    uncapped = {
        (r["a_id"], r["b_id"], round(r["jac"], 12))
        for r in minhash_lsh_pairs(
            docs, threshold=0.5, max_bucket_size=None
        ).collect()
    }
    assert bare and bare == uncapped

    # sign-LSH twin on the production-width candidate-join path (the
    # geometry dedup_embedding_scale_wide deploys).
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    bare_e = {
        (r["a_id"], r["b_id"], round(r["cos"], 12))
        for r in sign_lsh_pairs(emb, 0.42, band_bits=16, n_bands=8,
                                vec_col="v").collect()
    }
    unc_e = {
        (r["a_id"], r["b_id"], round(r["cos"], 12))
        for r in sign_lsh_pairs(emb, 0.42, band_bits=16, n_bands=8,
                                vec_col="v", max_bucket_size=None).collect()
    }
    assert bare_e == unc_e
    # bucket-local and multiprobe calls must keep working with the bare
    # default — the cap resolves to uncapped there (it cannot compose
    # with pandas groups / ex-flags) — same geometry, same output...
    bl = sign_lsh_pairs(emb, 0.42, band_bits=4, n_bands=8, vec_col="v")
    bl_unc = sign_lsh_pairs(emb, 0.42, band_bits=4, n_bands=8,
                            vec_col="v", max_bucket_size=None)
    assert bl.count() == bl_unc.count()
    # ...while an EXPLICIT cap on those paths still raises.
    import pytest as _pytest  # noqa: PLC0415

    with _pytest.raises(ValueError):
        sign_lsh_pairs(emb, 0.42, band_bits=4, n_bands=8, vec_col="v",
                       max_bucket_size=64)


def test_recall_eval_capped_candidates_equal_uncapped(spark):
    """r14 (VERDICT r13 ask #3): dedup_lsh_recall_eval now measures the
    PRODUCTION salt@64 geometry. At gate SFs the cap must be invisible
    — the capped candidate set EQUALS the uncapped one (the ~8x
    headroom pin above is why) — so the re-point changes what the
    S-curve GATES, not its published values. If this breaks after a
    fixture regen, the cap started biting: the recall row will then
    honestly report the deployed geometry's recall loss."""
    from cc_pyspark_spark.catalog import Catalog  # noqa: PLC0415
    from cc_pyspark_spark.operators.dedup import (  # noqa: PLC0415
        LSH_DEFAULT_BUCKET_CAP,
        LSH_DEFAULT_ON_EXCEED,
        cap_lsh_buckets,
    )
    from cc_pyspark_spark.plans.dedup import _minhash_sh_bands  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415

    t = Catalog(spark, SF_DIR)
    _sh, bands = _minhash_sh_bands(t)
    capped, _audit = cap_lsh_buckets(
        bands, LSH_DEFAULT_BUCKET_CAP, LSH_DEFAULT_ON_EXCEED
    )
    unc = {
        (r["a_id"], r["b_id"])
        for r in bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
        .collect()
    }
    cap = {
        (r["a_id"], r["b_id"])
        for r in capped.alias("x")
        .join(
            capped.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.sub") == F.col("y.sub"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .distinct()
        .collect()
    }
    assert unc, "fixture produced no LSH candidates?"
    assert cap == unc


def test_capped_default_equals_uncapped_with_zero_audit(spark):
    """Under the production cap the salt-mode output must EQUAL the
    uncapped deployment pairs, with every row carrying the all-zero
    audit — the exact equality dedup_minhash_scale_capped's oracle
    asserts at the driver SFs, checked here at sf0.001 first."""
    rows = QUERIES["dedup_minhash_scale_capped"].spark(spark, SF_DIR).collect()
    assert rows, "fixture has no planted near-dups?"
    for r in rows:
        assert (r["capped_buckets"], r["hot_docs"], r["dropped_pairs_est"]) == (
            0, 0, 0,
        )
    got = {(r["a_id"], r["b_id"], round(r["jac"], 12)) for r in rows}
    uncapped = {
        (r["a_id"], r["b_id"], round(r["jac"], 12))
        for r in QUERIES["dedup_minhash_scale"].spark(spark, SF_DIR).collect()
    }
    assert got == uncapped


def test_embedding_capped_equals_wide_with_zero_audit(spark):
    """The sign-LSH twin of the capped-default equality above: under
    the production cap the salted wide-geometry output must EQUAL
    dedup_embedding_scale_wide's pairs with an all-zero audit. Here
    the oracle replays the full salt rule exactly (deterministic
    hyperplanes), so this is evidence the cap doesn't bite on clean
    fixtures — not a correctness precondition like the minhash pin."""
    rows = (
        QUERIES["dedup_embedding_scale_capped"].spark(spark, SF_DIR).collect()
    )
    assert rows, "fixture has no planted embedding twins?"
    for r in rows:
        assert (r["capped_buckets"], r["hot_docs"], r["dropped_pairs_est"]) == (
            0, 0, 0,
        )
    got = {(r["a_id"], r["b_id"], round(r["cos"], 12)) for r in rows}
    wide = {
        (r["a_id"], r["b_id"], round(r["cos"], 12))
        for r in QUERIES["dedup_embedding_scale_wide"].spark(spark, SF_DIR).collect()
    }
    assert got == wide


def test_sign_lsh_cap_salt_mode_bites_and_audits(spark):
    """End-to-end enforcement check for the sign-LSH cap path with a
    cap SMALL enough to fire: identical vectors all share every band
    bucket, so 5 copies at cap 2 split into subs {2,2,1} per band —
    within-sub pairs survive, the audit reports the hot buckets."""
    import pyspark.sql.functions as F  # noqa: PLC0415

    from cc_pyspark_spark.operators.dedup import sign_lsh_pairs  # noqa: PLC0415

    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(5)]
        + [(10, [-4.0, 3.0, -2.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = sign_lsh_pairs(
        emb, 0.99, band_bits=16, n_bands=2, bucket_local=False,
        max_bucket_size=2, on_exceed="salt", with_audit=True,
    )
    rows = pairs.collect()
    assert rows, "salt mode must keep within-sub pairs"
    a = rows[0]
    # 2 bands x 1 hot bucket of 5 -> 10 band rows; dropped per bucket
    # = 10 - (2*1 + 0) = 8 ... (q=2 subs of 2 -> 1 pair each, r=1)
    assert a["capped_buckets"] == 2 and a["hot_docs"] == 10
    assert a["dropped_pairs_est"] == 16
    # every surviving pair is a true near-dup (cos = 1 for copies)
    for r in rows:
        assert r["cos"] >= 0.99
    # and fan-out is bounded: no (band,bkey,sub) group exceeded the cap,
    # so no pair (a,b) with 3+ docs in one sub emerged; the drop twin
    # removes everything
    dropped = sign_lsh_pairs(
        emb, 0.99, band_bits=16, n_bands=2, bucket_local=False,
        max_bucket_size=2, on_exceed="drop", with_audit=True,
    ).collect()
    assert dropped == []  # hot buckets removed entirely; cool bucket has 1 doc


def test_simhash_pairs_64bit_bucket_width(spark):
    """The r6 scale-killer regression pin: simhash_pairs must band a
    64-bit signature into 16-bit chunks. 8-bit buckets give only 2^8
    values per chunk, i.e. ~chunks * N^2 / 2^8 random candidate pairs
    at corpus scale — an accidental cross join at N ~ 10^9. Pins:

    * chunk values span [0, 2^16) and the four shifted chunks
      reassemble the exact 64-bit signature (no bit is outside every
      band — that would break the pigeonhole recall guarantee);
    * the banded+verified pair set equals brute-force all-pairs
      Hamming <= 3 (recall is guaranteed, not probabilistic);
    * band extraction is bitwise in the plan (shiftrightunsigned),
      never float division, which corrupts signatures past the 53-bit
      mantissa.
    """
    from pyspark.sql import functions as F

    from cc_pyspark_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}

    width, chunks = 16, 4
    for sig in sigs.values():
        u = sig & ((1 << 64) - 1)  # two's complement view
        parts = [(u >> (c * width)) & ((1 << width) - 1) for c in range(chunks)]
        assert all(0 <= p < (1 << width) for p in parts)
        rebuilt = 0
        for c, p in enumerate(parts):
            rebuilt |= p << (c * width)
        assert rebuilt == u

    pairs_df = simhash_pairs(docs)
    got = {(r["a_id"], r["b_id"]): r["hamming"] for r in pairs_df.collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = sorted(sigs)
    brute = {
        (a, b): ham(sigs[a], sigs[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(sigs[a], sigs[b]) <= 3
    }
    assert got == brute
    assert brute, "fixture has no simhash near-dups — recall untested"

    plan = pairs_df._sc._jvm.PythonSQLUtils.explainString(
        pairs_df._jdf.queryExecution(), "formatted"
    )
    assert "shiftrightunsigned" in plan


def test_prefix_jaccard_contains_minhash_pairs(spark):
    """Prefix filtering's recall is a theorem (J>=t pairs share a
    prefix shingle), so its output IS the all-pairs truth; MinHash-LSH
    over the same shingle universe can only ever find a subset. This
    turns the minhash full-recall *pin* into a structurally-checked
    equality each run.

    NOTE: the registered prefix query runs at t=0.8 while minhash runs
    at t=0.5 — equality relies on the fixture planting no pair in
    [0.5, 0.8) (verified for all three SFs when t was raised). A
    regenerated fixture that adds a mid-band pair fails HERE first;
    then either lower the prefix threshold or update this test."""
    from cc_pyspark_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    exact = {
        (r.a_id, r.b_id)
        for r in QUERIES["dedup_prefix_jaccard"].spark(spark, SF_DIR).collect()
    }
    mh = {
        tuple(sorted((r[0], r[1])))
        for r in QUERIES["dedup_minhash_scale"].spark(spark, SF_DIR).collect()
    }
    assert mh <= exact
    # on the planted fixture minhash recall is complete -> equality
    assert mh == exact


def test_prefix_jaccard_property_random_corpora(spark):
    """Property check: on random small corpora the prefix-filter join's
    output equals brute-force shingle-set Jaccard — recall is a theorem
    and must hold for ANY corpus, not just the planted fixture."""
    import itertools
    import random
    import re

    from cc_pyspark_spark.functions.text import TOKEN_PATTERN
    from cc_pyspark_spark.operators.dedup import prefix_filter_jaccard_pairs

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        docs = []
        for d in range(8):
            n = rng.randint(3, 12)
            base = [rng.choice(vocab) for _ in range(n)]
            docs.append((d, " ".join(base)))
            if rng.random() < 0.5:  # plant a near-duplicate
                dup = list(base)
                if rng.random() < 0.7 and len(dup) > 4:
                    dup[rng.randrange(len(dup))] = rng.choice(vocab)
                docs.append((100 + d, " ".join(dup)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        threshold = rng.choice([0.5, 0.8])
        got = {
            (r.a_id, r.b_id): r.jac
            for r in prefix_filter_jaccard_pairs(
                df, threshold=threshold
            ).collect()
        }
        # brute force in plain Python over the same shingle universe
        sets = {}
        for d, text in docs:
            toks = re.findall(TOKEN_PATTERN, text.lower())
            sets[d] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            i = len(sa & sb)
            jac = i / (len(sa) + len(sb) - i)
            if jac >= threshold:
                want[(a, b)] = jac
        assert set(got) == set(want), (trial, threshold, got, want)
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-12, (trial, k, got[k], v)


def test_minhash_delta_equals_full_run_restricted(spark):
    """Consistency theorem for incremental dedup: the delta probe's
    verified pairs must equal the FULL-corpus run's pairs restricted
    to (delta doc, base doc) — same signatures, same banding, same
    verification, so the incremental path loses nothing against a
    from-scratch re-run. (full emits a_id < b_id; base ids precede
    delta ids here, so the pair maps to new_id=b, old_id=a.)"""
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    thr = docs.selectExpr("(9 * max(doc_id)) div 10 AS t").collect()[0]["t"]

    full = {
        (r["b_id"], r["a_id"]): r["jac"]
        for r in QUERIES["dedup_minhash_lsh"].spark(spark, SF_DIR).collect()
        if r["b_id"] > thr and r["a_id"] <= thr
    }
    delta = {
        (r["new_id"], r["old_id"]): r["jac"]
        for r in QUERIES["dedup_minhash_delta"].spark(spark, SF_DIR).collect()
    }
    assert delta == full
    assert delta, "fixture must exercise at least one cross-boundary pair"


def test_multiprobe_recovers_missed_pairs(spark):
    """Multi-probe sign-LSH (r8): on the hard-perturbed twin corpus
    (v[0] x 3, cos spread ~0.90-0.99) the exact production banding
    misses some >=0.95 pairs; Hamming-1 probing must (a) contain every
    exact-banding pair, (b) strictly grow the pair set, and (c) reach
    FULL empirical recall — equal the brute-force >=0.95 pair set —
    while keeping exact precision (every pair cosine-verified)."""
    import numpy as np
    import pyspark.sql.functions as F

    from cc_pyspark_spark.operators.dedup import sign_lsh_pairs
    from cc_pyspark_spark.plans.dedup import SIGN_LSH_TWIN_OFFSET

    sf = "/root/testdata/sf0.001"
    probe = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["dedup_embedding_scale_probe"].spark(spark, sf).collect()
    }
    base_df = spark.read.parquet(sf + "/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    twins = base_df.select(
        (F.col("vec_id") + F.lit(SIGN_LSH_TWIN_OFFSET)).alias("vec_id"),
        F.expr("concat(array(v[0] * 3.0D), slice(v, 2, size(v) - 1))").alias(
            "v"
        ),
    )
    corpus = base_df.unionAll(twins)
    base = {
        (r["a_id"], r["b_id"])
        for r in sign_lsh_pairs(
            corpus, 0.95, band_bits=16, n_bands=8, vec_col="v"
        ).collect()
    }
    rows = corpus.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.vstack([r["v"] for r in rows])
    n = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = n @ n.T
    iu, ju = np.triu_indices(len(n), 1)
    keep = C[iu, ju] >= 0.95
    brute = {
        (min(a, b), max(a, b))
        for a, b in zip(ids[iu[keep]], ids[ju[keep]])
    }
    assert base <= probe
    assert len(base) < len(probe), "probing must recover missed pairs"
    assert probe == brute, (
        f"probe recall {len(probe)}/{len(brute)} — expected full on fixture"
    )


def test_embedding_delta_equals_full_run_restricted(spark):
    """O(delta) embedding probe == full-corpus wide-geometry run
    restricted to (delta, corpus) pairs: the persisted-index path must
    lose nothing relative to re-running sign-LSH over corpus+delta
    (the dedup_minhash_delta consistency contract, embedding twin)."""
    import pyspark.sql.functions as F

    from cc_pyspark_spark.plans.dedup import SIGN_LSH_TWIN_OFFSET

    sf = "/root/testdata/sf0.001"
    delta = {
        (r["new_id"], r["old_id"])
        for r in QUERIES["dedup_embedding_delta"].spark(spark, sf).collect()
    }
    # full corpus+delta run: the wide query IS that composition (same
    # twins, same geometry); restrict to cross-generation pairs
    full = {
        (r["b_id"], r["a_id"])  # a=original < b=twin
        for r in QUERIES["dedup_embedding_scale_wide"].spark(spark, sf).collect()
        if r["b_id"] >= SIGN_LSH_TWIN_OFFSET > r["a_id"]
    }
    assert delta == full and len(delta) > 0


def test_cap_sentinel_rejects_junk_values():
    """r15 (ADVICE r14): a stray string/float/bool passed as
    max_bucket_size used to fall through the `== CAP_DEFAULT` check
    into cap_lsh_buckets, where `'x' < 2` raised an opaque TypeError
    mid-plan. The validation now rejects it at the operator signature
    with a message naming the accepted values."""
    import pytest as _pytest

    from cc_pyspark_spark.operators.dedup import (
        CAP_DEFAULT,
        LSH_DEFAULT_BUCKET_CAP,
        _resolve_cap,
    )

    assert _resolve_cap(CAP_DEFAULT, LSH_DEFAULT_BUCKET_CAP) == (
        LSH_DEFAULT_BUCKET_CAP
    )
    assert _resolve_cap(CAP_DEFAULT, None) is None
    assert _resolve_cap(None, LSH_DEFAULT_BUCKET_CAP) is None
    assert _resolve_cap(17, LSH_DEFAULT_BUCKET_CAP) == 17
    for junk in ("x", "defaults", 3.5, True, False, [64]):
        with _pytest.raises(TypeError, match="max_bucket_size"):
            _resolve_cap(junk, LSH_DEFAULT_BUCKET_CAP)
