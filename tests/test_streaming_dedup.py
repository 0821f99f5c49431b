"""Streaming dedup: duplicated input events emit exactly once."""

from __future__ import annotations

import shutil

import pytest

from cc_pyspark_spark.streaming.dedup import (
    dedup_exact_stream,
    dedup_within_watermark,
)
from cc_pyspark_spark.streaming.windows import run_available_now, stream_events
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def dup_events_dir(tmp_path_factory):
    """The same events file twice — every event is a duplicate."""
    d = tmp_path_factory.mktemp("dup-events")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "b.parquet")
    return str(d)


def test_streaming_exact_dedup(spark, dup_events_dir):
    stream = dedup_exact_stream(
        stream_events(spark, dup_events_dir), ["event_id"]
    )
    q = run_available_now(stream, "dedup_exact_t", "append")
    q.awaitTermination(120)
    out = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d "
                    "FROM dedup_exact_t").collect()[0]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    n_unique = spark.read.parquet(dup_events_dir).select("event_id").distinct().count()
    assert out["n"] == out["d"] == n_unique


def test_streaming_watermark_dedup(spark, dup_events_dir):
    stream = dedup_within_watermark(
        stream_events(spark, dup_events_dir), ["event_id"], watermark="10 minutes"
    )
    q = run_available_now(stream, "dedup_wm_t", "append")
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_wm_t"
    ).collect()[0]
    # duplicates arrive in the same batch (identical timestamps), well
    # within the watermark → exactly-once emission
    assert out["n"] == out["d"]
    assert out["n"] > 0


@pytest.fixture(scope="module")
def doc_stream_dir(tmp_path_factory):
    """Streaming documents: near-identical re-crawls share a simhash."""
    from pyspark.sql import SparkSession
    import datetime

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    d = tmp_path_factory.mktemp("doc-stream")
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(40):
        text = f"document number {i} with some shared vocabulary tokens " \
               f"alpha beta gamma delta epsilon zeta {i}"
        rows.append((i, text, base + datetime.timedelta(seconds=i)))
        # a retry/re-crawl duplicate of every 4th doc, identical text
        if i % 4 == 0:
            rows.append((1000 + i, text, base + datetime.timedelta(seconds=i, milliseconds=500)))
    spark.createDataFrame(rows, "doc_id long, text string, ts timestamp") \
        .write.mode("overwrite").parquet(str(d))
    return str(d)


def test_streaming_neardup_simhash_dedup(spark, doc_stream_dir):
    """Near-dup stream suppression: re-crawled duplicates (same simhash
    bucket) emit once; distinct documents all survive. The signature is
    row-local (zero shuffle, zero extra state) so the watermark dedup is
    the only stateful operator in the query."""
    from cc_pyspark_spark.streaming.dedup import neardup_dedup_stream
    from cc_pyspark_spark.streaming.windows import run_available_now

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(doc_stream_dir)
    )
    out_stream = neardup_dedup_stream(stream, watermark="10 minutes")
    q = run_available_now(out_stream, "neardup_t", "append")
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, simhash FROM neardup_t").collect()
    sigs = {r["doc_id"]: r["simhash"] for r in got}
    # one survivor per distinct signature...
    assert len(sigs) == len({v for v in sigs.values()})
    # ...and every planted duplicate pair collapsed to a single emission
    assert len(sigs) == 40


def test_incremental_index_stream_matches_batch_delta(spark, tmp_path):
    """Continuous ingestion: stream documents in two micro-batches; the
    streamed candidate pairs must equal the batch operators' cross-
    generation probe (batch2 vs batch1's index), and the persisted
    band index must equal a from-scratch batch build over everything."""
    from cc_pyspark_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_band_index,
    )
    from cc_pyspark_spark.streaming.dedup import incremental_index_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    half = docs.count() // 2
    b1 = docs.filter(docs.doc_id < half)
    b2 = docs.filter(docs.doc_id >= half)

    land = tmp_path / "land"
    land.mkdir()
    idx_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        src = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1000)
            .parquet(str(land))
        )
        q = incremental_index_stream(src, idx_dir, pairs_dir, ckpt)
        q.awaitTermination(180)

    import glob

    def land_batch(df, name):
        # the file stream source lists plain files, not subdirectories —
        # write the batch elsewhere and copy its part file in
        staging = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        shutil.copy(part, land / f"{name}.parquet")

    land_batch(b1, "b1")
    run_once()
    land_batch(b2, "b2")
    run_once()

    got_pairs = {
        (r["new_id"], r["old_id"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    want_pairs = {
        (r["new_id"], r["old_id"])
        for r in incremental_minhash_candidates(
            b2, minhash_band_index(b1)
        ).collect()
    }
    assert got_pairs == want_pairs
    assert want_pairs, "fixture must produce at least one candidate pair"

    got_index = {
        (r["doc_id"], r["band"], r["key"])
        for r in spark.read.parquet(idx_dir).drop("epoch").collect()
    }
    want_index = {
        (r["doc_id"], r["band"], r["key"])
        for r in minhash_band_index(docs).collect()
    }
    assert got_index == want_index

    # replay idempotency (r7 ADVICE): re-running the LAST batch with the
    # same batch_id — what a foreachBatch retry does after a failure
    # between the pair write and the checkpoint commit — must leave the
    # index row-for-row identical, not append duplicate band rows.
    from cc_pyspark_spark.streaming.dedup import ingest_dedup_batch

    before = spark.read.parquet(idx_dir).count()
    pairs_before = spark.read.parquet(pairs_dir).count()
    ingest_dedup_batch(b2, 1, idx_dir, pairs_dir)
    assert spark.read.parquet(idx_dir).count() == before
    assert spark.read.parquet(pairs_dir).count() == pairs_before
    replay_index = {
        (r["doc_id"], r["band"], r["key"])
        for r in spark.read.parquet(idx_dir).drop("epoch").collect()
    }
    assert replay_index == want_index


def test_incremental_embedding_stream_matches_batch_delta(spark, tmp_path):
    """Streaming twin of dedup_embedding_delta (VERDICT r8 ask #4):
    stream embeddings in two micro-batches with planted near-dup twins
    in the second; the streamed verified pairs must equal the batch
    operators' cross-generation probe (batch2 vs batch1's index), and
    both persisted state tables must equal from-scratch batch builds
    over everything. Narrow 8-bit x 4 geometry keeps the sf0.001
    bucket count test-sized; the operators are geometry-parametric."""
    import glob

    from pyspark.sql import functions as F

    from cc_pyspark_spark.operators.dedup import (
        incremental_embedding_candidates,
        sign_lsh_band_index,
        sign_lsh_vectors,
    )
    from cc_pyspark_spark.streaming.dedup import incremental_embedding_stream

    BB, NB, THRESH = 8, 4, 0.95
    corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # batch 2 = planted cos~0.9999 twins of batch 1 (the scale_wide
    # convention: v[0] * 1.0625, one float rounding) → guaranteed pairs
    b1 = corpus
    b2 = corpus.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN i = 0 "
            "THEN x * cast(1.0625 as float) ELSE x END)"
        ).alias("embedding"),
    )

    land = tmp_path / "land"
    land.mkdir()
    dirs = {n: str(tmp_path / n) for n in ("index", "vectors", "pairs", "ckpt")}

    def land_batch(df, name):
        staging = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        shutil.copy(part, land / f"{name}.parquet")

    def run_once():
        src = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1000)
            .parquet(str(land))
        )
        q = incremental_embedding_stream(
            src, dirs["index"], dirs["vectors"], dirs["pairs"], dirs["ckpt"],
            THRESH, band_bits=BB, n_bands=NB,
        )
        q.awaitTermination(180)

    land_batch(b1, "b1")
    run_once()
    land_batch(b2, "b2")
    run_once()

    got_pairs = {
        (r["new_id"], r["old_id"], r["cos"])
        for r in spark.read.parquet(dirs["pairs"]).collect()
    }
    want_pairs = {
        (r["new_id"], r["old_id"], r["cos"])
        for r in incremental_embedding_candidates(
            b2, sign_lsh_band_index(b1, BB, NB),
            sign_lsh_vectors(b1, BB, NB), THRESH,
            band_bits=BB, n_bands=NB,
        ).collect()
    }
    assert got_pairs == want_pairs
    assert len({(a, b) for a, b, _ in want_pairs}) >= corpus.count(), (
        "every planted twin must be found (plus any organic pairs)"
    )

    both = b1.unionAll(b2)
    got_index = {
        tuple(r) for r in
        spark.read.parquet(dirs["index"]).drop("epoch").collect()
    }
    want_index = {
        tuple(r) for r in sign_lsh_band_index(both, BB, NB).collect()
    }
    assert got_index == want_index
    got_vecs = {
        (r["vec_id"], tuple(r["v"]), r["nrm"])
        for r in spark.read.parquet(dirs["vectors"]).drop("epoch").collect()
    }
    want_vecs = {
        (r["vec_id"], tuple(r["v"]), r["nrm"])
        for r in sign_lsh_vectors(both, BB, NB).collect()
    }
    assert got_vecs == want_vecs

    # replay idempotency: re-running the LAST batch with the same
    # batch_id must leave all three outputs identical
    from cc_pyspark_spark.streaming.dedup import ingest_embedding_batch

    counts = {
        n: spark.read.parquet(dirs[n]).count()
        for n in ("index", "vectors", "pairs")
    }
    ingest_embedding_batch(
        b2, 1, dirs["index"], dirs["vectors"], dirs["pairs"], THRESH,
        band_bits=BB, n_bands=NB,
    )
    for n in ("index", "vectors", "pairs"):
        assert spark.read.parquet(dirs[n]).count() == counts[n], n
    replay_pairs = {
        (r["new_id"], r["old_id"], r["cos"])
        for r in spark.read.parquet(dirs["pairs"]).collect()
    }
    assert replay_pairs == want_pairs


def test_ingest_state_read_failures_propagate(spark, tmp_path):
    """Only a genuinely missing state path is a cold start; a corrupt
    state table must FAIL the batch (ADVICE r9) — silently treating it
    as cold start would skip pair emission while appending state,
    permanently losing near-dup pairs."""
    from cc_pyspark_spark.streaming.dedup import (
        _read_state,
        ingest_embedding_batch,
    )

    # missing path -> cold start
    assert _read_state(spark, str(tmp_path / "nope")) is None

    # corrupt parquet footer -> propagates
    bad = tmp_path / "index"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        _read_state(spark, str(bad))

    batch = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        ingest_embedding_batch(
            batch, 1, str(bad), str(tmp_path / "vecs"),
            str(tmp_path / "pairs"), 0.9, band_bits=4, n_bands=4,
        )
