"""Streaming deduplication — exactly-once record emission over a stream.

Two built-in strategies over a streaming DataFrame:

* `dedup_exact_stream` — `dropDuplicates` on a key: state holds every
  key seen since the stream started (unbounded — right for bounded key
  spaces like content hashes in a backfill window).
* `dedup_within_watermark` — `dropDuplicatesWithinWatermark`: state is
  bounded by the watermark, the right default for infinite streams
  where duplicates arrive close together (retries, at-least-once
  upstreams).

At 100 TB-of-stream scale the state store is RocksDB-backed
(`spark.sql.streaming.stateStore.providerClass`) and keys should be
content hashes (`md5(payload)`), not payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_exact_stream(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    return stream.dropDuplicates(key_cols)


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def simhash_col(text_col: str, n_bits: int = 32):
    """Row-local SimHash signature column — no explode, no groupBy.

    The batch operator (operators/dedup.py:simhash_signatures) computes
    the same sign-sum via explode + groupBy, which is the right batch
    plan (one shuffle, vectorized agg). Streams can't afford a stateful
    aggregation *before* the dedup operator (two stateful ops in one
    query), so here the whole signature folds inside the row with
    higher-order functions: distinct-token xxhash64 → per-bit sign sum
    → packed bigint. Entirely JVM-side, zero shuffle, zero state.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    from cc_pyspark_spark.functions.text import tokenize  # noqa: PLC0415

    hashes = F.transform(F.array_distinct(tokenize(text_col)), lambda t: F.xxhash64(t))

    def bit_sum(b):
        # closure capture: HOF merge lambdas must be exactly 2-arg
        return F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sig = None
    for b in range(n_bits):
        term = F.when(bit_sum(b) > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return sig


def neardup_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming near-duplicate suppression: first document with a given
    SimHash signature inside the watermark wins; later near-identical
    re-crawls/retries (same 32-bit signature = hamming-0 bucket) are
    dropped. State is signature-keyed and watermark-bounded."""
    sig = simhash_col(text_col)
    return (
        stream.withColumn("simhash", sig)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
    )


def incremental_index_stream(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous near-dup ingestion: each micro-batch of documents is
    (1) probed against the PERSISTED minhash band index of everything
    ingested before it — emitting (new_id, old_id) candidate pairs —
    and (2) banded and appended to that index. The streaming twin of
    the batch delta-dedup pattern (operators/dedup.py
    minhash_band_index + incremental_minhash_candidates, registered as
    dedup_minhash_delta): a crawl that lands continuously instead of in
    nightly increments keeps the same O(delta) probe cost per batch.

    foreachBatch rather than a stateful operator: the band index is
    relational state shared with BATCH consumers (the same parquet
    directory build_dedup_index writes and dedup_documents
    --dedup_method incremental_minhash probes), so it lives in the
    table layer, not the state store. Within-batch duplicates are the
    batch's own exact/near-dup step, exactly as in the batch delta
    semantics; exactly-once comes from the checkpointed batch id —
    BOTH outputs are per-epoch subdirectories written with
    mode("overwrite") (pairs under ``batch=<id>/``, bands under
    ``epoch=<id>/``), so a replayed batch rewrites exactly its own
    files and the index cannot grow across retries (r7 ADVICE: a
    plain append re-added duplicate band rows on replay — the epoch
    column only hid them from the replaying batch's own probe). The
    epoch partition column doubles as the probe guard: a batch probes
    only ``epoch < batch_id``.

    Returns the StreamingQuery (caller awaits/stops).
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        ingest_dedup_batch(
            batch, batch_id, index_dir, pairs_dir,
            id_col=id_col, text_col=text_col,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _read_state(spark, path: str):
    """Read a persisted state table, distinguishing a genuine cold start
    (missing path / no readable footers yet -> ``None``) from transient
    IO, permission, or corrupt-state failures, which MUST propagate and
    fail the streaming query — silently treating them as cold start
    would skip pair emission while still appending the batch's state,
    permanently losing near-dup pairs (ADVICE r9). Same error-class
    discrimination as streaming/windows.py's schema probe."""
    try:
        return spark.read.parquet(path)
    except Exception as ex:  # noqa: BLE001 — re-raised unless cold start
        probe = getattr(ex, "getCondition", None) or getattr(
            ex, "getErrorClass", None
        )
        marker = (probe() if probe else None) or str(ex)
        if any(
            tag in str(marker)
            for tag in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
        ):
            return None
        raise


def ingest_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of the continuous-dedup ingestion — module-level
    so the replay-idempotency contract is directly testable: calling it
    twice with the same ``batch_id`` must leave index and pair output
    byte-identical (every write is a per-epoch overwrite)."""
    import os  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    from cc_pyspark_spark.operators.dedup import (  # noqa: PLC0415
        incremental_minhash_candidates,
        minhash_band_index,
    )

    spark = batch.sparkSession
    if batch.isEmpty():
        return
    idx = _read_state(spark, index_dir)
    if idx is not None:
        # epoch guard: a replayed batch must not probe its own bands
        idx = idx.filter(F.col("epoch") < batch_id)
        pairs = incremental_minhash_candidates(
            batch, idx.drop("epoch"), id_col=id_col, text_col=text_col
        )
    else:
        pairs = None
    # per-batch pair directory: replay overwrites, never duplicates
    if pairs is not None:
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}")
        )
    # per-epoch subdirectory + overwrite == idempotent on replay;
    # parquet partition discovery surfaces `epoch` again on read
    bands = minhash_band_index(batch, id_col=id_col, text_col=text_col)
    bands.write.mode("overwrite").parquet(
        os.path.join(index_dir, f"epoch={batch_id}")
    )


def incremental_embedding_stream(
    stream: DataFrame,
    index_dir: str,
    vectors_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band_bits: int | None = None,
    n_bands: int | None = None,
    multiprobe: int = 0,
):
    """Continuous embedding near-dup ingestion — the streaming twin of
    the batch `dedup_embedding_delta` pattern (operators/dedup.py
    sign_lsh_band_index + sign_lsh_vectors +
    incremental_embedding_candidates), mirroring
    :func:`incremental_index_stream`'s minhash shape exactly: each
    micro-batch of embeddings is (1) probed against the PERSISTED
    sign-LSH band index of everything ingested before it — emitting
    verified (new_id, old_id, cos) pairs — and (2) appended to BOTH
    state tables: the (vec_id, band, bkey) band index and the
    (vec_id, v, nrm) vector table candidates verify against (norms
    precomputed at ingest, raw embeddings never rescanned).

    Same exactly-once discipline as the minhash twin (r7 ADVICE): every
    write is a per-epoch/per-batch subdirectory with mode("overwrite"),
    so a replayed batch rewrites exactly its own files; the epoch
    partition column doubles as the probe guard (`epoch < batch_id`),
    keeping a retry from probing its own bands. State lives in the
    table layer (shared with batch consumers), not the state store.

    Returns the StreamingQuery (caller awaits/stops).
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        ingest_embedding_batch(
            batch, batch_id, index_dir, vectors_dir, pairs_dir, threshold,
            id_col=id_col, vec_col=vec_col,
            band_bits=band_bits, n_bands=n_bands, multiprobe=multiprobe,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ingest_embedding_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    vectors_dir: str,
    pairs_dir: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band_bits: int | None = None,
    n_bands: int | None = None,
    multiprobe: int = 0,
) -> None:
    """One micro-batch of continuous embedding dedup — module-level so
    replay idempotency is directly testable (same contract as
    :func:`ingest_dedup_batch`): calling it twice with the same
    ``batch_id`` must leave index, vectors, and pair output identical.

    The batch's signature UDF runs once per state table (bands,
    vectors) plus once inside the probe — O(3·|delta|) Arrow work per
    batch, delta-sized and map-only, irrelevant next to the probe join.
    """
    import os  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    from cc_pyspark_spark.operators.dedup import (  # noqa: PLC0415
        SIGN_LSH_PROD_BAND_BITS,
        SIGN_LSH_PROD_BANDS,
        incremental_embedding_candidates,
        sign_lsh_band_index,
        sign_lsh_vectors,
    )

    bb = SIGN_LSH_PROD_BAND_BITS if band_bits is None else band_bits
    nb = SIGN_LSH_PROD_BANDS if n_bands is None else n_bands
    spark = batch.sparkSession
    if batch.isEmpty():
        return
    idx = _read_state(spark, index_dir)
    vecs = _read_state(spark, vectors_dir)
    if idx is not None and vecs is not None:
        # epoch guard: a replayed batch must not probe its own rows
        pairs = incremental_embedding_candidates(
            batch,
            idx.filter(F.col("epoch") < batch_id).drop("epoch"),
            vecs.filter(F.col("epoch") < batch_id).drop("epoch"),
            threshold,
            band_bits=bb,
            n_bands=nb,
            id_col=id_col,
            vec_col=vec_col,
            multiprobe=multiprobe,
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}")
        )
    # per-epoch subdirectory + overwrite == idempotent on replay
    sign_lsh_band_index(
        batch, bb, nb, id_col=id_col, vec_col=vec_col
    ).write.mode("overwrite").parquet(
        os.path.join(index_dir, f"epoch={batch_id}")
    )
    sign_lsh_vectors(
        batch, bb, nb, id_col=id_col, vec_col=vec_col
    ).write.mode("overwrite").parquet(
        os.path.join(vectors_dir, f"epoch={batch_id}")
    )
