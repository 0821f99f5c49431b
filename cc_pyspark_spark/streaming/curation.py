"""Streaming curation gates — continuous ingest filtering.

A training-data pipeline that ingests continuously (crawl deltas
landing as parquet files) wants its cheap gates applied AT INGEST, not
in a later batch sweep: documents a blocklist would drop should never
reach the dedup index or the packer. The blocklist gate is stateless
(one Aho-Corasick pass per document, functions/acmatch.py), so the
batch expression IS the streaming expression — no watermark, no state
store, no foreachBatch; Structured Streaming applies it per
micro-batch and the output is identical to the batch twin by
construction (pinned in tests/test_streaming_blocklist.py).

The stateful ingest paths (continuous dedup against a persisted index)
live in streaming/dedup.py; this module is the stateless tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.plans.text import BLOCKLIST_PHRASES, blocklist_annotate


def stream_documents(spark: SparkSession, docs_dir: str) -> DataFrame:
    """readStream over a documents parquet landing directory (schema
    inferred from the files already present, like stream_events)."""
    schema = spark.read.parquet(docs_dir).schema
    return spark.readStream.schema(schema).parquet(docs_dir)


def blocklist_gate_stream(
    docs: DataFrame,
    phrases: tuple[str, ...] = BLOCKLIST_PHRASES,
    drop_matched: bool = True,
) -> DataFrame:
    """Annotate a (possibly streaming) documents frame with blocklist
    hits; ``drop_matched`` keeps only clean rows (the ingest-gate
    mode — matched docs never reach downstream state)."""
    ann = blocklist_annotate(docs, phrases)
    if drop_matched:
        return ann.filter(F.col("n_hits") == 0).drop("n_hits", "hits")
    return ann


def classifier_gate_stream(
    docs: DataFrame,
    model: DataFrame,
    drop_negative: bool = True,
) -> DataFrame:
    """Quality-classifier ingest gate: score a (possibly streaming)
    documents frame with a TRAINED (feature_idx, mu, sd, weight) model
    table — the weights text_classifier_train produced offline. Like
    the blocklist gate this is stateless (broadcast model row +
    map-side fold, plans/text.py:classifier_score_frame), so streaming
    output is identical to the batch twin by construction;
    ``drop_negative`` keeps only predicted-quality rows so rejected
    documents never reach downstream state."""
    from cc_pyspark_spark.plans.text import classifier_score_frame

    scored = classifier_score_frame(docs, model)
    if drop_negative:
        return scored.filter(F.col("pred")).drop("pred")
    return scored


# --------------------------------------------- per-domain quota gate (r10)

#: Output schema of the quota gate — the documents-table shape.
_QUOTA_OUT = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def domain_quota_gate(stream, cap: int):
    """Streaming ADMISSION twin of the batch domain cap
    (plans/curation.py domain_cap_frame): admit at most ``cap``
    documents per source domain across the stream's LIFETIME, with the
    admitted count held in group state (applyInPandasWithState keyed by
    domain — the custom-stateful-operator API, NoTimeout state).

    Semantics differ from the batch cap by design and are documented:
    the batch cap RANKS (keep the best K per domain — needs the full
    set); the streaming gate is quota ADMISSION (first-come under a
    deterministic within-batch order: doc_id ascending), which is the
    only cap an unbounded stream can enforce. A replayed batch with the
    same rows admits the same prefix (state counts only move forward
    with admitted rows, and ordering is deterministic), pinned in the
    batch-parity pytest.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    def gate(key, pdfs, state):
        import pandas as pd  # noqa: PLC0415

        (n,) = state.get if state.exists else (0,)
        cols = ["doc_id", "text", "lang", "source", "n_chars"]
        # Concatenate BEFORE sorting: a group may arrive as several
        # Arrow chunks, and per-chunk sorting would admit chunk-1 rows
        # ahead of smaller doc_ids in chunk-2 — breaking the
        # deterministic within-batch admission order the replay
        # guarantee rests on.
        chunks = list(pdfs)
        batch = (
            pd.concat(chunks) if chunks else pd.DataFrame(columns=cols)
        )
        batch = batch.sort_values("doc_id")
        room = max(cap - n, 0)
        take = batch.iloc[:room]
        n += len(take)
        state.update((n,))
        yield (
            take[cols]
            if len(take)
            else pd.DataFrame({c: [] for c in cols})
        )

    return stream.groupBy("source").applyInPandasWithState(
        gate,
        outputStructType=_QUOTA_OUT,
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
