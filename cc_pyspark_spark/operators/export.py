"""Training-data export: the tail of the LLM-data pipeline.

Filter → dedup → shard → JSONL.gz is the canonical handoff format for
tokenizer/training jobs. `export_training_jsonl` is a thin declarative
composition: quality gating and dedup happen upstream as DataFrame
ops; the writer is Spark's JSON sink with gzip and deterministic
sharding (`repartitionByRange` on the id — stable shard contents for a
fixed input, unlike round-robin repartition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cc_pyspark_spark.operators.dedup import exact_dedup_keep_first


def export_training_jsonl(
    docs: DataFrame,
    output_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    n_shards: int = 4,
    extra_cols: list[str] | None = None,
) -> int:
    """Quality-gate, exact-dedup, and export documents as sharded
    JSONL.gz. Returns the number of exported documents."""
    from cc_pyspark_spark.functions.text import tokenize  # noqa: PLC0415

    n_tokens = F.size(tokenize(text_col))
    gated = docs.filter(
        (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    )
    deduped = exact_dedup_keep_first(gated, [text_col], id_col)
    cols = [id_col, text_col, *(extra_cols or [])]
    out = deduped.select(*cols).repartitionByRange(n_shards, F.col(id_col))
    out.write.mode("overwrite").option("compression", "gzip").json(output_dir)
    # count after write from the written data — the authoritative number
    return out.sparkSession.read.json(output_dir).count()
