"""Multimodal binary-column queries (plumbing over opaque blobs).

The `documents` table stands in for a blob store: `encode(text)` makes
a real `binary` column, and the query computes blob-level stats the way
an image/audio pipeline would before decoding — byte length, content
hash, magic-prefix sniff. The decode stage itself (stubbed, no codec
libs in the container) lives in operators/multimodal.py with its own
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_pyspark_spark.catalog import Catalog
from cc_pyspark_spark.plans.registry import register


@register(
    "multimodal_blob_stats",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS blob_md5,
       substr(text, 1, 4) AS magic
FROM documents
""",
    description="Binary-column plumbing: blob byte length, content hash, "
    "magic-prefix sniff over an encoded binary column (pre-decode stage of "
    "a multimodal pipeline)",
    tags=("multimodal",),
)
def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Catalog(spark, sf_dir)
    blob = F.expr("encode(text, 'UTF-8')")
    return t.documents.select(
        "doc_id",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.md5(blob).alias("blob_md5"),
        F.substring("text", 1, 4).alias("magic"),
    )
