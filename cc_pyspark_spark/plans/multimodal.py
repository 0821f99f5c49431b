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


@register(
    "multimodal_decode_resize",
    oracle=None,  # pixel decode/resize has no SQL twin: rows-only check;
    # exact output bytes are pinned by tests/test_multimodal.py instead
    description="Real pixel pipeline over synthesized netpbm blobs: each "
    "doc's md5 bytes become a 4x3 P6 raster, decoded and nearest-"
    "neighbor-resized to 8x6 by numpy inside Arrow-batched mapInPandas "
    "(operators/multimodal.py decode_pixels/resize_nearest — no codec "
    "library, no shuffle); output is the resized raster's md5",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.multimodal import (  # noqa: PLC0415
        resize_images,
    )

    t = Catalog(spark, sf_dir)
    # 4x3 RGB raster = 36 bytes: three md5 digests (48 bytes) truncated.
    raster = F.substring(
        F.concat(
            F.unhex(F.md5(F.expr("encode(text, 'UTF-8')"))),
            F.unhex(F.md5(F.expr("encode(text || 'x', 'UTF-8')"))),
            F.unhex(F.md5(F.expr("encode(text || 'y', 'UTF-8')"))),
        ),
        1,
        36,
    )
    blobs = t.documents.select(
        F.col("doc_id").alias("blob_id"),
        F.concat(F.expr("encode('P6 4 3 255 ', 'UTF-8')"), raster).alias(
            "blob"
        ),
    )
    resized = resize_images(blobs, 8, 6)
    return resized.select(
        F.col("blob_id").alias("doc_id"),
        F.col("width").cast("bigint").alias("out_w"),
        F.col("height").cast("bigint").alias("out_h"),
        F.md5("resized").alias("resized_md5"),
    )


#: 44-byte RIFF/WAVE header for PCM16 mono @8000 Hz with a 32-byte data
#: chunk (16 frames) — precomputed constant, see operators/audio.py for
#: the field layout.
_WAV_HEADER_HEX = (
    "524946464400000057415645666D7420100000000100010040"
    "1F0000803E0000020010006461746120000000"
)


@register(
    "multimodal_audio_features",
    oracle=None,  # PCM decode has no SQL twin: rows-only check; values
    # are pinned by a Python replay in tests/test_audio_query.py
    description="Real audio pipeline over synthesized WAV blobs: each "
    "doc's md5 bytes become 16 PCM16 frames behind a RIFF header, "
    "decoded by operators/audio.py inside Arrow-batched mapInPandas; "
    "integer features only (peak / zero crossings / energy) so results "
    "are bit-exact with no float kernels",
    tags=("multimodal", "audio", "pandas-udf"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.audio import audio_features  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    data = F.concat(
        F.unhex(F.md5(F.expr("encode(text, 'UTF-8')"))),
        F.unhex(F.md5(F.expr("encode(text || 'x', 'UTF-8')"))),
    )
    blobs = t.documents.select(
        F.col("doc_id").alias("blob_id"),
        F.concat(F.unhex(F.lit(_WAV_HEADER_HEX)), data).alias("blob"),
    )
    feats = audio_features(blobs)
    return feats.select(
        F.col("blob_id").alias("doc_id"),
        F.col("sample_rate").cast("bigint").alias("sample_rate"),
        F.col("n_frames").alias("n_frames"),
        F.col("peak").cast("bigint").alias("peak"),
        F.col("zero_crossings").alias("zero_crossings"),
        F.col("energy").alias("energy"),
    )
