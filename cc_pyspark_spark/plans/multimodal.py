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


def _resize_oracle() -> str:
    """Independent SQL replay of the 4x3→8x6 nearest-neighbor resize:
    the resized raster is a fixed byte REARRANGEMENT of the source
    (yi = r*src_h//dst_h, xi = c*src_w//dst_w — resize_nearest's exact
    index math), so the oracle concatenates the raster's hex pairs in
    resize order. DuckDB recomputes the pixels from md5(text) itself —
    nothing is fixture-pinned."""
    yi = [(r * 3) // 6 for r in range(6)]
    xi = [(c * 4) // 8 for c in range(8)]
    idxs = [
        (yi[r] * 4 + xi[c]) * 3 + ch
        for r in range(6)
        for c in range(8)
        for ch in range(3)
    ]
    terms = ",".join(f"substr(rh, {2 * i + 1}, 2)" for i in idxs)
    return f"""
WITH r AS (
  SELECT doc_id,
         substr(md5(text)||md5(text||'x')||md5(text||'y'), 1, 72) AS rh
  FROM documents
)
SELECT doc_id,
       CAST(8 AS BIGINT) AS out_w,
       CAST(6 AS BIGINT) AS out_h,
       concat({terms}) AS resized_hex
FROM r
"""


#: Fixed GIF scaffolding for the decode_resize fixture: a 4x3 GIF89a
#: whose 16-entry global color table starts with the 36 raster bytes
#: (entries 12-15 pad with zeros) and whose pixel indices are the
#: constant sequence 0..11 — so decoded RGB == the raster bytes, the
#: same pixels the P6 branch yields, and the oracle is format-blind.
#: The LZW data block is the constant code stream
#: [CLEAR, 0..11, EOI] packed LSB-first at 5-bit width (table stays
#: below 32 entries, so the width never grows): 9 bytes.
_GIF_PREFIX = b"GIF89a" + bytes.fromhex("04000300830000")  # 4x3, GCT 16
_GIF_LZW_TAIL = bytes.fromhex("10043148310725b522")
_GIF_SUFFIX = (
    b"\x00" * 12  # color-table entries 12..15 (unused)
    + b"\x2c" + bytes.fromhex("000000000400030000")  # descriptor 4x3
    + bytes([4])  # LZW min code size
    + bytes([len(_GIF_LZW_TAIL)]) + _GIF_LZW_TAIL
    + b"\x00\x3b"  # block terminator + trailer
)


@register(
    "multimodal_decode_resize",
    oracle=_resize_oracle(),
    description="Real pixel pipeline over synthesized image blobs: each "
    "doc's md5 bytes become a 4x3 raster, shipped as a P6 netpbm blob "
    "(even doc_id) or an LZW-compressed GIF89a whose palette carries the "
    "raster (odd doc_id) — decoded (incl. real pure-Python GIF LZW) and "
    "nearest-neighbor-resized to 8x6 by numpy inside Arrow-batched "
    "mapInPandas (operators/multimodal.py decode_pixels/resize_nearest — "
    "no codec library, no shuffle); output is the resized raster as hex, "
    "which the DuckDB oracle recomputes independently as a hex-pair "
    "rearrangement of the md5-derived source raster, identical for both "
    "container formats",
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
    p6 = F.concat(F.expr("encode('P6 4 3 255 ', 'UTF-8')"), raster)
    gif = F.concat(F.lit(_GIF_PREFIX), raster, F.lit(_GIF_SUFFIX))
    blobs = t.documents.select(
        F.col("doc_id").alias("blob_id"),
        F.when(F.col("doc_id") % 2 == 1, gif).otherwise(p6).alias("blob"),
    )
    resized = resize_images(blobs, 8, 6)
    return resized.select(
        F.col("blob_id").alias("doc_id"),
        F.col("width").cast("bigint").alias("out_w"),
        F.col("height").cast("bigint").alias("out_h"),
        F.lower(F.hex("resized")).alias("resized_hex"),
    )


#: 44-byte RIFF/WAVE header for PCM16 mono @8000 Hz with a 32-byte data
#: chunk (16 frames) — precomputed constant, see operators/audio.py for
#: the field layout.
_WAV_HEADER_HEX = (
    "524946464400000057415645666D7420100000000100010040"
    "1F0000803E0000020010006461746120000000"
)


#: Independent SQL replay of the PCM16 decode + integer features: the
#: 32 data bytes come from md5 hex, each little-endian int16 sample is
#: rebuilt with nibble arithmetic (strpos over a hex alphabet), and
#: peak/energy/zero-crossings are plain SQL aggregates — DuckDB
#: recomputes everything from text, nothing fixture-pinned.
_AUDIO_ORACLE = """
WITH h AS (SELECT doc_id, md5(text)||md5(text||'x') AS hx FROM documents),
s AS (
  SELECT doc_id, i,
    (strpos('0123456789abcdef', substr(hx, 4*i+1, 1))-1)*16
      + (strpos('0123456789abcdef', substr(hx, 4*i+2, 1))-1)
      + 256*((strpos('0123456789abcdef', substr(hx, 4*i+3, 1))-1)*16
      + (strpos('0123456789abcdef', substr(hx, 4*i+4, 1))-1)) AS u
  FROM h, (SELECT unnest(range(0, 16)) AS i)
),
v AS (
  SELECT doc_id, i, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS x
  FROM s
),
nz AS (
  SELECT doc_id, SIGN(x) AS sg,
         LAG(SIGN(x)) OVER (PARTITION BY doc_id ORDER BY i) AS prev_sg
  FROM v WHERE x <> 0
),
zc AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN prev_sg IS NOT NULL AND sg <> prev_sg
                       THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
  FROM nz GROUP BY doc_id
),
pe AS (
  SELECT doc_id,
         CAST(MAX(ABS(x)) AS BIGINT) AS peak,
         CAST(SUM(CAST(x AS BIGINT)*x) AS BIGINT) AS energy
  FROM v GROUP BY doc_id
)
SELECT pe.doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(16 AS BIGINT) AS n_frames,
       pe.peak,
       COALESCE(zc.zero_crossings, 0) AS zero_crossings,
       pe.energy
FROM pe LEFT JOIN zc ON pe.doc_id = zc.doc_id
"""


@register(
    "multimodal_audio_features",
    oracle=_AUDIO_ORACLE,
    description="Real audio pipeline over synthesized WAV blobs: each "
    "doc's md5 bytes become 16 PCM16 frames behind a RIFF header, "
    "decoded by operators/audio.py inside Arrow-batched mapInPandas; "
    "integer features only (peak / zero crossings / energy) so results "
    "are bit-exact with no float kernels. The DuckDB oracle rebuilds "
    "the int16 samples from md5 hex with nibble arithmetic and "
    "re-aggregates — fully independent of the Python decoder",
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


def _ahash_oracle() -> str:
    """Independent SQL replay of the aHash: raster bytes from md5 hex
    (nibble arithmetic), integer grayscale, strict cross-multiplied
    mean threshold — nothing fixture-pinned, identical for both
    container formats since decode yields the same raster."""
    nib = (
        "(strpos('0123456789abcdef', substr(rh, {k}, 1)) - 1)"
    )

    def byte(off):  # hex pair at byte offset `off` (0-based)
        return f"({nib.format(k=f'2*({off})+1')}*16 + {nib.format(k=f'2*({off})+2')})"

    return f"""
WITH r AS (
  SELECT doc_id,
         substr(md5(text)||md5(text||'x')||md5(text||'y'), 1, 72) AS rh
  FROM documents
), g AS (
  SELECT doc_id, p.p AS p,
         ({byte('3*p.p')} + {byte('3*p.p+1')} + {byte('3*p.p+2')}) // 3 AS gv
  FROM r, (SELECT unnest(range(0, 12)) AS p) p
), t AS (
  SELECT doc_id, CAST(SUM(gv) AS BIGINT) AS tot FROM g GROUP BY doc_id
), hsh AS (
  SELECT g.doc_id,
         CAST(SUM(CASE WHEN gv * 12 > tot THEN 1 << p ELSE 0 END) AS BIGINT)
           AS phash
  FROM g JOIN t ON g.doc_id = t.doc_id GROUP BY g.doc_id
)
SELECT doc_id, phash, CAST(12 AS BIGINT) AS n_pixels,
       CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same
FROM hsh
"""


@register(
    "multimodal_image_phash",
    oracle=_ahash_oracle(),
    description="Perceptual image hashing (average-hash) over REAL "
    "decoded pixels — the image near-dup primitive beside the text "
    "fingerprints: the same md5-derived 4x3 rasters ship as P6 netpbm "
    "(even doc_id) or LZW GIF89a (odd), decode through the pure-Python "
    "codecs in Arrow-batched mapInPandas, and hash by the INTEGER aHash "
    "rule (grayscale (r+g+b) div 3; bit i iff g_i*n > sum g — strict "
    "cross-multiplication, no float mean), so container format doesn't "
    "change the hash and a plain hash-groupBy dedups re-encodes with "
    "zero pairwise work. n_same counts hash-identical images. The "
    "DuckDB oracle recomputes pixels AND hash from md5 hex nibble "
    "arithmetic — independent of every codec under test",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W  # noqa: PLC0415

    from cc_pyspark_spark.operators.multimodal import image_ahash  # noqa: PLC0415

    t = Catalog(spark, sf_dir)
    raster = F.substring(
        F.concat(
            F.unhex(F.md5(F.expr("encode(text, 'UTF-8')"))),
            F.unhex(F.md5(F.expr("encode(text || 'x', 'UTF-8')"))),
            F.unhex(F.md5(F.expr("encode(text || 'y', 'UTF-8')"))),
        ),
        1,
        36,
    )
    p6 = F.concat(F.expr("encode('P6 4 3 255 ', 'UTF-8')"), raster)
    gif = F.concat(F.lit(_GIF_PREFIX), raster, F.lit(_GIF_SUFFIX))
    blobs = t.documents.select(
        F.col("doc_id").alias("blob_id"),
        F.when(F.col("doc_id") % 2 == 1, gif).otherwise(p6).alias("blob"),
    )
    hashed = image_ahash(blobs)
    return hashed.select(
        F.col("blob_id").alias("doc_id"),
        "phash",
        "n_pixels",
        F.count("*").over(W.partitionBy("phash")).cast("bigint").alias("n_same"),
    )


def _ahash_pairs_oracle() -> str:
    """All-pairs hamming over the SQL-recomputed hashes — the
    structurally different formulation (no banding), so agreement
    cross-checks the pigeonhole algorithm, not just the hash."""
    return f"""
WITH hsh AS (
  SELECT doc_id, phash FROM ({_ahash_oracle()})
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hdist
FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 1
"""


@register(
    "multimodal_image_neardup",
    oracle=_ahash_pairs_oracle(),
    description="Image NEAR-dup pairs within Hamming distance 1 of the "
    "perceptual hash — aHash catches exact perceptual matches, this "
    "catches one-bit drift (slight brightness shifts flipping one "
    "threshold bit): the 12-bit hash splits into two 6-bit chunks, any "
    "hamming<=1 pair agrees on a whole chunk (pigeonhole — GUARANTEED "
    "recall, the simhash_pairs discipline applied to images), so "
    "candidates shuffle on chunk values and only colliding pairs are "
    "verified with bit_count(xor). The oracle computes the SAME pairs "
    "all-pairs with no banding, so agreement cross-checks the "
    "pigeonhole algorithm itself. At production 64-bit aHash: 4 x "
    "16-bit chunks, d<=3 (exactly dedup_simhash_pairs' geometry)",
    tags=("multimodal", "dedup"),
)
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashed = multimodal_image_phash(spark, sf_dir).select("doc_id", "phash")
    chunks = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.col("phash").bitwiseAND(F.lit(63)).alias("key"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.shiftrightunsigned("phash", 6)
                    .bitwiseAND(F.lit(63))
                    .alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hdist",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("bigint"),
        )
        .filter(F.col("hdist") <= 1)
        .select("a_id", "b_id", "hdist")
    )
