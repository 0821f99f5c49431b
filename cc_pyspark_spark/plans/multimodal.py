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


# ---------------------------------------------------------------------------
# Container probe (r9): synthesized MP4 / MP3 blobs -> structural
# metadata via the generic box/frame walkers in operators/multimodal.py.


def _bmff_box(typ: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + typ + body


def _bmff_trak(handler: bytes) -> bytes:
    # trak { mdia { hdlr } }: ver/flags + predefined (8 zero bytes),
    # handler fourcc, 12 reserved, empty null-terminated name.
    hdlr = _bmff_box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"\x00")
    return _bmff_box(b"trak", _bmff_box(b"mdia", hdlr))


_FTYP = _bmff_box(b"ftyp", b"isom" + (0x200).to_bytes(4, "big") + b"isommp42")
_TRAK_V = _bmff_trak(b"vide")
_TRAK_S = _bmff_trak(b"soun")
#: mvhd v0 up to (but excluding) the 4-byte timescale: size+type,
#: version/flags, creation/modification times.
_MVHD_PRE = (108).to_bytes(4, "big") + b"mvhd" + b"\x00" * 12
#: mvhd v0 after the 4-byte duration: rate/volume/reserved/matrix/
#: predefined/next-track-id (zeros are structurally valid).
_MVHD_TAIL = b"\x00" * 80
_FREE = _bmff_box(b"free", b"\x00" * 8)
#: moov headers for the 1- and 2-track variants (mvhd is 108 bytes,
#: each trak 49).
_MOOV1 = (8 + 108 + 49).to_bytes(4, "big") + b"moov"
_MOOV2 = (8 + 108 + 98).to_bytes(4, "big") + b"moov"
#: mdat uses the size==1 + 64-bit largesize encoding so the probe's
#: largesize path is exercised on every even doc.
_MDAT_PRE = (1).to_bytes(4, "big") + b"mdat"

#: One MPEG1 Layer III 128 kbps frame per sample rate: 4-byte header +
#: zero filler to the exact frame length 144*128000//rate (417/384/576).
_MP3_FRAME = {
    44100: bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 413,
    48000: bytes([0xFF, 0xFB, 0x94, 0x00]) + b"\x00" * 380,
    32000: bytes([0xFF, 0xFB, 0x98, 0x00]) + b"\x00" * 572,
}

#: Independent SQL replay: DuckDB re-derives the fixture parameters
#: (u1/u2/u3 md5 nibbles) and computes every metadata column with plain
#: integer arithmetic — it never builds or parses a blob, so a parser
#: that misreads its own container cannot agree with the oracle.
_CONTAINER_ORACLE = """
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
u AS (
  SELECT doc_id,
    ((strpos('0123456789abcdef', substr(hx,1,1))-1)*4096
     + (strpos('0123456789abcdef', substr(hx,2,1))-1)*256
     + (strpos('0123456789abcdef', substr(hx,3,1))-1)*16
     + (strpos('0123456789abcdef', substr(hx,4,1))-1)) AS u1,
    (strpos('0123456789abcdef', substr(hx,5,1))-1) AS u2,
    (strpos('0123456789abcdef', substr(hx,6,1))-1) AS u3
  FROM h
),
p AS (
  SELECT doc_id,
         doc_id % 2 = 0 AS is4,
         CASE u2 % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000 ELSE 90000 END AS ts4,
         1 + ((u1 * 131) % 3600000) AS dur4,
         1 + (u3 % 2) AS trk4,
         1 + (u3 % 16) AS plen4,
         CASE u2 % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS sr3,
         1 + (u1 % 12) AS nf3
  FROM u
)
SELECT doc_id,
  CASE WHEN is4 THEN 'mp4' ELSE 'mp3' END AS container,
  CASE WHEN is4 THEN 'isom' END AS major_brand,
  CAST(CASE WHEN is4 THEN trk4 ELSE 1 END AS BIGINT) AS n_tracks,
  CASE WHEN is4 THEN (CASE WHEN trk4 = 2 THEN 'vide,soun' ELSE 'vide' END)
       ELSE 'soun' END AS handlers,
  CAST(CASE WHEN is4 THEN ts4 ELSE sr3 END AS BIGINT) AS timescale,
  CAST(CASE WHEN is4 THEN dur4 ELSE nf3 * 1152 END AS BIGINT)
    AS duration_units,
  CAST(CASE WHEN is4 THEN (dur4 * 1000) // ts4
       ELSE (nf3 * 1152 * 1000) // sr3 END AS BIGINT) AS duration_ms,
  CAST(CASE WHEN is4 THEN plen4
       ELSE nf3 * (144 * 128000 // sr3) END AS BIGINT) AS payload_bytes
FROM p
"""


@register(
    "multimodal_container_probe",
    oracle=_CONTAINER_ORACLE,
    description="No-decode structural probe over synthesized video/audio "
    "containers — the routing stage of a 100 TB multimodal ingest. Each "
    "even doc becomes a real ISO-BMFF blob (ftyp + moov{mvhd + 1-2 trak/"
    "mdia/hdlr} + free + largesize mdat; timescale/duration/track-count/"
    "payload derived from md5 nibbles), each odd doc a real MPEG1 Layer "
    "III stream (1-12 whole frames at 44.1/48/32 kHz, header-driven "
    "frame lengths). operators/multimodal.py probe_containers sniffs "
    "magic and walks box tree / frame chain inside one Arrow-batched "
    "mapInPandas (map-only, no shuffle); the DuckDB oracle re-derives "
    "all metadata analytically from the same md5 nibbles without ever "
    "constructing a blob",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_container_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.multimodal import (  # noqa: PLC0415
        probe_containers,
    )

    t = Catalog(spark, sf_dir)
    h = F.md5(F.expr("encode(text, 'UTF-8')"))

    def nib(i: int, n: int) -> "F.Column":
        return F.conv(F.substring(h, i, n), 16, 10).cast("long")

    d = (
        t.documents.select(
            "doc_id",
            nib(1, 4).alias("u1"),
            nib(5, 1).alias("u2"),
            nib(6, 1).alias("u3"),
            F.md5(F.expr("encode(text || 'm', 'UTF-8')")).alias("hm"),
        )
        .withColumn("ts", F.element_at(F.lit([600, 1000, 90000]), (F.col("u2") % 3 + 1).cast("int")).cast("long"))
        .withColumn("dur", (1 + (F.col("u1") * 131) % 3600000).cast("long"))
        .withColumn("ntrk", (1 + F.col("u3") % 2).cast("long"))
        .withColumn("plen", (1 + F.col("u3") % 16).cast("long"))
        .withColumn("sr", F.element_at(F.lit([44100, 48000, 32000]), (F.col("u2") % 3 + 1).cast("int")).cast("long"))
        .withColumn("nf", (1 + F.col("u1") % 12).cast("long"))
        .withColumn("flen", F.element_at(F.lit([417, 384, 576]), (F.col("u2") % 3 + 1).cast("int")).cast("long"))
    )

    def be(col: str, width: int) -> "F.Column":
        return F.unhex(F.lpad(F.hex(F.col(col)), 2 * width, "0"))

    mvhd = F.concat(F.lit(_MVHD_PRE), be("ts", 4), be("dur", 4), F.lit(_MVHD_TAIL))
    moov = F.when(
        F.col("ntrk") == 2,
        F.concat(F.lit(_MOOV2), mvhd, F.lit(_TRAK_V + _TRAK_S)),
    ).otherwise(F.concat(F.lit(_MOOV1), mvhd, F.lit(_TRAK_V)))
    mdat = F.concat(
        F.lit(_MDAT_PRE),
        F.unhex(F.lpad(F.hex(F.col("plen") + 16), 16, "0")),
        F.expr("substring(unhex(hm), 1, cast(plen as int))"),
    )
    mp4 = F.concat(F.lit(_FTYP), moov, F.lit(_FREE), mdat)
    mp3 = F.expr(
        "substring(CASE WHEN u2 % 3 = 0 THEN m44 WHEN u2 % 3 = 1 THEN m48 "
        "ELSE m32 END, 1, cast(nf * flen as int))"
    )
    blobs = (
        d.withColumn("m44", F.lit(_MP3_FRAME[44100] * 12))
        .withColumn("m48", F.lit(_MP3_FRAME[48000] * 12))
        .withColumn("m32", F.lit(_MP3_FRAME[32000] * 12))
        .select(
            F.col("doc_id").alias("blob_id"),
            F.when(F.col("doc_id") % 2 == 0, mp4).otherwise(mp3).alias("blob"),
        )
    )
    return probe_containers(blobs).select(
        F.col("blob_id").alias("doc_id"),
        "container",
        "major_brand",
        "n_tracks",
        "handlers",
        "timescale",
        "duration_units",
        "duration_ms",
        "payload_bytes",
    )


# ---------------------------------------------------------------------------
# WebDataset tar-shard indexing (r10): multimodal training corpora ship
# as tar shards whose members group into samples by name prefix
# ({key}.txt, {key}.cls, {key}.jpg ...). Indexing the shards — member
# names, sizes, sample counts — is the first pass of every loader and
# curation job over such data. The shard fixture is built executor-side
# from `documents` (applyInPandas per shard, stdlib tarfile, fixed
# mtime) and the index walks headers with the hand-rolled parser in
# operators/multimodal.py tar_members — two independent implementations
# — while the DuckDB oracle recomputes every aggregate analytically
# from `documents` without ever touching a tar byte.

_TAR_SHARDS = 25


@register(
    "multimodal_tar_index",
    oracle=f"""
WITH m AS (
  SELECT doc_id % {_TAR_SHARDS} AS shard_id,
         lpad(CAST(doc_id AS VARCHAR), 8, '0') AS key,
         CAST(strlen(text) AS BIGINT) AS tlen,
         CAST(strlen(lang) AS BIGINT) AS llen
  FROM documents
), mem AS (
  SELECT shard_id, key, key || '.txt' AS name, tlen AS size FROM m
  UNION ALL
  SELECT shard_id, key, key || '.cls', llen FROM m
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(DISTINCT key) AS BIGINT) AS n_samples,
       CAST(SUM(size) AS BIGINT) AS total_payload,
       md5(string_agg(name, ',' ORDER BY name)) AS names_md5
FROM mem GROUP BY shard_id
""",
    description="WebDataset shard indexing: documents pack into "
    f"{_TAR_SHARDS} USTAR tar shards of ({{key}}.txt, {{key}}.cls) "
    "sample members (executor-side applyInPandas build, stdlib writer, "
    "deterministic bytes), then the hand-rolled 512-byte header walk "
    "(operators/multimodal.py tar_members — O(members) offset "
    "arithmetic, map-only, never the stdlib reader) lists every member "
    "and the index aggregates per shard: member/sample counts, payload "
    "bytes, and an md5 over the sorted member names. The oracle "
    "recomputes all of it analytically from `documents` without "
    "building or parsing a single tar byte",
    tags=("multimodal", "pandas-udf", "source"),
)
def multimodal_tar_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: PLC0415

    from cc_pyspark_spark.operators.multimodal import tar_members  # noqa: PLC0415

    t = Catalog(spark, sf_dir)

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import io  # noqa: PLC0415
        import tarfile  # noqa: PLC0415

        pdf = pdf.sort_values("doc_id")
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for r in pdf.itertuples(index=False):
                key = f"{int(r.doc_id):08d}"
                for ext, payload in (
                    ("txt", str(r.text).encode("utf-8")),
                    ("cls", str(r.lang).encode("utf-8")),
                ):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(payload))
        return pd.DataFrame(
            [{"shard_id": int(pdf["shard"].iloc[0]), "blob": buf.getvalue()}]
        )

    shards = (
        t.documents.select(
            "doc_id",
            "text",
            "lang",
            (F.col("doc_id") % _TAR_SHARDS).cast("long").alias("shard"),
        )
        .groupBy("shard")
        .applyInPandas(build, "shard_id long, blob binary")
    )
    members = tar_members(shards)
    return members.groupBy("shard_id").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.countDistinct(F.split(F.col("name"), "[.]").getItem(0))
        .cast("bigint")
        .alias("n_samples"),
        F.sum("size").cast("bigint").alias("total_payload"),
        F.md5(
            F.expr("encode(concat_ws(',', array_sort(collect_list(name))), 'UTF-8')")
        ).alias("names_md5"),
    )


# ---------------------------------------------------------------------------
# ZIP probe (r10): the random-access counterpart of the tar index —
# ZIP's end-anchored central directory is why data bundles that need
# per-member random access ship as zip. Blobs are REAL zip archives
# (stored method, genuine CRC32s via F.crc32) built as pure Catalyst
# byte expressions from `documents` — same discipline as the ISO-BMFF
# fixture above — and the probe walks EOCD -> central directory only.
# The oracle recomputes member names, sizes, and every OFFSET
# analytically (fixed header arithmetic), so a probe that misreads its
# own little-endian fields cannot agree with it.


def _le(col: F.Column, width: int) -> F.Column:
    """Integer column -> little-endian `width`-byte binary."""
    parts = [
        F.unhex(
            F.lpad(
                F.hex((col / F.lit(256 ** i)).cast("long") % 256), 2, "0"
            )
        )
        for i in range(width)
    ]
    return F.concat(*parts)


def zip_fixture_blobs(documents: DataFrame) -> DataFrame:
    """(blob_id, blob) REAL two-member stored zips derived from a
    documents frame — pure Catalyst byte expressions, genuine CRC32s
    (stdlib-zipfile interop pinned in tests)."""
    d = documents.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.expr("encode(text, 'UTF-8')")), 1, 2), 16, 10)
            .cast("long")
            % 32
            + 1
        ).alias("l1"),
        F.expr("encode(text, 'UTF-8')").alias("tb"),
        F.expr("encode(lang, 'UTF-8')").alias("lb"),
    ).select(
        "doc_id",
        # clamp the declared size to the ACTUAL payload length: a
        # document shorter than 32 bytes would otherwise declare more
        # bytes than substring() yields, desynchronizing every
        # downstream offset (lho2, cd_off, EOCD) from the real blob
        # bytes (mirrored by least(..., strlen(text)) in the oracle)
        F.least(F.col("l1"), F.length("tb")).alias("l1"),
        F.expr(
            "substring(tb, 1, cast(least(l1, length(tb)) as int))"
        ).alias("d1"),
        F.col("lb").alias("d2"),
    )

    def lfh(name: bytes, data_col: str, len_col: F.Column) -> F.Column:
        return F.concat(
            F.lit(b"PK\x03\x04"),
            F.lit((20).to_bytes(2, "little") + b"\x00\x00\x00\x00"),
            F.lit(b"\x00\x00\x21\x00"),  # modtime 0, moddate 0x21
            _le(F.crc32(F.col(data_col)), 4),
            _le(len_col, 4),
            _le(len_col, 4),
            F.lit(len(name).to_bytes(2, "little") + b"\x00\x00"),
            F.lit(name),
            F.col(data_col),
        )

    def cde(name: bytes, data_col: str, len_col: F.Column, lho: F.Column) -> F.Column:
        return F.concat(
            F.lit(b"PK\x01\x02"),
            F.lit((20).to_bytes(2, "little") * 2 + b"\x00\x00\x00\x00"),
            F.lit(b"\x00\x00\x21\x00"),
            _le(F.crc32(F.col(data_col)), 4),
            _le(len_col, 4),
            _le(len_col, 4),
            F.lit(len(name).to_bytes(2, "little") + b"\x00" * 12),
            _le(lho, 4),
            F.lit(name),
        )

    l1 = F.col("l1").cast("long")
    l2 = F.lit(2).cast("long")
    lho2 = (F.lit(35) + l1).cast("long")  # 30 + len('a.txt') + l1
    cd_off = (lho2 + F.lit(37)).cast("long")  # + 30 + 5 + 2
    cd_size = F.lit(46 + 5 + 46 + 5).cast("long")
    eocd = F.concat(
        F.lit(b"PK\x05\x06" + b"\x00" * 4),
        F.lit((2).to_bytes(2, "little") * 2),
        _le(cd_size, 4),
        _le(cd_off, 4),
        F.lit(b"\x00\x00"),
    )
    blobs = d.select(
        F.col("doc_id").alias("blob_id"),
        F.concat(
            lfh(b"a.txt", "d1", l1),
            lfh(b"b.cls", "d2", l2),
            cde(b"a.txt", "d1", l1, F.lit(0).cast("long")),
            cde(b"b.cls", "d2", l2, lho2),
            eocd,
        ).alias("blob"),
    )
    return blobs


@register(
    "multimodal_zip_probe",
    oracle="""
WITH h AS (
  SELECT doc_id,
         least(((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1)) % 32
           + 1, strlen(text)) AS l1
  FROM documents
), m AS (
  SELECT doc_id, 'a.txt' AS name, CAST(0 AS INTEGER) AS method,
         CAST(l1 AS BIGINT) AS usize, CAST(0 AS BIGINT) AS lho
  FROM h
  UNION ALL
  SELECT doc_id, 'b.cls', 0, 2, CAST(30 + 5 + l1 AS BIGINT) FROM h
)
SELECT doc_id, name, method, usize, lho FROM m
""",
    description="ZIP central-directory probe: each document becomes a "
    "REAL two-member stored-method zip (a.txt = an md5-nibble-sized "
    "text prefix, b.cls = the lang code; genuine CRC32s via F.crc32; "
    "headers assembled as pure Catalyst little-endian byte "
    "expressions), and the probe does what real tooling does — scan "
    "back for EOCD, walk ONLY the 46-byte central-directory entries — "
    "O(members), never O(bytes), the random-access property that "
    "distinguishes zip from tar. The oracle recomputes names, sizes, "
    "and every local-header OFFSET analytically from the fixed header "
    "arithmetic, so endianness or offset bugs in the walker break the "
    "value hash",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_zip_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_pyspark_spark.operators.multimodal import (  # noqa: PLC0415
        zip_central_directory,
    )

    t = Catalog(spark, sf_dir)
    blobs = zip_fixture_blobs(t.documents)
    return zip_central_directory(blobs).select(
        F.col("blob_id").alias("doc_id"),
        "name",
        "method",
        "usize",
        "lho",
    )
