"""Multimodal column plumbing: opaque binary blobs + typed metadata.

Design (beyond-reference, 100 TB LLM-pipeline): image/audio/video
payloads travel as `binary` columns with a metadata struct next to
them; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages so each task processes a columnar
batch of blobs without per-row Python overhead.

The actual codec step is STUBBED: the container ships no image/audio
libraries, so `decode_image_batch` raises unless `fake=True`, which
produces a deterministic fake decode (dimensions + checksum derived
from the bytes). The Spark-side plumbing — schema, batch shape, UDF
signature, partition behavior — is real and tested; swapping in
Pillow/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Output schema of the decode stage: pass-through key + typed metadata.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a real image decode."""
    digest = hashlib.md5(blob).hexdigest()
    return {
        "n_bytes": len(blob),
        "format": "fake/raw",
        "width": 1 + len(blob) % 640,
        "height": 1 + int(digest[:4], 16) % 480,
        "checksum": digest,
    }


def decode_image_batch(blobs: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Decode one Arrow batch of image blobs → metadata frame.

    Real implementation requires an image library (not bundled):
    replace the body with e.g. PIL.Image.open per blob. `fake=True`
    yields the deterministic stub used by tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library (e.g. Pillow); "
            "not bundled in this environment — pass fake=True for the "
            "deterministic stub"
        )
    return pd.DataFrame([_fake_decode(b) for b in blobs])


def decode_images(blobs_df: DataFrame, id_col: str = "blob_id",
                  blob_col: str = "blob", fake: bool = False) -> DataFrame:
    """DataFrame of (id, binary blob) → decoded-metadata DataFrame.

    mapInPandas keeps the blob bytes inside the Arrow batch (no per-row
    pickling); partitioning is inherited from the input, so colocating
    blobs by storage file keeps the decode stage shuffle-free.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = decode_image_batch(pdf[blob_col], fake=fake)
            out.insert(0, "blob_id", pdf[id_col].values)
            yield out

    return blobs_df.mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    blobs_df: DataFrame,
    width: int,
    height: int,
    id_col: str = "blob_id",
    blob_col: str = "blob",
    fake: bool = False,
) -> DataFrame:
    """Resize stage (stub codec): real impl swaps `_fake_resize` for a
    PIL `Image.resize`; the Spark plumbing — Arrow batches in, binary
    column out, no shuffle — is the deliverable."""

    def _fake_resize(blob: bytes) -> bytes:
        # deterministic stand-in: truncate/pad to width*height bytes
        target = width * height
        return (blob * (target // max(len(blob), 1) + 1))[:target]

    if not fake:
        raise NotImplementedError(
            "image resize requires an image library (e.g. Pillow); "
            "pass fake=True for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "blob_id": pdf[id_col].values,
                    "width": width,
                    "height": height,
                    "resized": [_fake_resize(b) for b in pdf[blob_col]],
                }
            )

    return blobs_df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    blobs_df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "blob_id",
    blob_col: str = "blob",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling (1 video blob → N frame rows) — the U2-shaped
    multimodal expansion. Stub slices the byte stream at fixed strides;
    a real impl swaps in ffmpeg keyframe extraction. Row expansion
    happens inside the Arrow batch (mapInPandas), so output partitioning
    inherits the blob partitioning — no shuffle."""
    if not fake:
        raise NotImplementedError(
            "frame sampling requires a video library (e.g. ffmpeg); "
            "pass fake=True for the deterministic stub"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                for i in range(min(max_frames, max(len(blob), 1) // every_n_bytes + 1)):
                    rows.append(
                        {
                            "blob_id": bid,
                            "frame_idx": i,
                            "frame": blob[i * every_n_bytes : (i + 1) * every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=["blob_id", "frame_idx", "frame"])

    return blobs_df.mapInPandas(run, FRAME_SCHEMA)
