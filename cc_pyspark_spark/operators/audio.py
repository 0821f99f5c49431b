"""Audio-column plumbing: WAV/PCM decode + features, pure numpy.

Same design as the image tier (operators/multimodal.py): blobs travel
as `binary` columns; decode / feature-extract / window-sample run as
Arrow-batched `mapInPandas` stages. Unlike compressed codecs, RIFF/WAVE
PCM needs no external library — the header walk and the int16/uint8
sample decode are real, so the whole audio path ships un-stubbed.
Compressed audio (FLAC/OGG/MP3) decodes through the optional
`soundfile` codec when installed (see decode_audio — r9, named-skip
gated like the bs4/resiliparse HTML backends); without it those blobs
degrade to a null/skip row (skip-and-count, like the reference's
ArchiveLoadFailed handling in sparkcc.py:390-392 — one odd blob must
never abort a job). STRUCTURAL metadata for MP3 needs no codec at all:
operators/multimodal.py:parse_mp3 walks the frame chain (late r9), so
duration/bitrate/sample-rate routing works even where decode is gated.

100 TB notes: every stage is per-row over Arrow batches — zero shuffle;
partitioning is inherited from the blob source, so colocating blobs by
storage file keeps the whole pipeline a single mapPartitions-shaped
stage per task.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def parse_wav_header(blob: bytes) -> dict | None:
    """RIFF/WAVE chunk walk → format metadata, pure Python.

    Returns dict(audio_format, channels, sample_rate, bits_per_sample,
    data_offset, data_len) or None if the blob isn't a parseable WAV.
    """
    if blob is None or len(blob) < 44:
        return None
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos = 12
    fmt: dict | None = None
    while pos + 8 <= len(blob):
        chunk_id = blob[pos : pos + 4]
        (chunk_len,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = pos + 8
        if chunk_id == b"fmt " and body + 16 <= len(blob):
            audio_format, channels, sample_rate = struct.unpack(
                "<HHI", blob[body : body + 8]
            )
            (bits,) = struct.unpack("<H", blob[body + 14 : body + 16])
            fmt = {
                "audio_format": audio_format,
                "channels": channels,
                "sample_rate": sample_rate,
                "bits_per_sample": bits,
            }
        elif chunk_id == b"data" and fmt is not None:
            data_len = min(chunk_len, len(blob) - body)
            return {**fmt, "data_offset": body, "data_len": data_len}
        # chunks pad to even byte boundaries
        pos = body + chunk_len + (chunk_len & 1)
    return None


def decode_pcm(blob: bytes) -> "tuple[np.ndarray, int] | None":
    """Real sample decode for PCM WAV (16-bit signed LE or 8-bit
    unsigned). Returns (frames, sample_rate) where frames is an
    (n_frames, channels) int32 array, or None for compressed/other."""
    hdr = parse_wav_header(blob)
    if hdr is None or hdr["audio_format"] != 1:
        return None
    bits = hdr["bits_per_sample"]
    ch = hdr["channels"]
    if ch < 1 or bits not in (8, 16):
        return None
    width = bits // 8
    n = hdr["data_len"] // (width * ch)
    if n == 0:
        return None
    count = n * ch
    off = hdr["data_offset"]
    if bits == 16:
        samples = np.frombuffer(
            blob, dtype="<i2", count=count, offset=off
        ).astype(np.int32)
    else:  # 8-bit WAV is unsigned, centered at 128
        samples = (
            np.frombuffer(blob, dtype=np.uint8, count=count, offset=off)
            .astype(np.int32)
            - 128
        )
    return samples.reshape(n, ch), hdr["sample_rate"]


def decode_audio(blob: bytes) -> "tuple[np.ndarray, int] | None":
    """decode_pcm plus the gated compressed-audio fallback (r9).

    PCM WAV decodes through the vendored pure-numpy path in every
    environment. Anything decode_pcm declines (FLAC/OGG/MP3/float-WAV)
    is offered to the optional `soundfile` (libsndfile) codec when that
    library is installed — same named-skip convention as the
    bs4/resiliparse HTML backends and the Pillow JPEG fallback.
    External samples are requested as int16 and widened to int32, so
    downstream integer feature math (peak/energy/zero-crossings) stays
    bit-exact regardless of which path decoded. Returns
    (frames int32 (n, ch), sample_rate) or None.
    """
    out = decode_pcm(blob)
    if out is not None:
        return out
    return _external_audio_decode(blob)


def _external_audio_decode(blob: bytes) -> "tuple[np.ndarray, int] | None":
    if blob is None or len(blob) < 8:
        return None
    try:
        import io  # noqa: PLC0415

        import soundfile as sf  # noqa: PLC0415
    except ImportError:
        return None
    try:
        data, rate = sf.read(
            io.BytesIO(bytes(blob)), dtype="int16", always_2d=True
        )
    except Exception:  # noqa: BLE001 — undecodable blob -> skip row
        return None
    if data.shape[0] == 0:
        return None
    return data.astype(np.int32), int(rate)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_features_batch(blobs: pd.Series) -> pd.DataFrame:
    """One Arrow batch of WAV blobs → feature rows.

    Features stay in INTEGER arithmetic (peak = max |sample|,
    zero_crossings on the first channel, energy = sum of squares) so
    results are bit-exact across platforms — no float kernels.
    Undecodable blobs degrade to nulls with n_frames=0.
    """
    rows = []
    for b in blobs:
        decoded = decode_audio(b)
        if decoded is None:
            rows.append(
                {
                    "sample_rate": None,
                    "channels": None,
                    "n_frames": 0,
                    "duration_ms": None,
                    "peak": None,
                    "zero_crossings": None,
                    "energy": None,
                }
            )
            continue
        frames, rate = decoded
        first = frames[:, 0]
        signs = np.sign(first)
        nz = signs[signs != 0]
        crossings = int((nz[1:] != nz[:-1]).sum()) if nz.size > 1 else 0
        rows.append(
            {
                "sample_rate": rate,
                "channels": frames.shape[1],
                "n_frames": frames.shape[0],
                "duration_ms": frames.shape[0] * 1000 // rate,
                "peak": int(np.abs(frames).max()),
                "zero_crossings": crossings,
                "energy": int((frames.astype(np.int64) ** 2).sum()),
            }
        )
    return pd.DataFrame(
        rows,
        columns=[
            "sample_rate",
            "channels",
            "n_frames",
            "duration_ms",
            "peak",
            "zero_crossings",
            "energy",
        ],
    )


def audio_features(
    blobs_df: DataFrame, id_col: str = "blob_id", blob_col: str = "blob"
) -> DataFrame:
    """DataFrame of (id, WAV blob) → decoded audio features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = audio_features_batch(pdf[blob_col])
            out.insert(0, "blob_id", pdf[id_col].values)
            yield out

    return blobs_df.mapInPandas(run, AUDIO_SCHEMA)


WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("start_frame", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def sample_audio_windows(
    blobs_df: DataFrame,
    window_frames: int = 256,
    max_windows: int = 16,
    id_col: str = "blob_id",
    blob_col: str = "blob",
) -> DataFrame:
    """1 audio blob → N fixed-length analysis windows (the audio twin of
    video frame sampling): real PCM decode, per-window integer peak and
    energy. Row expansion happens inside the Arrow batch, so output
    partitioning inherits the blob partitioning — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                decoded = decode_audio(blob)
                if decoded is None:
                    continue
                frames, _rate = decoded
                first = frames[:, 0]
                n_win = min(max_windows, max(1, len(first) // window_frames))
                for i in range(n_win):
                    w = first[i * window_frames : (i + 1) * window_frames]
                    if w.size == 0:
                        break
                    rows.append(
                        {
                            "blob_id": bid,
                            "window_idx": i,
                            "start_frame": i * window_frames,
                            "peak": int(np.abs(w).max()),
                            "energy": int((w.astype(np.int64) ** 2).sum()),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "blob_id",
                    "window_idx",
                    "start_frame",
                    "peak",
                    "energy",
                ],
            )

    return blobs_df.mapInPandas(run, WINDOW_SCHEMA)
