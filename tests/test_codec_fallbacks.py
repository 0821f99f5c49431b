"""Optional-codec fallback seams (VERDICT r8 ask #5).

Same convention as the bs4/resiliparse HTML backend matrix: with the
library installed the full path is exercised; without it the test is
an EXPLICIT named skip in the pytest summary — never a silent pass.
The gating logic itself (scope detection, None-degradation) is
asserted in every environment.
"""

from __future__ import annotations

import numpy as np
import pytest

from cc_pyspark_spark.operators.audio import decode_audio, decode_pcm
from cc_pyspark_spark.operators.jpeg import (
    jpeg_frame_info,
    jpeg_out_of_scope,
)
from cc_pyspark_spark.operators.multimodal import decode_pixels


def _baseline_jpeg() -> bytes:
    from tests.test_jpeg_decode import encode_jpeg

    return encode_jpeg(np.zeros((8, 8, 3), np.uint8))


def _progressive_jpeg() -> bytes:
    blob = bytearray(_baseline_jpeg())
    i = blob.find(bytes([0xFF, 0xC0]))
    blob[i + 1] = 0xC2  # SOF0 -> SOF2
    return bytes(blob)


def test_scope_gate_classifies_frames():
    base = _baseline_jpeg()
    prog = _progressive_jpeg()
    assert jpeg_frame_info(base)["marker"] == 0xC0
    assert not jpeg_out_of_scope(base)
    assert jpeg_frame_info(prog)["marker"] == 0xC2
    assert jpeg_out_of_scope(prog)
    # non-JPEG and corrupt-header blobs are NOT out-of-scope (they are
    # garbage, and must never trigger an external codec)
    assert not jpeg_out_of_scope(b"not a jpeg")
    assert not jpeg_out_of_scope(base[: len(base) // 4])


def test_corrupt_baseline_jpeg_stays_none_in_every_environment():
    """The fallback gate is format-based, never failure-based: a
    truncated BASELINE frame must be None whether or not Pillow is
    installed — otherwise oracled image queries would depend on the
    environment's ability to salvage corrupt crawl data."""
    blob = bytearray(_baseline_jpeg())
    sos = bytes(blob).find(bytes([0xFF, 0xDA]))
    cut = bytes(blob[: sos + 8])
    assert not jpeg_out_of_scope(cut) or jpeg_frame_info(cut) is not None
    assert decode_pixels(cut) is None


def test_progressive_jpeg_via_pillow_or_named_skip():
    pil = pytest.importorskip(
        "PIL.Image",
        reason="Pillow not installed — progressive-JPEG fallback "
        "unexercised in this environment (vendored baseline decoder "
        "still covers SOF0/SOF1; progressive degrades to None)",
    )
    import io

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    buf = io.BytesIO()
    pil.fromarray(arr).save(buf, format="JPEG", progressive=True, quality=95)
    blob = buf.getvalue()
    assert jpeg_out_of_scope(blob), "Pillow progressive output must be SOF2"
    out = decode_pixels(blob)
    assert out is not None and out.shape == (16, 16, 3)
    # lossy codec: just sanity-check it decoded real content
    assert out.dtype == np.uint8


def test_progressive_without_pillow_degrades_to_none():
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — the degrade path is the other test")
    except ImportError:
        pass
    assert decode_pixels(_progressive_jpeg()) is None


def test_compressed_audio_via_soundfile_or_named_skip():
    sf = pytest.importorskip(
        "soundfile",
        reason="soundfile not installed — compressed-audio (FLAC/OGG) "
        "fallback unexercised in this environment (vendored PCM-WAV "
        "decode still covers the un-stubbed path; compressed degrades "
        "to a null/skip row)",
    )
    import io

    rng = np.random.RandomState(5)
    pcm = (rng.randint(-2000, 2000, (400, 1))).astype(np.int16)
    buf = io.BytesIO()
    sf.write(buf, pcm, 8000, format="FLAC")
    blob = buf.getvalue()
    assert decode_pcm(blob) is None, "FLAC must not look like PCM WAV"
    decoded = decode_audio(blob)
    assert decoded is not None
    frames, rate = decoded
    assert rate == 8000 and frames.dtype == np.int32
    assert np.array_equal(frames[:, 0], pcm[:, 0].astype(np.int32)), (
        "FLAC is lossless: int16 round-trip must be exact"
    )


def test_compressed_audio_without_soundfile_degrades_to_none():
    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile installed — the degrade path is the other test")
    except ImportError:
        pass
    # FLAC magic + garbage: not PCM WAV, external codec absent -> None
    assert decode_audio(b"fLaC" + b"\x00" * 64) is None
    assert decode_pcm(b"fLaC" + b"\x00" * 64) is None


def test_pcm_wav_never_touches_external_codecs():
    """The vendored path must win for PCM WAV in every environment
    (determinism of the oracled audio queries is codec-independent)."""
    import struct

    pcm = np.array([0, 1000, -1000, 500], dtype="<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    blob = hdr + pcm
    a = decode_pcm(blob)
    b = decode_audio(blob)
    assert a is not None and b is not None
    assert np.array_equal(a[0], b[0]) and a[1] == b[1] == 8000
