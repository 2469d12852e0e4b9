"""wav_codec: stdlib RIFF/PCM codec — round-trip, stdlib-wave interop,
square-wave corpus plumbing through the real audio_windows path."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from hybrid_vector_search_spark.wav_codec import decode_wav, encode_wav


def test_roundtrip_int16_mono():
    rng = np.random.RandomState(7)
    s = rng.randint(-32768, 32768, size=1234).astype(np.int16)
    arr, rate = decode_wav(encode_wav(s, 16_000))
    assert rate == 16_000 and arr.shape == (1234, 1)
    assert np.array_equal(arr[:, 0], s)


def test_roundtrip_uint8_stereo():
    rng = np.random.RandomState(8)
    s = rng.randint(0, 256, size=(500, 2)).astype(np.uint8)
    arr, rate = decode_wav(encode_wav(s, 8_000))
    assert rate == 8_000 and arr.dtype == np.uint8
    assert np.array_equal(arr, s)


def test_stdlib_wave_reads_our_bytes():
    """Independent validation: Python's own wave module parses our encode
    and returns the identical PCM payload and header facts."""
    s = (np.arange(800, dtype=np.int64) % 7 * 1000 - 3000).astype(np.int16)
    blob = encode_wav(s, 8_000)
    with wave.open(io.BytesIO(blob)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 8_000)
        frames = w.readframes(w.getnframes())
    assert np.array_equal(np.frombuffer(frames, dtype="<i2"), s)


def test_decode_stdlib_wave_bytes():
    """And the reverse: bytes written by the wave module decode through ours
    (chunk-walk handles the stdlib writer's layout)."""
    s = (np.sin(np.linspace(0, 20, 600)) * 10_000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16_000)
        w.writeframes(s.tobytes())
    arr, rate = decode_wav(buf.getvalue())
    assert rate == 16_000 and np.array_equal(arr[:, 0], s)


def test_rejects_non_wav_and_compressed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all, nope")
    # build a header claiming format code 85 (MP3): must raise loud
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)
    blob = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(blob)
    with pytest.raises(NotImplementedError, match="int16 or uint8"):
        encode_wav(np.zeros(4, dtype=np.float32), 8000)


def test_square_corpus_rms_is_amplitude(spark):
    """The planted contract end-to-end on a tiny doc fixture: every window's
    RMS equals the doc's amplitude exactly, and the schedule comes from the
    decoded header (duration_ms = 200 + n_chars % 800 at 8 kHz)."""
    from hybrid_vector_search_spark.multimodal import (
        audio_windows,
        synthetic_wav_corpus,
    )

    docs = spark.createDataFrame(
        [(3, 450), (10, 1234)], "doc_id long, n_chars int"
    )
    wins = audio_windows(synthetic_wav_corpus(docs), win_ms=25, hop_ms=10).collect()
    by_doc = {}
    for r in wins:
        by_doc.setdefault(r["media_id"], []).append(r)
    for doc_id, n_chars in [(3, 450), (10, 1234)]:
        amp = 1000 + (doc_id % 7) * 500
        dur = 200 + n_chars % 800
        rows = by_doc[doc_id]
        assert len(rows) == (dur - 25) // 10 + 1
        assert all(r["rms_u8"] == float(amp) for r in rows)
        assert all(r["n_samples"] == 200 for r in rows)
        # window bytes are the real int16 slice: first sample is +amp
        first = np.frombuffer(rows[0]["window"], dtype="<i2")
        assert first[0] == amp and len(first) == 200


def test_audio_fingerprint_neardup_geometry(spark):
    """The loudness-walk corpus realizes the PNG lane's planted geometry:
    same-group Hamming == |v_i − v_j| (nested amplitude flips), qualifying
    pairs (≤3) surface through the banded join, cross-group pairs never."""
    from hybrid_vector_search_spark.multimodal import (
        audio_fingerprint_neardup_pairs,
        synthetic_wav_fp_corpus,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    media = synthetic_wav_fp_corpus(docs)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_fingerprint_neardup_pairs(media).collect()
    }
    want = {
        (a, b): abs(a % 6 - b % 6)
        for g in (0, 1)
        for a in range(g * 6, g * 6 + 6)
        for b in range(a + 1, g * 6 + 6)
        if abs(a % 6 - b % 6) <= 3
    }
    assert got == want
