"""Minimal pure-stdlib WAV (RIFF PCM) codec for the multimodal audio lane.

The container has no audio libraries, but WAV's wire format is public and
tiny: a RIFF header, an ``fmt `` chunk (PCM code 1, channels, rate, depth)
and a ``data`` chunk of little-endian samples. This gives the engine a
REAL audio-bytes path — testable in-container, byte-exact, no
dependencies — alongside the soundfile/av gate that stays the route for
compressed formats (mp3/flac/ogg raise honestly). The sibling of
png_codec for audio: the reference ships no media handling at all
(backend/api.py limits itself to text + vectors), so this lane belongs to
the LLM-data-pipeline surface the task brief adds.

Supports PCM 16-bit and 8-bit, mono or interleaved multichannel,
non-extensible headers. Anything else raises with the reason.

Scale note: the codec runs INSIDE Arrow-batched kernels
(multimodal.audio_windows dispatches format='wav' here); bytes stay
executor-side and never transit a shuffle, same rule as every media
kernel.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16/uint8 samples → WAV bytes (PCM)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    if arr.dtype == np.int16:
        depth = 16
    elif arr.dtype == np.uint8:
        depth = 8
    else:
        raise NotImplementedError(
            f"encode_wav writes PCM int16 or uint8 only, got {arr.dtype}"
        )
    n, ch = arr.shape
    payload = arr.astype("<" + arr.dtype.str[1:], copy=False).tobytes()
    block = ch * depth // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, depth)
    data = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, channels) samples, sample_rate).

    dtype is int16 or uint8 per the header's bit depth. Walks RIFF chunks
    (skipping unknown ones like LIST/fact), so files from other writers
    decode too as long as they are uncompressed PCM.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body)
        elif cid == b"data":
            payload = body
            if fmt is not None:
                break
    if fmt is None or payload is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    code, ch, rate, _byte_rate, _block, depth = fmt
    if code != 1:
        raise NotImplementedError(
            f"wav_codec handles uncompressed PCM only (format code {code}; "
            f"mp3/flac/ogg go through the soundfile/av gate)"
        )
    if depth == 16:
        arr = np.frombuffer(payload, dtype="<i2")
    elif depth == 8:
        arr = np.frombuffer(payload, dtype=np.uint8)
    else:
        raise NotImplementedError(f"wav_codec handles 8/16-bit PCM, got {depth}")
    if ch < 1 or len(arr) % ch:
        raise ValueError(f"corrupt WAV: {len(arr)} samples across {ch} channels")
    return arr.reshape(-1, ch), rate
