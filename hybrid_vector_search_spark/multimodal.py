"""Multimodal (image/audio/video) column support.

A 100 TB training-data pipeline carries media as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Python kernels. The reference
hints at an abandoned multimodal design (vestigial ``image_embeddings`` field
and unused VOYAGE_MM_MODEL env, reference transform-seed.py:74-77,
.env.sample:9); this module implements the Spark-side plumbing properly:

- ``MEDIA_SCHEMA``        — binary content + typed metadata struct
- ``synthetic_media``     — deterministic fake blobs for tests (md5-chained)
- ``extract_features``    — mapInPandas over Arrow batches: binary → float
                            vector. The BATCH PLUMBING is real (schema,
                            partitioning, iterator shape); the decode kernel
                            is deterministic-fake because no image/audio
                            codec libraries exist in this container.
- ``decode_image``          — the real-codec slot (Pillow), import-gated;
                              ``fake_decode`` is the deterministic stand-in
                              with the same (H, W, 3) uint8 contract.
- ``resize_images``         — REAL nearest-neighbor resize (pure index
                              math, ``resize_array``) over the decode slot;
                              full Arrow plumbing, raw-rgb output.
- ``sample_frames``         — REAL sampling schedule + per-frame fan-out
                              (one row per (media_id, frame_idx)); the frame
                              extraction itself is the deterministic fake
                              until a video codec (`av`) is installed.

Design rule: media bytes NEVER transit a shuffle. Every kernel is a narrow
map over the scan; derived small columns (features, dims, hashes) are what
joins/aggregations consume downstream.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META),
    ]
)


def _md5_expand(seed: bytes, n: int) -> bytes:
    """Deterministic n-byte stream from a seed (md5 chain) — the ONE
    expansion all fake media/feature/frame fixtures share, so a tweak can't
    silently desync them."""
    out = bytearray()
    h = hashlib.md5(seed).digest()
    while len(out) < n:
        out.extend(h)
        h = hashlib.md5(h).digest()
    return bytes(out[:n])


def synthetic_media(spark: SparkSession, n: int, *, kind: str = "image") -> DataFrame:
    """Deterministic fake media: content = md5-chain keyed by (kind, id)."""
    rows = []
    for i in range(n):
        content = _md5_expand(f"{kind}#{i}".encode(), 128)
        meta = (64, 64, None, None, "fake") if kind == "image" else (None, None, 16000, 1000, "fake")
        rows.append((i, kind, content, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(content: bytes) -> "np.ndarray":
    """Real-codec slot: decode bytes → HxWxC array. Needs Pillow."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:
        raise NotImplementedError(
            "decode_image requires Pillow, which is not available in this "
            "environment; extract_features uses the deterministic fake kernel."
        ) from exc
    import io

    return np.asarray(Image.open(io.BytesIO(content)))


def fake_feature_vector(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a learned feature extractor: md5-expanded
    bytes → dim floats in [-1, 1), L2-normalized."""
    raw = np.frombuffer(_md5_expand(content, dim * 4), dtype=np.uint32).astype(np.float64)
    v = raw / 2**31 - 1.0
    n = float(np.linalg.norm(v))
    return (v / n if n else v).astype(np.float32)


def extract_features(df: DataFrame, *, dim: int = 64, batch_note_col: str | None = None) -> DataFrame:
    """Binary → feature vector over mapInPandas Arrow batches.

    Output: input columns minus ``content`` plus ``features array<float>``
    (and optionally the per-batch size, for plumbing tests). Dropping the
    bytes HERE is the scale-critical step — everything downstream shuffles
    only the 4·dim-byte vectors.
    """
    out_fields = [f for f in df.schema.fields if f.name != "content"]
    schema = T.StructType(
        out_fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )
    if batch_note_col:
        schema = schema.add(T.StructField(batch_note_col, T.IntegerType()))

    keep = [f.name for f in out_fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(lambda b: fake_feature_vector(bytes(b), dim))
            out = pdf[keep].copy()
            out["features"] = feats
            if batch_note_col:
                out[batch_note_col] = len(pdf)
            yield out

    return df.mapInPandas(kernel, schema)


def fake_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: content bytes → HxWx3 uint8 array. Stands
    in for a codec so the resize/sampling MATH and all Spark plumbing run
    for real in this codec-less container; with Pillow installed,
    decode_image takes over and everything downstream is unchanged because
    both return the same (H, W, 3) uint8 contract."""
    raw = _md5_expand(content, width * height * 3)
    return np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)


def resize_array(img: np.ndarray, *, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize as pure index math — REAL resize logic (the
    same gather a codec-backed pipeline would run), no codec needed."""
    src_h, src_w = img.shape[:2]
    rows = (np.arange(height) * src_h // height).astype(np.int64)
    cols = (np.arange(width) * src_w // width).astype(np.int64)
    return img[rows][:, cols]


def decode_media(content: bytes, meta: dict) -> np.ndarray:
    """Decode dispatch keyed on ``meta['format']`` — the content's declared
    encoding, NOT the environment: ``raw-rgb`` reshapes the bytes directly
    (the output format of resize_images, and the zero-codec input path),
    ``fake``/unset runs the deterministic fake, and anything else (a real
    codec name) goes to decode_image, whose Pillow gate raises honestly when
    no codec library exists. Dispatching on environment instead (try real,
    fall back on NotImplementedError) would mis-decode fake/raw-rgb blobs
    the moment Pillow appeared."""
    fmt = (meta.get("format") or "").lower()
    src_w = int(meta.get("width") or 64)
    src_h = int(meta.get("height") or 64)
    if fmt == "raw-rgb":
        return np.frombuffer(content, dtype=np.uint8).reshape(src_h, src_w, 3)
    if fmt in ("", "fake"):
        return fake_decode(content, src_w, src_h)
    if fmt == "png":
        # real, dependency-free codec (stdlib zlib) — see png_codec module
        from .png_codec import decode_png

        img = decode_png(content)
        if img.shape[2] == 1:  # grey → RGB so downstream kernels see HxWx3
            img = np.repeat(img, 3, axis=2)
        return img[:, :, :3]  # drop alpha for the RGB pipeline contract
    return decode_image(content)


def resize_images(df: DataFrame, *, width: int, height: int) -> DataFrame:
    """Batch image resize over mapInPandas: content → resized content, meta
    updated to the new dims. Decode dispatches on the declared format
    (decode_media: raw-rgb reshape / deterministic fake / real codec); the
    resize itself (resize_array) and every piece of Spark plumbing — schema,
    Arrow batches, bytes never shuffling — are real either way. Output
    format is raw-rgb (H·W·3 bytes) so downstream kernels (including a
    second resize) need no codec to consume it."""
    schema = df.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                m = dict(meta) if meta is not None else {}
                img = decode_media(bytes(content), m)
                out = resize_array(img, width=width, height=height)
                contents.append(out.tobytes())
                m.update(width=width, height=height, format="raw-rgb")
                metas.append(m)
            res = pdf.copy()
            res["content"] = contents
            res["meta"] = metas
            yield res

    return df.mapInPandas(kernel, schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("t_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(df: DataFrame, *, every_ms: int) -> DataFrame:
    """Video frame sampling: one output row per (media_id, frame_idx) at
    timestamps 0, every_ms, 2·every_ms, … < duration_ms. The sampling
    schedule, fan-out shape, and Arrow plumbing are real; frame extraction
    is the deterministic fake (a real build swaps the per-timestamp seek
    into `av` inside the same kernel). Fan-out happens INSIDE the kernel so
    the source bytes are read once per video, never duplicated per frame
    before sampling."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "t_ms": [], "frame": []}
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                m = dict(meta) if meta is not None else {}
                duration = int(m.get("duration_ms") or 0)
                for idx, t in enumerate(range(0, duration, every_ms)):
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(idx)
                    rows["t_ms"].append(t)
                    rows["frame"].append(_md5_expand(bytes(content) + t.to_bytes(4, "big"), 64))
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, FRAME_SCHEMA)


def binary_stats(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """(id, n_bytes, content_md5) via the Arrow binary-batch kernel — the
    oracle-checkable face of the media path: binary columns stream through
    mapInPandas as raw bytes and only fixed-width derived columns come out
    (the media bytes themselves never reach a shuffle)."""
    import hashlib as _hl

    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("c"))
    par = df.sparkSession.sparkContext.defaultParallelism
    src = src.repartition(par)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": [len(b) for b in pdf["c"]],
                    "content_md5": [_hl.md5(bytes(b)).hexdigest() for b in pdf["c"]],
                }
            )

    return src.mapInPandas(kernel, "id long, n_bytes long, content_md5 string")


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("win_idx", T.IntegerType(), False),
        T.StructField("start_ms", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("window", T.BinaryType(), False),
        T.StructField("rms_u8", T.DoubleType(), False),
    ]
)

# payload="rms" drops the window-bytes column; payload="schedule" drops the
# sample-dependent columns entirely (see audio_windows docstring)
_AUDIO_SCHEDULE_FIELDS = AUDIO_WINDOW_SCHEMA.fields[:4]
AUDIO_WINDOW_RMS_SCHEMA = T.StructType(
    _AUDIO_SCHEDULE_FIELDS + [T.StructField("rms_u8", T.DoubleType(), False)]
)
AUDIO_WINDOW_SCHEDULE_SCHEMA = T.StructType(_AUDIO_SCHEDULE_FIELDS)


def audio_windows(
    df: DataFrame, *, win_ms: int = 25, hop_ms: int = 10, payload: str = "full"
) -> DataFrame:
    """Audio analysis framing — the MFCC/feature front-end's windowing pass:
    one output row per (media_id, win_idx) for each full ``win_ms`` window
    advancing by ``hop_ms`` (start + win <= duration; trailing partial
    windows are dropped, the standard framing convention). ``n_samples`` =
    win_ms · sample_rate / 1000 from the clip's metadata.

    The schedule, fan-out shape, and Arrow plumbing are real and
    oracle-checkable. The PCM comes from a per-clip format dispatch (the
    decode_media policy): ``format='wav'`` decodes REAL RIFF/PCM bytes with
    the stdlib codec (wav_codec) and takes rate/duration from the DECODED
    header — meta is not consulted, so the schedule attests the decode;
    other formats use the deterministic md5-chain fake with meta-declared
    rate/duration (a real build swaps `soundfile`/`av` into the same slot —
    the codec-lane policy of decode_image). Window bytes are samples sliced
    at the window's offsets (u8 for the fake, the first channel's int16 for
    wav) and rms_u8 is their root-mean-square (named for the fake lane's
    dtype; for wav it is the int16 RMS) — pinned in tests, and for the
    planted square-wave corpus SQL-replayable (|sample| is constant, so
    RMS = amplitude exactly). Fan-out happens INSIDE the kernel: clip bytes
    are decoded once per clip, never duplicated per window upstream.

    ``payload`` projects INSIDE the kernel (r14, guide §4.1/§2.3 — an
    opaque Python function computes and Arrow-serializes every declared
    column whether or not the caller reads it; Catalyst can only prune
    ABOVE the kernel):

    - ``"full"`` (default): schedule + window bytes + rms_u8.
    - ``"rms"``: schedule + rms_u8 — skips materializing/shipping the
      window byte payload (the dominant bytes: win_n samples per window
      vs ~24 bytes of schedule+rms).
    - ``"schedule"``: schedule only — additionally skips sample access
      entirely; the fake-PCM lane then never runs its md5-chain sample
      generator (the schedule is pure metadata arithmetic), while the wav
      lane still decodes (its schedule attests the DECODED header).

    Schedule/rms values are identical across modes (same arithmetic on
    the same decode — pinned in tests/test_multimodal.py); a mode only
    drops columns the caller does not read."""
    if win_ms <= 0 or hop_ms <= 0:
        raise ValueError("win_ms and hop_ms must be positive")
    if payload not in ("full", "rms", "schedule"):
        raise ValueError(f"payload must be full|rms|schedule, got {payload!r}")
    want_window = payload == "full"
    want_rms = payload in ("full", "rms")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [], "win_idx": [], "start_ms": [], "n_samples": [],
            }
            if want_window:
                rows["window"] = []
            if want_rms:
                rows["rms_u8"] = []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                m = dict(meta) if meta is not None else {}
                if (m.get("format") or "").lower() == "wav":
                    from .wav_codec import decode_wav

                    arr, rate = decode_wav(bytes(content))
                    pcm = arr[:, 0]  # framing runs on the first channel
                    duration = len(pcm) * 1000 // rate
                else:
                    duration = int(m.get("duration_ms") or 0)
                    rate = int(m.get("sample_rate") or 0)
                    if rate <= 0:
                        continue
                    pcm = (
                        np.frombuffer(
                            _md5_expand(bytes(content), duration * rate // 1000),
                            dtype=np.uint8,
                        )
                        if (want_window or want_rms)
                        else None
                    )
                if duration < win_ms:
                    continue
                win_n = win_ms * rate // 1000
                if not (want_window or want_rms):
                    # schedule-only: the whole emission is integer
                    # arithmetic — vectorize it instead of a per-window
                    # Python loop (same values: idx = 0..n-1, start =
                    # idx·hop, n_samples constant)
                    n_win = (duration - win_ms) // hop_ms + 1
                    idxs = np.arange(n_win, dtype=np.int64)
                    rows["media_id"].append(np.full(n_win, int(mid), dtype=np.int64))
                    rows["win_idx"].append(idxs)
                    rows["start_ms"].append(idxs * hop_ms)
                    rows["n_samples"].append(np.full(n_win, int(win_n), dtype=np.int64))
                    continue
                for idx, start in enumerate(range(0, duration - win_ms + 1, hop_ms)):
                    rows["media_id"].append(int(mid))
                    rows["win_idx"].append(idx)
                    rows["start_ms"].append(start)
                    rows["n_samples"].append(int(win_n))
                    s0 = start * rate // 1000
                    w = pcm[s0 : s0 + win_n]
                    if want_window:
                        rows["window"].append(w.tobytes())
                    if want_rms:
                        rows["rms_u8"].append(
                            round(
                                float(np.sqrt(np.mean(w.astype(np.float64) ** 2))),
                                6,
                            )
                        )
            if not (want_window or want_rms):
                empty = np.array([], dtype=np.int64)
                yield pd.DataFrame(
                    {
                        k: np.concatenate(v) if v else empty
                        for k, v in rows.items()
                    }
                )
            else:
                yield pd.DataFrame(rows)

    schema = (
        AUDIO_WINDOW_SCHEMA
        if payload == "full"
        else AUDIO_WINDOW_RMS_SCHEMA
        if payload == "rms"
        else AUDIO_WINDOW_SCHEDULE_SCHEMA
    )
    return df.mapInPandas(kernel, schema)


WAV_RATE = 8_000  # synthetic corpus sample rate (Hz)


def synthetic_wav_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-WAV audio corpus (stdlib RIFF/PCM codec), one
    mono 16-bit clip per doc: a ±A square wave whose every parameter is
    pure id arithmetic, so a SQL oracle replays the decoded facts —

        amplitude  A = 1000 + (doc_id % 7) · 500
        half-cycle P = 4 + doc_id % 5 samples
        duration_ms  = 200 + n_chars % 800   (at 8 kHz → duration·8 samples)

    sample[i] = +A if (i // P) even else −A. |sample| ≡ A, so the RMS of
    ANY window is EXACTLY A regardless of alignment — the real-bytes fact
    that pins sample fidelity through encode → decode → window → RMS,
    while the window schedule (computed from the DECODED header, never
    meta) pins header fidelity. The audio sibling of synthetic_png_corpus:
    everything downstream is real codec work; the planting just makes the
    expected numbers id arithmetic."""
    from .wav_codec import encode_wav

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, contents, metas = [], [], [], []
            for i, nch in zip(pdf[id_col], pdf["n_chars"]):
                i = int(i)
                amp = 1000 + (i % 7) * 500
                half = 4 + i % 5
                duration_ms = 200 + int(nch) % 800
                n = duration_ms * WAV_RATE // 1000
                idx = np.arange(n, dtype=np.int64)
                samples = np.where((idx // half) % 2 == 0, amp, -amp).astype(
                    np.int16
                )
                ids.append(i)
                kinds.append("audio")
                contents.append(encode_wav(samples, WAV_RATE))
                metas.append((None, None, WAV_RATE, duration_ms, "wav"))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "content": contents, "meta": metas}
            )

    return docs.select(id_col, "n_chars").mapInPandas(kern, MEDIA_SCHEMA)


_AUDIO_FP_BLOCK = 200  # 25 ms at 8 kHz
_AUDIO_FP_SHAPE = (8, 9)  # 8 segments × 9 blocks → 64 difference bits


def synthetic_wav_fp_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-WAV corpus with the SAME planted near-dup
    geometry as synthetic_png_corpus, carried in LOUDNESS instead of
    brightness: each clip is 72 consecutive 25 ms blocks (8 segments × 9),
    every block a ±A square wave whose amplitude A walks from 2000 in
    ±200 steps so that the 8×9 block-RMS matrix realizes the target
    64-bit pattern under dhash64's adjacent comparisons — the walk resets
    per segment exactly like the PNG's per-row brightness walk, keeping
    A ∈ [400, 3600]. Group identity and nested flips are the PNG lane's
    id arithmetic verbatim, so the SAME oracle replays expected pairs and
    Hamming distances from doc_id alone."""
    from .wav_codec import encode_wav

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, contents, metas = [], [], [], []
            for i in pdf[id_col]:
                i = int(i)
                g, v = divmod(i, _PHASH_GROUP_SIZE)
                if g >= 1 << 14:
                    raise ValueError(
                        "synthetic_wav_fp_corpus shares synthetic_png_corpus's "
                        "4×14-bit group layout (≤16383 groups)"
                    )
                bits = 0
                for k in range(4):
                    bits |= (g & 0x3FFF) << (14 * k)
                for p in _PHASH_FLIP_POSITIONS[:v]:
                    bits ^= 1 << p
                rows, cols = _AUDIO_FP_SHAPE
                amps = np.empty(rows * cols, dtype=np.int64)
                for r in range(rows):
                    cur = 2000
                    amps[r * cols] = cur
                    for c in range(cols - 1):
                        cur += 200 if (bits >> (r * 8 + c)) & 1 else -200
                        amps[r * cols + c + 1] = cur
                amp_per_sample = np.repeat(amps, _AUDIO_FP_BLOCK)
                idx = np.arange(len(amp_per_sample))
                samples = np.where(
                    (idx // 4) % 2 == 0, amp_per_sample, -amp_per_sample
                ).astype(np.int16)
                dur_ms = len(samples) * 1000 // WAV_RATE
                ids.append(i)
                kinds.append("audio")
                contents.append(encode_wav(samples, WAV_RATE))
                metas.append((None, None, WAV_RATE, dur_ms, "wav"))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "content": contents, "meta": metas}
            )

    return docs.select(id_col).mapInPandas(kern, MEDIA_SCHEMA)


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, h) 64-bit block-RMS dHash fingerprints from DECODED WAV
    PCM — the decode→fingerprint half of the acoustic near-dup lane,
    exposed separately (same contract as :func:`image_fingerprints`): bit
    = "did this 25 ms get louder than the last", robust to global gain
    because RMS RATIOS drive the comparisons. Clips shorter than the 8×9
    landmark grid are dropped."""

    def fp_kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .wav_codec import decode_wav

        rows, cols = _AUDIO_FP_SHAPE
        need = rows * cols * _AUDIO_FP_BLOCK
        for pdf in batches:
            ids, hashes = [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr, _rate = decode_wav(bytes(content))
                pcm = arr[:, 0].astype(np.float64)
                if len(pcm) < need:
                    continue  # too short to fingerprint — no landmark grid
                blocks = pcm[:need].reshape(rows * cols, _AUDIO_FP_BLOCK)
                rms = np.sqrt(np.mean(blocks * blocks, axis=1)).reshape(rows, cols)
                ids.append(int(mid))
                hashes.append(dhash64(rms))
            yield pd.DataFrame({"media_id": ids, "h": hashes})

    return media.mapInPandas(fp_kern, "media_id long, h long")


def audio_fingerprint_neardup_pairs(
    media: DataFrame, *, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Acoustic near-duplicate pairs: decode WAV → 8×9 block-RMS matrix →
    dhash64 over loudness deltas (:func:`audio_fingerprints`) → the shared
    banded Hamming join. The Shazam-family idea reduced to its
    engine-checkable core, computed executor-side so content bytes never
    shuffle — only (media_id, 8-byte fingerprint) moves, identical to the
    image lane."""
    hashed = audio_fingerprints(media)
    return banded_hamming_pairs(hashed, max_hamming=max_hamming, bands=bands)


# ------------------------------------------------------- perceptual hashing


def dhash64(grey: np.ndarray) -> int:
    """Difference hash of an 8×9 greyscale array: bit (r,c) = 1 iff
    pixel (r,c) < pixel (r,c+1) — 8 rows × 8 adjacent comparisons = 64
    bits, row-major, bit index r*8+c in the LOW bits of the BIGINT. The
    standard near-duplicate image fingerprint: brightness/contrast shifts
    preserve comparisons, so visually-identical images hash close.

    Returned as a SIGNED two's-complement 64-bit value (bit 63 set →
    negative): the hash flows through `h long` Arrow/Spark schemas, and an
    unsigned value ≥ 2**63 would otherwise wrap or error at the int64
    conversion on real images (~half of them set bit 63). XOR, bit_count,
    and shiftrightunsigned are all bit-pattern ops, so Hamming distances
    are unchanged by the signed representation."""
    h, w = grey.shape[:2]
    if (h, w) != (8, 9):
        grey = resize_array(grey, width=9, height=8)
    bits = (grey[:, :-1].astype(np.int64) < grey[:, 1:].astype(np.int64)).ravel()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    if out >= 1 << 63:
        out -= 1 << 64
    return out


_PHASH_GROUP_SIZE = 6
_PHASH_FLIP_POSITIONS = (56, 57, 58, 59, 60)  # nested-variant flip region


def synthetic_png_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-PNG image corpus with SQL-replayable near-dup
    geometry, one image per doc id. Ids split into groups of 6 (g = id//6,
    variant v = id%6); an image's TARGET dHash is

        bits 0..55  = g's 14-bit value repeated 4× (group identity —
                      distinct groups differ in ≥1 id bit, hence ≥4 hash
                      bits: cross-group Hamming is ALWAYS > 3)
        bits 56..60 = the first v of five fixed flip positions
                      (nested masks: same-group Hamming is EXACTLY |v_i−v_j|)

    and the pixel rows are brightness walks (start 128, step ±8) whose
    adjacent comparisons realize exactly those bits, encoded as a real
    8×9 grey PNG (png_codec). Everything downstream — decode, hash, band
    join — is real image work; the planted layout just makes the expected
    pair set pure id arithmetic for the DuckDB oracle."""
    from .png_codec import encode_png

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, contents, metas = [], [], [], []
            for i in pdf[id_col]:
                i = int(i)
                g, v = divmod(i, _PHASH_GROUP_SIZE)
                if g >= 1 << 14:
                    raise ValueError(
                        "synthetic_png_corpus encodes the group id in 4×14 "
                        "repeated bits (≤16383 groups); widen the hash or "
                        "shard the corpus for more"
                    )
                bits = 0
                for k in range(4):
                    bits |= (g & 0x3FFF) << (14 * k)
                for p in _PHASH_FLIP_POSITIONS[:v]:
                    bits ^= 1 << p
                img = np.empty((8, 9), dtype=np.uint8)
                for r in range(8):
                    cur = 128
                    img[r, 0] = cur
                    for c in range(8):
                        cur += 8 if (bits >> (r * 8 + c)) & 1 else -8
                        img[r, c + 1] = cur
                ids.append(i)
                kinds.append("image")
                contents.append(encode_png(img))
                metas.append((9, 8, None, None, "png"))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "content": contents, "meta": metas}
            )

    return docs.select(id_col).mapInPandas(kern, MEDIA_SCHEMA)


def image_fingerprints(media: DataFrame) -> DataFrame:
    """(media_id, h) 64-bit dHash fingerprints from DECODED image pixels —
    the decode→hash half of the near-dup lane, exposed separately so a
    caller can materialize the tiny fingerprint relation once (the at-scale
    analog: write the fingerprint table, then join readers) and run several
    downstream joins against it without re-decoding the corpus. Content
    bytes never leave the scan partition; only (id, 8-byte hash) rows
    come out of the Arrow kernel."""

    def hash_kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                m = dict(meta) if meta is not None else {}
                img = decode_media(bytes(content), m)
                grey = img[:, :, 0] if img.ndim == 3 else img
                ids.append(int(mid))
                hashes.append(dhash64(grey))
            yield pd.DataFrame({"media_id": ids, "h": hashes})

    return media.mapInPandas(hash_kern, "media_id long, h long")


def image_neardup_pairs(
    media: DataFrame, *, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Perceptual near-duplicate image pairs: decode → dHash → banded LSH
    self-join → exact Hamming verify (id_a < id_b, hamming ≤ max_hamming).

    Scale: the content bytes NEVER shuffle — the hash is computed in the
    scan partition and only (media_id, 8-byte hash) moves. Banding is the
    SimHash pigeonhole: ≤3 differing bits can touch at most 3 of 4
    16-bit bands, so every qualifying pair shares ≥1 exact band key; the
    band join is an inverted index (fan-out = per-band-bucket pairs,
    never n²), and survivors pay one cheap bit_count(xor) verify."""
    hashed = image_fingerprints(media)
    return banded_hamming_pairs(hashed, max_hamming=max_hamming, bands=bands)


def banded_hamming_pairs(
    hashed: DataFrame, *, max_hamming: int = 3, bands: int = 4, checkpoint: bool = True
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming ≤ max_hamming over a
    (media_id, h) 64-bit fingerprint relation — the banded-LSH join shared
    by every perceptual-hash lane (image dHash, audio block-RMS dHash).
    Banding is the SimHash pigeonhole: ≤ max_hamming differing bits can
    touch at most max_hamming of ``bands`` disjoint bands, so whenever
    max_hamming < bands every qualifying pair shares ≥1 exact band key;
    the band join is an inverted index (fan-out = per-band-bucket pairs,
    never n²) and survivors pay one cheap bit_count(xor) verify.

    The fingerprint relation is localCheckpointed (one eager job) before
    the self-join: its two sides project different aliases, so without the
    cut each would re-run the full decode→hash kernel over the media bytes
    — the checkpoint trades one tiny (id, int64) materialization for a
    whole second pass over the corpus. On a cluster the same role is
    played by writing the fingerprint table once and joining readers.
    Pass ``checkpoint=False`` when the input is ALREADY materialized
    (e.g. a caller-cached checkpointed fingerprint relation) so the cut
    isn't paid twice."""
    from pyspark.sql import functions as F  # local alias for clarity

    if checkpoint:
        hashed = hashed.localCheckpoint(eager=True)
    width = 64 // bands
    mask = (1 << width) - 1
    banded = hashed.select(
        "media_id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("h"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "h", "bk.band", "bk.key")
    a = banded.select(
        F.col("media_id").alias("id_a"), F.col("h").alias("h_a"), "band", "key"
    )
    b = banded.select(
        F.col("media_id").alias("id_b"), F.col("h").alias("h_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.expr("bit_count(h_a ^ h_b)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def image_brightness_stats(media: DataFrame) -> DataFrame:
    """(media_id, n_px, sum_brightness, min_px, max_px) from the DECODED
    pixels of each image — the per-asset exposure/contrast profile an
    image-curation pipeline computes right after ingest (dark/blown-out
    frame screens, normalization stats for training transforms).

    Every number comes out of the real codec path: n_px is the decoded
    dimension product (pinning width×height against the container
    metadata), the sums/extrema are over decoded bytes. Scale shape is the
    dHash lane's: decode runs in the scan partition inside one Arrow map,
    content bytes never shuffle — only the 5-int stat rows move."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, npx, sums, mns, mxs = [], [], [], [], []
            for mid, content, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"]
            ):
                m = dict(meta) if meta is not None else {}
                img = decode_media(bytes(content), m)
                grey = img[:, :, 0] if img.ndim == 3 else img
                ids.append(int(mid))
                npx.append(int(grey.size))
                sums.append(int(grey.astype(np.int64).sum()))
                mns.append(int(grey.min()))
                mxs.append(int(grey.max()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_px": npx,
                    "sum_brightness": sums,
                    "min_px": mns,
                    "max_px": mxs,
                }
            )

    return media.mapInPandas(
        kern,
        "media_id long, n_px long, sum_brightness long, min_px int, max_px int",
    )
