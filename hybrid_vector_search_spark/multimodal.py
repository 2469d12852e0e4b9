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
- ``decode_image`` / ``resize_images`` / ``sample_frames`` — the real-codec
  slots, gated behind import-try: with Pillow/av installed they run; here
  they raise NotImplementedError with a clear message.

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


def synthetic_media(spark: SparkSession, n: int, *, kind: str = "image") -> DataFrame:
    """Deterministic fake media: content = md5-chain keyed by (kind, id)."""
    rows = []
    for i in range(n):
        seed = f"{kind}#{i}".encode()
        chunks = []
        h = hashlib.md5(seed).digest()
        for _ in range(8):  # 128 deterministic bytes
            chunks.append(h)
            h = hashlib.md5(h).digest()
        meta = (64, 64, None, None, "fake") if kind == "image" else (None, None, 16000, 1000, "fake")
        rows.append((i, kind, b"".join(chunks), meta))
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
    need = dim * 4
    out = bytearray()
    h = hashlib.md5(content).digest()
    while len(out) < need:
        out.extend(h)
        h = hashlib.md5(h).digest()
    raw = np.frombuffer(bytes(out[:need]), dtype=np.uint32).astype(np.float64)
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


def resize_images(df: DataFrame, *, width: int, height: int) -> DataFrame:
    raise NotImplementedError(
        "resize_images requires an image codec (Pillow) not present in this "
        "environment. Plumbing shape: mapInPandas(content -> content', meta') "
        "with the same batch/iterator contract as extract_features."
    )


def sample_frames(df: DataFrame, *, every_ms: int) -> DataFrame:
    raise NotImplementedError(
        "sample_frames requires a video codec (av) not present in this "
        "environment. Plumbing shape: mapInPandas with posexplode of sampled "
        "frames — one output row per (media_id, frame_idx)."
    )


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
