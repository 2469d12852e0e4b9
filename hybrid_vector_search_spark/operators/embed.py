"""Embedding pipeline (the reference's embed.py, Spark-native).

The reference embeds product descriptions by calling the Voyage AI HTTP API
in batches of 16 and point-updating each document (reference
embed.py:88-89,135-153). Spark-native shape:

- ``embed_texts``       — a column transform backed by an *iterator* Pandas
                          UDF: Arrow batches stream through a long-lived
                          worker, the batch dimension replacing the
                          reference's batch-of-16 (tunable via
                          spark.sql.execution.arrow.maxRecordsPerBatch).
- ``HashingEmbedder``   — the default, fully deterministic local embedder
                          (hashing-trick n-gram vectors, md5-seeded, L2
                          normalized): correctness runs need no network
                          (SURVEY.md §2.11 U1). Same function embeds a query
                          string driver-side (U2) — one string never needs
                          the cluster.
- ``HttpEmbedder``      — the production slot: same UDF shape, network call
                          per Arrow batch. Stubbed: implementing it is a
                          config/credentials concern, not an engine concern.
- ``embed_missing``     — the reference's --skip-existing incrementality
                          (embed.py:95-96): only rows whose embedding column
                          is NULL are recomputed; existing vectors pass
                          through untouched.

Point updates (reference embed.py:149-153) have no parquet analog; the
engine's contract is column-add + rewrite, with the anti-join incremental
variant expressed by ``embed_missing`` (SURVEY.md §7.5.6).
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class HashingEmbedder:
    """Deterministic hashing-trick embedder: token + bigram features hashed
    into ``dim`` buckets with md5-derived signs, L2-normalized float32.

    Deterministic in the text alone — reproducible across engines, workers,
    and runs (FIXTURES.md §4 requirement)."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _features(self, text: str) -> list[str]:
        toks = [t for t in _split_tokens(text)]
        return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]

    @staticmethod
    @lru_cache(maxsize=1 << 20)
    def _hash_feature(feat: str, dim: int) -> tuple[int, float]:
        """md5 → (bucket, sign), memoized per executor process: text token
        frequencies are Zipfian, so the hit rate approaches 1 and the md5
        cost collapses to the distinct-vocabulary size. Values are untouched
        (same hash arithmetic) — the embed_roundtrip oracle stays bit-exact."""
        h = hashlib.md5(feat.encode("utf-8")).digest()
        return int.from_bytes(h[:4], "big") % dim, 1.0 if h[4] & 1 else -1.0

    def embed_one(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float64)
        for feat in self._features(text):
            bucket, sign = self._hash_feature(feat, self.dim)
            v[bucket] += sign
        n = math.sqrt(float(v @ v))
        if n > 0:
            v /= n
        return v.astype(np.float32)

    def embed_batch(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: self.embed_one(t if isinstance(t, str) else ""))


def _split_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[\W_]+", text.lower()) if t]


class HttpEmbedder:
    """Production embedder slot: POSTs Arrow-batch-sized text lists to an
    embedding service (the reference's Voyage batches, embed.py:135-153).
    Not implemented here — no network in this environment."""

    def __init__(self, endpoint: str, model: str, dim: int):
        self.endpoint, self.model, self.dim = endpoint, model, dim

    def embed_batch(self, texts: pd.Series) -> pd.Series:
        raise NotImplementedError(
            "HttpEmbedder requires network access; use HashingEmbedder for "
            "offline runs or implement the POST in a deployment."
        )


def embed_texts(embedder, text_col: Column) -> Column:
    """Column expression: text → array<float> embedding via iterator Pandas
    UDF (one Python worker per partition, Arrow batches streamed through)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            yield embedder.embed_batch(batch)

    return _embed(text_col)


def embed_documents(
    df: DataFrame, text_col: str, out_col: str = "embedding", *, embedder=None
) -> DataFrame:
    embedder = embedder or HashingEmbedder()
    return df.withColumn(out_col, embed_texts(embedder, F.col(text_col)))


def embed_missing(
    df: DataFrame, text_col: str, emb_col: str, *, embedder=None
) -> DataFrame:
    """--skip-existing semantics: embed ONLY rows with a NULL embedding."""
    embedder = embedder or HashingEmbedder()
    return df.withColumn(
        emb_col,
        F.when(F.col(emb_col).isNull(), embed_texts(embedder, F.col(text_col))).otherwise(
            F.col(emb_col)
        ),
    )


def query_vector(text: str, *, embedder=None) -> list[float]:
    """Driver-side single-string embedding (reference backend/api.py:158-160:
    one query string per request — no cluster involvement)."""
    embedder = embedder or HashingEmbedder()
    return [float(x) for x in embedder.embed_one(text)]
