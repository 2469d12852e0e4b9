"""Scalar quantization (SQ8) ANN: 4x-compressed vectors, no training data.

The fourth tier of the engine's ANN story, next to IVF (scan less:
partition pruning), LSH (scan less: bucket probing) and PQ (scan cheaper:
32x codes + table lookups). SQ8 is the zero-training member of the
compressed family — per dimension, an affine map onto uint8:

    code_i = clip( floor((x_i - lo_i) / (hi_i - lo_i) * 256), 0, 255 )
    decode(code_i) = lo_i + (code_i + 0.5) * (hi_i - lo_i) / 256

(the midpoint-reconstruction rule FAISS's ScalarQuantizer QT_8bit uses).
float32[dim] becomes uint8[dim]: 4x less storage and memory bandwidth with
near-exact recall at typical embedding distributions — the cheapest
compression step a 100 TB vector corpus takes before reaching for PQ.

- TRAIN: per-dimension (lo, hi) — ONE distributed aggregate over the
  corpus (posexplode -> groupBy(dim) min/max, map-side combined; the same
  dim-grouped sufficient-stats shape as the Mahalanobis stats). The
  "codebook" is 2·dim floats: broadcast freely, exact, no sampling and no
  seed.
- ENCODE: one Arrow map per row -> dim uint8s packed as BINARY. The float
  column is read once at encode time and never again on the query path.
- QUERY (ADC): the query stays un-quantized; each row's cosine against its
  DECODED vector needs only dot(q·step, c) + const and the decoded norm —
  both vectorized NumPy over the unpacked uint8 matrix, never
  materializing float vectors per row in Python objects.

Recall is MEASURED against exact KNN (tests/test_sq.py and the
self-attesting driver row), never assumed. The affine bounds are corpus
statistics, not SQL-replayable per-row math once packed into BINARY —
rows-only class for the code relation; the driver row pins the recall
CONTRACT like ann_ivf/ann_lsh/ann_pq do.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SQParams:
    """Per-dimension affine bounds, (dim,) float64 each."""

    lo: np.ndarray
    hi: np.ndarray

    @property
    def dim(self) -> int:
        return int(self.lo.shape[0])

    @property
    def step(self) -> np.ndarray:
        return (self.hi - self.lo) / 256.0


def train_sq(df: DataFrame, vector_col: str) -> SQParams:
    """Exact per-dimension (min, max) in ONE distributed aggregate.

    posexplode keeps the shuffle payload at (dim_idx, partial_min,
    partial_max) per map partition — map-side combine reduces each
    partition to <= dim rows before the exchange, so the pass is scan-bound
    at any corpus size. The collected result is 2·dim doubles (the
    centroid-sized driver collect the PQ/IVF builders also make)."""
    stats = (
        df.select(F.posexplode(F.col(vector_col)).alias("idx", "x"))
        .groupBy("idx")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("idx")
        .collect()
    )
    lo = np.array([r["lo"] for r in stats], dtype=np.float64)
    hi = np.array([r["hi"] for r in stats], dtype=np.float64)
    # degenerate (constant) dimensions: keep step > 0 so encode/decode are
    # well-defined; every value maps to code 0 and decodes to lo + tiny/512
    hi = np.where(hi > lo, hi, lo + 1e-12)
    return SQParams(lo=lo, hi=hi)


def encode_sq(
    df: DataFrame, params: SQParams, *, id_col: str, vector_col: str
) -> DataFrame:
    """(id, codes BINARY) — dim bytes of payload per vector (4x down from
    float32, 8x from float64). Narrow Arrow map, vectorized across the
    batch; bytes objects cross into Arrow BinaryType without copies."""
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast((params.lo, params.hi))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lo, hi = bc.value
        step = (hi - lo) / 256.0
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            q = np.floor((a - lo) / step)
            codes = np.clip(q, 0, 255).astype(np.uint8)
            yield pd.DataFrame(
                {"id": pdf["id"], "codes": [c.tobytes() for c in codes]}
            )

    src = df.select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
    return src.mapInPandas(kern, "id long, codes binary")


def sq_search_batch(
    encoded: DataFrame,
    params: SQParams,
    queries: list[tuple[int, list[float]]],
    k: int,
    *,
    id_col: str = "id",
) -> DataFrame:
    """(query_id, vec_id, score) — top-k per query by exact cosine between
    the un-quantized query and each row's DECODED vector (asymmetric
    distance, one batch plan for the whole query set).

    Kernel math: decoded = lo + (codes + 0.5) * step, so
        dot(q, decoded)  = q·lo + (q*step)·(codes + 0.5)
        |decoded|^2      = row-wise over the same decoded matrix
    — one uint8->float matrix per Arrow batch, a (dim, n_queries) matmul
    for ALL queries at once, zero Python per row. The per-partition top-k
    prune keeps the shuffle at partitions x queries x k rows (the knn_join
    discipline); scores are Atlas-rescaled cosine rounded to 6 dp with
    (score DESC, id ASC) total order."""
    import pandas as pd

    qids = [int(qid) for qid, _ in queries]
    qmat = np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    spark = encoded.sparkSession
    bc = spark.sparkContext.broadcast((params.lo, params.hi, qids, qmat))

    def score_kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lo, hi, qids_, qmat_ = bc.value
        step = (hi - lo) / 256.0
        qnorm = np.sqrt((qmat_ * qmat_).sum(axis=1))  # (Q,)
        dim = lo.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            codes = (
                np.frombuffer(b"".join(pdf["codes"]), dtype=np.uint8)
                .reshape(len(pdf), dim)
                .astype(np.float64)
            )
            dec = lo + (codes + 0.5) * step  # (B, dim)
            dots = dec @ qmat_.T  # (B, Q)
            dnorm = np.sqrt((dec * dec).sum(axis=1))  # (B,)
            cos = dots / (dnorm[:, None] * qnorm[None, :])
            score = np.round((1.0 + cos) / 2.0, 6)
            n, Q = score.shape
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(np.asarray(qids_, dtype=np.int64), n),
                    "vec_id": np.tile(pdf["id"].to_numpy(), Q),
                    "score": score.T.reshape(-1),
                }
            )
            # per-batch top-k prune: never emit more than Q*k rows per batch
            out = (
                out.sort_values(
                    ["query_id", "score", "vec_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(k)
            )
            yield out

    scored = encoded.mapInPandas(
        score_kern, "query_id long, vec_id long, score double"
    )
    from .knn import topk_per_group

    return topk_per_group(
        scored, k, group_col="query_id", score_col="score", id_col="vec_id"
    )
