"""Product quantization (PQ) ANN: compressed-domain similarity search.

The third tier of the engine's ANN story (SURVEY.md §4.3), alongside IVF
(operators/ivf.py: partition pruning = scan less) and LSH (operators/
lsh_ann.py: bucket probing = scan less). PQ instead makes every scanned row
radically cheaper: vectors are stored as M uint8 codes (one per subspace)
and queries score rows by table lookups — no float vector is read at query
time. Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the same layout FAISS calls IndexPQ.

- TRAIN: split the dim into M contiguous subspaces; per subspace, a seeded
  KMeans (driver-side NumPy over a bounded sample — the codebook is tiny)
  learns ksub centroids. Codebooks are M·ksub·(dim/M) floats ≈ the size of
  a handful of vectors: broadcast freely.
- ENCODE: one Arrow map per row → M uint8s. dim·4 bytes becomes M bytes
  (32× at dim=64, M=8) — the 100 TB lever: the scan that serves queries
  reads ~3% of the bytes the float column costs, and never shuffles.
- QUERY (ADC — asymmetric distance computation): the query stays
  un-quantized; a (M, ksub) table of per-subspace partial dot products is
  computed driver-side and broadcast; each row's score is M table lookups
  summed in a vectorized NumPy kernel. Exact top-R by ADC score, then an
  optional exact rerank of those R float vectors recovers recall — the
  standard PQ + rerank recipe.

Recall is MEASURED against exact KNN (tests/test_pq.py), never assumed —
same policy as IVF/LSH. No oracle entry: KMeans codebooks are
sample/iteration-order specific (rows-only class, like ann_ivf_topk).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kmeans_1d(data: np.ndarray, k: int, *, seed: int, iters: int = 25) -> np.ndarray:
    """Seeded Lloyd's KMeans over (n, d) rows → (k, d) centroids. Driver-side
    NumPy on a bounded sample: the codebook problem is tiny by construction
    (n ≤ sample cap, d = dim/M), so pyspark.ml machinery would be overhead."""
    rng = np.random.default_rng(seed)
    k = min(k, len(data))
    cents = data[rng.choice(len(data), size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d2 = ((data[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = data[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


@dataclass
class PQCodebook:
    """M per-subspace centroid tables, (M, ksub, dsub) float64."""

    codebooks: np.ndarray
    dim: int

    @property
    def n_subspaces(self) -> int:
        return int(self.codebooks.shape[0])

    @property
    def ksub(self) -> int:
        return int(self.codebooks.shape[1])


def train_pq(
    df: DataFrame,
    vector_col: str,
    *,
    n_subspaces: int = 8,
    ksub: int = 64,
    sample_rows: int = 20_000,
    seed: int = 42,
) -> PQCodebook:
    """Learn the codebooks from a bounded sample of the corpus (PQ training
    needs only a representative sample — FAISS defaults are similar)."""
    sample = (
        df.select(F.col(vector_col).alias("v")).limit(sample_rows).toPandas()
    )
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in sample["v"]])
    dim = mat.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    dsub = dim // n_subspaces
    books = np.stack(
        [
            _kmeans_1d(mat[:, m * dsub : (m + 1) * dsub], ksub, seed=seed + m)
            for m in range(n_subspaces)
        ]
    )
    return PQCodebook(codebooks=books, dim=dim)


def encode_pq(
    df: DataFrame, codebook: PQCodebook, *, id_col: str, vector_col: str
) -> DataFrame:
    """(id, codes array<smallint>) — M bytes of payload per vector. Narrow
    Arrow map; the float column is read once at encode time and never again
    on the query path."""
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(codebook.codebooks)
    M, ksub, dsub = codebook.codebooks.shape

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            codes = np.empty((len(a), M), dtype=np.int16)
            for m in range(M):
                sub = a[:, m * dsub : (m + 1) * dsub]
                d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1).astype(np.int16)
            yield pd.DataFrame({"id": pdf["id"], "codes": list(codes)})

    src = df.select(F.col(id_col).alias("id"), F.col(vector_col).alias("v"))
    return src.mapInPandas(kern, "id long, codes array<smallint>")


def pq_search(
    encoded: DataFrame,
    codebook: PQCodebook,
    query_vector: list[float],
    k: int,
    *,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    id_col: str = "id",
    vector_col: str = "v",
) -> DataFrame:
    """Top-k by ADC dot-product score over the code column.

    With ``rerank`` (the original (id, vector) relation), the top
    k·rerank_factor ADC candidates are re-scored exactly — the candidate set
    is tiny, so the join is broadcast and only k·rerank_factor float vectors
    are ever touched. Scores are Atlas-rescaled cosine-free raw dot products
    rounded to 6 dp with (score DESC, id ASC) total order, matching the
    engine's ranking conventions."""
    q = np.asarray(query_vector, dtype=np.float64)
    books = codebook.codebooks
    M, ksub, dsub = books.shape
    # ADC table: partial dot product of each subspace centroid with the
    # query's matching slice — (M, ksub) floats, broadcast via closure
    table = np.stack(
        [books[m] @ q[m * dsub : (m + 1) * dsub] for m in range(M)]
    )
    spark = encoded.sparkSession
    bc = spark.sparkContext.broadcast(table)

    import pandas as pd

    def score_kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = bc.value
        rows = np.arange(t.shape[0])
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            scores = t[rows[None, :], codes].sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "adc_score": np.round(scores, 6)})

    scored = encoded.mapInPandas(score_kern, "id long, adc_score double")
    n_cand = k * rerank_factor if rerank is not None else k
    top = scored.orderBy(F.desc("adc_score"), F.asc("id")).limit(n_cand)
    if rerank is None:
        return top.select(F.col("id"), F.col("adc_score").alias("score"))

    from ..functions.vector import dot

    top_ids = top.select(F.col("id").alias("__cand_id"))
    cand = rerank.join(
        F.broadcast(top_ids), rerank[id_col] == F.col("__cand_id")
    ).select(
        F.col("__cand_id").alias("out_id"),
        F.round(dot(F.col(vector_col), [float(x) for x in q]), 6).alias("score"),
    )
    return (
        cand.orderBy(F.desc("score"), F.asc("out_id"))
        .limit(k)
        .select(F.col("out_id").alias("id"), "score")
    )


def pq_search_batch(
    encoded: DataFrame,
    codebook: PQCodebook,
    queries: list[tuple[int, list[float]]],
    k: int,
    *,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    id_col: str = "id",
    vector_col: str = "v",
) -> DataFrame:
    """ADC search for a BATCH of queries as ONE plan. All queries' ADC
    tables stack into one (nq, M, ksub) broadcast; the Arrow kernel scores
    every query against each code batch in one fancy-indexing lookup,
    emitting (query_id, id, adc_score); knn.topk_per_group takes per-query
    ADC top-R; the optional exact rerank joins the R·nq candidate ids (tiny,
    broadcast) back to the float vectors ONCE for the whole batch and
    re-scores via the joined qvec column. Same scores and ordering as
    pq_search per query — the batch shape removes the per-query plan and the
    per-query code-column scan (one compressed-domain scan serves the whole
    batch)."""
    import pandas as pd

    from .knn import topk_per_group

    books = codebook.codebooks
    M, ksub, dsub = books.shape
    qids = [int(qid) for qid, _ in queries]
    qmat = np.stack([np.asarray(qv, dtype=np.float64) for _, qv in queries])
    tables = np.stack(
        [
            np.stack([books[m] @ q[m * dsub : (m + 1) * dsub] for m in range(M)])
            for q in qmat
        ]
    )  # (nq, M, ksub)
    spark = encoded.sparkSession
    bc = spark.sparkContext.broadcast((np.asarray(qids, dtype=np.int64), tables))

    def score_kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_arr, t = bc.value
        nq = len(ids_arr)
        rows = np.arange(M)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            # (nq, n_rows): per query, sum of its table's lookups over codes
            scores = t[:, rows[None, :], codes].sum(axis=2)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids_arr, n),
                    "id": np.tile(pdf["id"].to_numpy(), nq),
                    "adc_score": np.round(scores.reshape(-1), 6),
                }
            )

    scored = encoded.mapInPandas(
        score_kern, "query_id bigint, id long, adc_score double"
    )
    n_cand = k * rerank_factor if rerank is not None else k
    top = topk_per_group(
        scored, n_cand, group_col="query_id", score_col="adc_score", id_col="id"
    )
    if rerank is None:
        return top.select("query_id", "id", F.col("adc_score").alias("score"))

    from ..functions.vector import dot

    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        "query_id bigint, __qvec array<double>",
    )
    cand = (
        rerank.join(
            F.broadcast(top.select("query_id", F.col("id").alias("__cand_id"))),
            rerank[id_col] == F.col("__cand_id"),
        )
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col("__cand_id").alias("id"),
            F.round(dot(F.col(vector_col), F.col("__qvec")), 6).alias("score"),
        )
    )
    return topk_per_group(
        cand, k, group_col="query_id", score_col="score", id_col="id"
    )
