"""LSH-bucketed approximate nearest neighbour (the second ANN scale path).

Complements operators.ivf: random-hyperplane LSH (Charikar 2002, SimHash for
angles) instead of learned centroids. Where IVF needs a KMeans build pass,
LSH is DATA-INDEPENDENT — the "index" is just a seeded set of hyperplanes,
so ingest is a pure map (no training job, no skewed-centroid repair) and the
same planes bucket new rows forever, which is exactly what a continuously
ingesting 100 TB corpus wants.

- BUILD: ``bits`` seeded Gaussian hyperplanes; each vector's bucket is the
  bit pattern of sign(v·plane_i) — computed in one NumPy matmul per Arrow
  batch (map-only, no shuffle). Corpus written partitioned by bucket.
- QUERY: the query's bucket is computed driver-side; candidates are the rows
  in every bucket within Hamming distance ``probe_hamming`` of it (multi-
  probe: 1 + bits + bits·(bits−1)/2 buckets for distance ≤2 — still a tiny
  fraction of 2^bits). Exact cosine reranks the candidates.

Recall rises with probe_hamming (→ all buckets = exact); measured in
tests/test_lsh_ann.py, never assumed. Cosine-only: random hyperplanes
preserve angles, not Euclidean distances.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import knn


def _planes(dim: int, bits: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, bits))


def _bucket_of(vec: np.ndarray, planes: np.ndarray) -> int:
    bits_arr = (vec @ planes) >= 0.0
    out = 0
    for i, b in enumerate(bits_arr):
        if b:
            out |= 1 << i
    return out


@dataclass
class LSHIndex:
    bits: int
    seed: int
    dim: int
    id_col: str
    vector_col: str

    @property
    def planes(self) -> np.ndarray:
        return _planes(self.dim, self.bits, self.seed)

    def probe_buckets(self, query_vector: list[float], probe_hamming: int) -> list[int]:
        """The query's bucket plus every bucket within the Hamming radius."""
        base = _bucket_of(np.asarray(query_vector, dtype=np.float64), self.planes)
        buckets = {base}
        for radius in range(1, min(probe_hamming, self.bits) + 1):
            for idxs in combinations(range(self.bits), radius):
                flipped = base
                for i in idxs:
                    flipped ^= 1 << i
                buckets.add(flipped)
        return sorted(buckets)


def with_buckets(df: DataFrame, index: LSHIndex) -> DataFrame:
    """Map-only bucket assignment: one NumPy matmul per Arrow batch."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    planes = index.planes
    vector_col = index.vector_col
    out_schema = StructType(df.schema.fields + [StructField("lsh_bucket", IntegerType())])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vector_col]])
            if len(mat) == 0:
                pdf["lsh_bucket"] = pd.Series([], dtype="int32")
                yield pdf
                continue
            signs = (mat @ planes) >= 0.0
            pdf = pdf.copy()
            pdf["lsh_bucket"] = (signs @ (1 << np.arange(planes.shape[1]))).astype(
                "int32"
            )
            yield pdf

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par).mapInPandas(kernel, out_schema)


def lsh_search(
    corpus_with_buckets: DataFrame,
    index: LSHIndex,
    query_vector: list[float],
    k: int,
    *,
    probe_hamming: int = 1,
) -> DataFrame:
    """Probe Hamming-near buckets, exact-rerank candidates by cosine.

    On a bucket-partitioned table the IN-list prunes partitions exactly like
    IVF's nprobe; here (single-file testdata) it is a pushed-down scan filter."""
    buckets = index.probe_buckets(query_vector, probe_hamming)
    candidates = corpus_with_buckets.where(F.col("lsh_bucket").isin(buckets))
    return knn(candidates, query_vector, k, metric="cosine")


def lsh_search_batch(
    corpus_with_buckets: DataFrame,
    index: LSHIndex,
    queries: list[tuple[int, list[float]]],
    k: int,
    *,
    probe_hamming: int = 1,
) -> DataFrame:
    """Multi-probe LSH for a BATCH of queries as ONE plan: (query_id, qvec,
    probe-bucket) rows form a broadcast relation equi-joined against the
    bucketed corpus, scored by zip_with cosine against the joined qvec
    column, then partition-local top-k per query (knn.topk_per_group — no
    global sort, no full score stream on one reducer).

    Returns (query_id, {id_col}, score). This is the serving shape for query
    THROUGHPUT: per-query plans cost a driver round of analysis each and
    scan the corpus once per query, while the probe-join scans once for the
    whole batch and the broadcast side stays |queries|·|probes| rows no
    matter the corpus size. On a bucket-partitioned table the join key IS
    the partition key, so dynamic partition pruning keeps the scan to the
    union of probed buckets."""
    from ..functions.vector import atlas_score
    from .knn import topk_per_group

    spark = corpus_with_buckets.sparkSession
    rows = [
        (int(qid), [float(x) for x in qv], int(b))
        for qid, qv in queries
        for b in index.probe_buckets(qv, probe_hamming)
    ]
    probes = spark.createDataFrame(
        rows, "query_id bigint, __qvec array<double>, lsh_bucket int"
    )
    scored = (
        corpus_with_buckets.join(F.broadcast(probes), "lsh_bucket")
        .withColumn(
            "score",
            F.round(atlas_score(F.col(index.vector_col), F.col("__qvec"), "cosine"), 6),
        )
        .select("query_id", index.id_col, "score")
    )
    return topk_per_group(
        scored, k, group_col="query_id", score_col="score", id_col=index.id_col
    )
