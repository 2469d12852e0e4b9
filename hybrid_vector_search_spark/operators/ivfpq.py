"""IVF-PQ ANN: coarse partition pruning × residual product quantization.

The composed index FAISS calls IndexIVFPQ (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011, §V): a coarse
quantizer (the KMeans layout of operators/ivf.py) prunes the scan to
``nprobe`` of ``n_clusters`` partitions, and inside them every vector exists
only as M uint8 codes of its RESIDUAL ``v − coarse_centroid`` — the engine's
two scan levers multiplied: read nprobe/n_clusters of the ROWS and ~3% of
the BYTES per row read (operators/pq.py's 32× at dim 64 / M 8). This is the
fourth ANN tier next to IVF (scan fewer rows), LSH (scan fewer buckets) and
PQ (scan cheaper rows); the reference's only dial is Atlas HNSW's
``numCandidates`` (reference backend/api.py:120,168-176), which ``nprobe``
and ``rerank_factor`` jointly reproduce.

Residual encoding (not raw-vector PQ) is the load-bearing detail: within a
cluster the residuals concentrate near zero with far lower variance than the
raw vectors, so the same ksub-centroid codebook spends its centroids on a
much tighter distribution — quantization error drops at identical storage
cost (pinned against raw PQ in tests/test_ivfpq.py).

ADC at query time factors cleanly:  dot(v, q) ≈ dot(c, q) + dot(dec(r), q).
The per-subspace residual lookup tables depend ONLY on the query (one shared
codebook set), and the coarse term is a per-(query, cluster) SCALAR — so the
batch probe relation carries the scalar offset column while ONE
(nq, M, ksub) table broadcast serves every probed cluster. Euclidean (r8)
factors per subspace too, but its tables are per-(query, cluster) —
||q − (c + dec(r))||² = Σ_m ||(q_m − c_m) − book_m[j_m]||² — still only
nq·nprobe tiny tables in one broadcast (_ivfpq_search_batch_euclidean);
scores surface as the Atlas 1/(1+√d²) rescale, rank-equal to distance. At 100 TB the
probe join's equi-key is the partition key (directory-pruned scan), the code
column is the only per-row payload read, and the optional exact rerank
touches k·rerank_factor float vectors per query via a broadcast join — the
corpus float column never scans on the query path.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pq import _kmeans_1d


@dataclass
class IVFPQIndex:
    """Coarse centroids + residual codebooks + the partitioned code layout."""

    path: str
    centroids: np.ndarray  # (n_clusters, dim) float64, the coarse quantizer
    codebooks: np.ndarray  # (M, ksub, dsub) float64, trained on residuals
    id_col: str
    vector_col: str
    metric: str

    @property
    def n_subspaces(self) -> int:
        return int(self.codebooks.shape[0])

    def save(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(f"{self.path}/_ivfpq_meta.json", "w") as f:
            json.dump(
                {
                    "centroids": self.centroids.tolist(),
                    "codebooks": self.codebooks.tolist(),
                    "id_col": self.id_col,
                    "vector_col": self.vector_col,
                    "metric": self.metric,
                },
                f,
            )

    @staticmethod
    def load(path: str) -> "IVFPQIndex":
        with open(f"{path}/_ivfpq_meta.json") as f:
            meta = json.load(f)
        return IVFPQIndex(
            path=path,
            centroids=np.asarray(meta["centroids"], dtype=np.float64),
            codebooks=np.asarray(meta["codebooks"], dtype=np.float64),
            id_col=meta["id_col"],
            vector_col=meta["vector_col"],
            metric=meta["metric"],
        )

    def nearest_clusters(self, query_vector: list[float], nprobe: int) -> list[int]:
        """Same probing rule as ivf.IVFIndex: euclidean probes by distance,
        cosine/dotProduct by direction."""
        q = np.asarray(query_vector, dtype=np.float64)
        c = self.centroids
        if self.metric == "euclidean":
            order = np.argsort(np.linalg.norm(c - q, axis=1))
        else:
            sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-12)
            order = np.argsort(-sims)
        return [int(i) for i in order[:nprobe]]


def build_ivfpq(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    n_clusters: int = 16,
    n_subspaces: int = 8,
    ksub: int = 64,
    sample_rows: int = 20_000,
    metric: str = "cosine",
    seed: int = 42,
    max_iter: int = 20,
) -> IVFPQIndex:
    """Fit the coarse quantizer (distributed KMeans — the one corpus-scale
    pass), learn residual codebooks on a bounded sample, residual-encode
    every row in one Arrow map, write parquet PARTITIONED BY cluster_id with
    (id, codes) as the only payload. The float vectors stay in the source
    relation for rerank; the serving layout is pure compressed domain."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn(
        "_features", array_to_vector(F.col(vector_col).cast("array<double>"))
    )
    km = KMeans(
        k=n_clusters,
        seed=seed,
        maxIter=max_iter,
        featuresCol="_features",
        predictionCol="cluster_id",
    )
    model = km.fit(feat)
    assigned = model.transform(feat).drop("_features")
    centroids = np.array(
        [np.asarray(c) for c in model.clusterCenters()], dtype=np.float64
    )
    dim = centroids.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    dsub = dim // n_subspaces

    # residual codebooks from a bounded sample (the PQ training contract:
    # a representative sample is enough — FAISS trains the same way)
    sample = (
        assigned.select(F.col(vector_col).alias("v"), "cluster_id")
        .limit(sample_rows)
        .toPandas()
    )
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in sample["v"]])
    resid = mat - centroids[sample["cluster_id"].to_numpy()]
    books = np.stack(
        [
            _kmeans_1d(resid[:, m * dsub : (m + 1) * dsub], ksub, seed=seed + m)
            for m in range(n_subspaces)
        ]
    )
    index = IVFPQIndex(
        path=path,
        centroids=centroids,
        codebooks=books,
        id_col=id_col,
        vector_col=vector_col,
        metric=metric,
    )
    encode_ivfpq(assigned, index).write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(path)
    index.save()
    return index


def encode_ivfpq(assigned: DataFrame, index: IVFPQIndex) -> DataFrame:
    """(id, codes, cluster_id) from a relation that already carries
    cluster_id: subtract the row's coarse centroid, PQ-assign the residual —
    one NumPy pass per Arrow batch, map-only, no shuffle."""
    import pandas as pd

    sc = assigned.sparkSession.sparkContext
    bc = sc.broadcast((index.centroids, index.codebooks))
    M, ksub, dsub = index.codebooks.shape
    id_col, vector_col = index.id_col, index.vector_col

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents, books = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vector_col]])
            resid = mat - cents[pdf["cluster_id"].to_numpy()]
            codes = np.empty((len(mat), M), dtype=np.int16)
            for m in range(M):
                sub = resid[:, m * dsub : (m + 1) * dsub]
                d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1).astype(np.int16)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "codes": list(codes),
                    "cluster_id": pdf["cluster_id"].astype("int32"),
                }
            )

    src = assigned.select(id_col, vector_col, "cluster_id")
    return src.mapInPandas(kern, "id long, codes array<smallint>, cluster_id int")


def ivfpq_add(spark: SparkSession, index: IVFPQIndex, new_rows: DataFrame) -> None:
    """Append new vectors WITHOUT retraining either quantizer (the FAISS
    add-vs-train split, same policy as ivf.ivf_add): nearest-existing-centroid
    assignment (one Arrow argmin per batch), residual-encode against the
    frozen codebooks, partitioned append. Ingest stays a pure map; queries
    see added rows immediately (partition pruning is directory-based).
    Centroid/codebook drift degrades assignment and quantization quality,
    never correctness — rerank still scores exactly; rebuild cadence is the
    caller's policy."""
    from .ivf import IVFIndex, assign_clusters

    coarse = IVFIndex(
        path=index.path,
        centroids=index.centroids,
        id_col=index.id_col,
        vector_col=index.vector_col,
        metric=index.metric,
    )
    assigned = assign_clusters(new_rows, coarse)
    encode_ivfpq(assigned, index).write.mode("append").partitionBy(
        "cluster_id"
    ).parquet(index.path)


def ivfpq_search_batch(
    spark: SparkSession,
    index: IVFPQIndex,
    queries: list[tuple[int, list[float]]],
    k: int,
    *,
    nprobe: int = 4,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    layout: DataFrame | None = None,
) -> DataFrame:
    """Serve a BATCH of queries as ONE plan over the partitioned code layout.

    The probe relation is (query_id, cluster_id, coarse_offset) — tiny,
    broadcast; its equi-join key is the layout's PARTITION key, so the scan
    is pruned to the union of probed clusters. The Arrow kernel scores each
    probed row by M residual-table lookups + the row's coarse offset (the
    ADC factorization from the module docstring); knn.topk_per_group takes
    per-query top-k with no global sort. With ``rerank`` (the original
    (id, vector) relation) the top k·rerank_factor ADC candidates are
    re-scored exactly through a broadcast join — the standard recall-recovery
    recipe, identical to pq.pq_search_batch's."""
    import pandas as pd

    from ..functions.vector import atlas_score, dot
    from .knn import topk_per_group

    if index.metric not in ("cosine", "dotProduct", "euclidean"):
        raise ValueError(
            f"unknown ivfpq metric {index.metric!r}; expected cosine, "
            "dotProduct or euclidean"
        )
    if index.metric == "euclidean":
        return _ivfpq_search_batch_euclidean(
            spark, index, queries, k,
            nprobe=nprobe, rerank=rerank, rerank_factor=rerank_factor,
            layout=layout,
        )
    books = index.codebooks
    M, ksub, dsub = books.shape
    qids = [int(qid) for qid, _ in queries]
    qmat = np.stack([np.asarray(qv, dtype=np.float64) for _, qv in queries])
    # residual ADC tables: (nq, M, ksub) — query-only, cluster-independent
    tables = np.stack(
        [
            np.stack([books[m] @ q[m * dsub : (m + 1) * dsub] for m in range(M)])
            for q in qmat
        ]
    )
    probe_rows = []
    for (qid, qv), q in zip(queries, qmat):
        for c in index.nearest_clusters(qv, nprobe):
            # the coarse term dot(centroid_c, q): a scalar per (query, cluster)
            probe_rows.append(
                (int(qid), int(c), float(index.centroids[c] @ q))
            )
    probes = spark.createDataFrame(
        probe_rows, "query_id bigint, cluster_id int, coarse_offset double"
    )
    if layout is None:
        layout = spark.read.parquet(index.path)
    probed = layout.join(F.broadcast(probes), "cluster_id")

    bc = spark.sparkContext.broadcast((np.asarray(qids, dtype=np.int64), tables))

    def score_kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_arr, t = bc.value
        pos = {int(q): i for i, q in enumerate(ids_arr)}
        cols = np.arange(M)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            qidx = pdf["query_id"].map(pos).to_numpy(dtype=np.int64)
            resid_score = t[qidx[:, None], cols[None, :], codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "id": pdf["id"],
                    "adc_score": np.round(
                        resid_score + pdf["coarse_offset"].to_numpy(), 6
                    ),
                }
            )

    scored = probed.select("query_id", "id", "codes", "coarse_offset").mapInPandas(
        score_kern, "query_id bigint, id long, adc_score double"
    )
    n_cand = k * rerank_factor if rerank is not None else k
    top = topk_per_group(
        scored, n_cand, group_col="query_id", score_col="adc_score", id_col="id"
    )
    if rerank is None:
        return top.select("query_id", "id", F.col("adc_score").alias("score"))

    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        "query_id bigint, __qvec array<double>",
    )
    cand = (
        rerank.join(
            F.broadcast(top.select("query_id", F.col("id").alias("__cand_id"))),
            rerank[index.id_col] == F.col("__cand_id"),
        )
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col("__cand_id").alias("id"),
            F.round(dot(F.col(index.vector_col), F.col("__qvec")), 6).alias("score"),
        )
    )
    return topk_per_group(cand, k, group_col="query_id", score_col="score", id_col="id")



def _ivfpq_search_batch_euclidean(
    spark: SparkSession,
    index: IVFPQIndex,
    queries: list[tuple[int, list[float]]],
    k: int,
    *,
    nprobe: int = 4,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    layout: DataFrame | None = None,
) -> DataFrame:
    """Euclidean ADC: the squared distance to a reconstruction decomposes
    per subspace — ||q − (c + Σ_m book_m[j_m])||² = Σ_m ||(q_m − c_m) −
    book_m[j_m]||² — so unlike the dot-product factorization (query-only
    tables + a per-(query, cluster) scalar), the lookup tables here are
    per-(query, cluster): E[m][j] = ||diff_m||² − 2·book_m[j]·diff_m +
    ||book_m[j]||² with diff = q − centroid_c. Still tiny — nq·nprobe
    tables of (M, ksub) doubles, one broadcast — and the plan shape is
    identical to the dot path: broadcast probe join prunes the partitioned
    layout, one Arrow kernel does M lookups per row, topk_per_group takes
    per-query top-k. Scores are the Atlas euclidean rescale
    1/(1 + √d²) (monotone in −d², the same observable contract as
    ivf_search/knn euclidean); rerank re-scores exactly through
    functions.vector.atlas_score."""
    import pandas as pd

    from ..functions.vector import atlas_score
    from .knn import topk_per_group

    books = index.codebooks
    M, ksub, dsub = books.shape
    qmat = np.stack([np.asarray(qv, dtype=np.float64) for _, qv in queries])
    norms_b = np.stack([(books[m] ** 2).sum(axis=1) for m in range(M)])  # (M, ksub)
    probe_rows, tables = [], {}
    for (qid, _qv), q in zip(queries, qmat):
        for c in index.nearest_clusters([float(x) for x in q], nprobe):
            diff = q - index.centroids[c]
            sub = diff.reshape(M, dsub)  # (M, dsub)
            # E[m] = ||diff_m||² − 2·books[m]·diff_m + ||books[m][:]||²
            e = (
                (sub**2).sum(axis=1)[:, None]
                - 2.0 * np.einsum("mkd,md->mk", books, sub)
                + norms_b
            )
            tables[(int(qid), int(c))] = e
            probe_rows.append((int(qid), int(c)))
    probes = spark.createDataFrame(probe_rows, "query_id bigint, cluster_id int")
    if layout is None:
        layout = spark.read.parquet(index.path)
    probed = layout.join(F.broadcast(probes), "cluster_id")
    bc = spark.sparkContext.broadcast(tables)

    def score_kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = bc.value
        cols = np.arange(M)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            d2 = np.empty(len(pdf), dtype=np.float64)
            keys = list(zip(pdf["query_id"].tolist(), pdf["cluster_id"].tolist()))
            for i, key in enumerate(keys):
                d2[i] = t[key][cols, codes[i]].sum()
            score = 1.0 / (1.0 + np.sqrt(np.maximum(d2, 0.0)))
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "id": pdf["id"],
                    "adc_score": np.round(score, 6),
                }
            )

    scored = probed.select("query_id", "id", "codes", "cluster_id").mapInPandas(
        score_kern, "query_id bigint, id long, adc_score double"
    )
    n_cand = k * rerank_factor if rerank is not None else k
    top = topk_per_group(
        scored, n_cand, group_col="query_id", score_col="adc_score", id_col="id"
    )
    if rerank is None:
        return top.select("query_id", "id", F.col("adc_score").alias("score"))
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        "query_id bigint, __qvec array<double>",
    )
    cand = (
        rerank.join(
            F.broadcast(top.select("query_id", F.col("id").alias("__cand_id"))),
            rerank[index.id_col] == F.col("__cand_id"),
        )
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col("__cand_id").alias("id"),
            F.round(
                atlas_score(F.col(index.vector_col), F.col("__qvec"), "euclidean"), 6
            ).alias("score"),
        )
    )
    return topk_per_group(cand, k, group_col="query_id", score_col="score", id_col="id")


def ivfpq_search(
    spark: SparkSession,
    index: IVFPQIndex,
    query_vector: list[float],
    k: int,
    *,
    nprobe: int = 4,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    layout: DataFrame | None = None,
) -> DataFrame:
    """Single-query convenience over the batch plan (the serving path is the
    batch one; a single query is a batch of one)."""
    out = ivfpq_search_batch(
        spark,
        index,
        [(0, [float(x) for x in query_vector])],
        k,
        nprobe=nprobe,
        rerank=rerank,
        rerank_factor=rerank_factor,
        layout=layout,
    )
    return out.drop("query_id")
