"""IVF-style approximate nearest-neighbour layout (the numCandidates dial).

The reference's ANN quality/latency knob is ``numCandidates`` — how many HNSW
candidates Atlas explores before returning top-k (reference
backend/api.py:120,168-176; local-test.py:151). Spark has no ANN index; the
idiomatic equivalent (SURVEY.md §4.3) is an IVF (inverted-file) layout
(Jégou et al. 2011):

- BUILD: KMeans (pyspark.ml) fits ``n_clusters`` centroids on the embedding
  column; every row is assigned its nearest centroid; the corpus is written
  as parquet PARTITIONED BY cluster_id.
- QUERY: the query vector is compared to the centroids driver-side (tiny),
  the ``nprobe`` nearest clusters are selected, and the scan reads ONLY those
  partitions (partition pruning — visible as a PartitionFilters entry in the
  scan node). Exact KNN then reranks within the probed subset.

``nprobe`` ≡ numCandidates: recall rises toward 1.0 as nprobe → n_clusters,
at proportional scan cost. Recall is measured, not assumed
(tests/test_ivf.py), and the exact path stays the correctness default.

Scale: at 100 TB the build is one KMeans over a sample + one partitioned
write; queries read nprobe/n_clusters of the data. Skewed clusters (natural
in real embeddings) can be split by capping partition size at write
(maxRecordsPerFile) without changing query semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .knn import knn


@dataclass
class IVFIndex:
    path: str
    centroids: np.ndarray  # (n_clusters, dim), float64
    id_col: str
    vector_col: str
    metric: str

    def save(self) -> None:
        """Persist centroids + config next to the partitioned data, making
        the index a durable artifact (the reference's index lives inside
        Atlas; ours is files)."""
        import json
        import os

        os.makedirs(self.path, exist_ok=True)
        with open(f"{self.path}/_ivf_meta.json", "w") as f:
            json.dump(
                {
                    "centroids": self.centroids.tolist(),
                    "id_col": self.id_col,
                    "vector_col": self.vector_col,
                    "metric": self.metric,
                },
                f,
            )

    @staticmethod
    def load(path: str) -> "IVFIndex":
        import json

        with open(f"{path}/_ivf_meta.json") as f:
            meta = json.load(f)
        return IVFIndex(
            path=path,
            centroids=np.asarray(meta["centroids"], dtype=np.float64),
            id_col=meta["id_col"],
            vector_col=meta["vector_col"],
            metric=meta["metric"],
        )

    def nearest_clusters(self, query_vector: list[float], nprobe: int) -> list[int]:
        q = np.asarray(query_vector, dtype=np.float64)
        c = self.centroids
        if self.metric == "euclidean":
            d = np.linalg.norm(c - q, axis=1)
            order = np.argsort(d)
        else:  # cosine / dotProduct both rank by direction for probing
            sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-12)
            order = np.argsort(-sims)
        return [int(i) for i in order[:nprobe]]


def build_ivf(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    n_clusters: int = 16,
    metric: str = "cosine",
    seed: int = 42,
    max_iter: int = 20,
    max_cluster_frac: float | None = None,
) -> IVFIndex:
    """Fit centroids, assign rows, write the partitioned layout.

    ``max_cluster_frac`` is the skew guard (real embedding corpora cluster
    unevenly — one hot centroid can swallow most of the corpus, making every
    probe that touches it scan ~everything): a cluster assigned more than
    ``max_cluster_frac`` of the rows is SPLIT into ``ceil(size/cap)``
    sub-centroids chosen as a deterministic SAMPLE of its own member vectors
    (xxhash64-ordered — seeded Voronoi sharding), then ALL rows re-assign to
    the final centroid set (one map-only Arrow pass, assign_clusters) before
    the partitioned write. Sampled-seed Voronoi cells over a dense region
    are near-balanced, which is the point; a sub-KMeans would instead chase
    the cluster's outliers (they dominate SSE) and leave the dense mass
    whole — measured in tests/test_ivf.py. Probe cost is thereby bounded:
    scanning ``nprobe`` partitions reads ~``nprobe * cap`` rows instead of
    the hot cluster's whole blob, and because each sub-centroid is a real
    position, probing stays geometric (nprobe nearest sub-cells ARE the
    query's neighborhood — no recall cliff from hash sharding). Query
    semantics are unchanged — the layout is a pruning structure; exact
    scoring happens inside the probed subset. The one irreducible case is a
    content-identical point mass (every seed coincides): that is a dedup
    problem, not an index-layout problem. Extra build cost: one sizes
    aggregate + one sample per oversized cluster (at most floor(1/frac) of
    them) + the re-assignment pass."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("_features", array_to_vector(F.col(vector_col).cast("array<double>")))
    km = KMeans(k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="_features",
                predictionCol="cluster_id")
    model = km.fit(feat)
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()], dtype=np.float64)
    if max_cluster_frac is not None:
        assigned = model.transform(feat)
        sizes = {
            r["cluster_id"]: r["n"]
            for r in assigned.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
        }
        total = sum(sizes.values())
        cap = max(1, int(total * max_cluster_frac))
        # sorted: sizes comes from an unordered collect(), and the final
        # centroid ordering defines the partitioned layout's cluster_ids —
        # iterate deterministically like the oversized-cluster loop below
        keep = [centroids[c] for c, n in sorted(sizes.items()) if n <= cap]
        for c, n in sorted(sizes.items()):
            if n <= cap:
                continue
            k_sub = int(-(-n // cap))  # ceil
            seeds = (
                assigned.where(F.col("cluster_id") == c)
                .select(vector_col)
                .orderBy(F.xxhash64(F.col(id_col), F.lit(seed + c)))
                .limit(k_sub)
                .collect()
            )
            keep.extend(
                np.asarray(r[vector_col], dtype=np.float64) for r in seeds
            )
        centroids = np.array(keep, dtype=np.float64)
    index = IVFIndex(path=path, centroids=centroids, id_col=id_col,
                     vector_col=vector_col, metric=metric)
    if max_cluster_frac is not None:
        assigned = assign_clusters(df, index)  # re-assign to the final set
    else:
        assigned = model.transform(feat).drop("_features")
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
    return index


def assign_clusters(df: DataFrame, index: IVFIndex) -> DataFrame:
    """Nearest-existing-centroid assignment for NEW vectors — one NumPy
    argmin per Arrow batch against the broadcast centroid matrix (the index
    is tiny by construction). Map-only, no shuffle; matches KMeans'
    squared-euclidean assignment rule, so added rows land exactly where the
    build pass would have put them."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = index.centroids
    vector_col = index.vector_col
    out_schema = StructType(
        df.schema.fields + [StructField("cluster_id", IntegerType())]
    )
    c_sq = (cents * cents).sum(axis=1)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
            )
            # argmin ||v - c||^2 = argmin (|c|^2 - 2 v.c); |v|^2 is constant
            d2 = c_sq[None, :] - 2.0 * (mat @ cents.T)
            pdf = pdf.copy()
            pdf["cluster_id"] = d2.argmin(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def ivf_add(spark: SparkSession, index: IVFIndex, new_rows: DataFrame) -> None:
    """Append new vectors to an existing IVF layout WITHOUT retraining:
    assign each row its nearest existing centroid and append to that
    cluster's partition directory. This is FAISS's add-vs-train split — the
    continuously-ingesting-corpus path (LSH gets it for free from
    data-independence; IVF gets it by freezing the centroids): ingest stays
    a pure map + partitioned append, no training job in the hot path.
    Centroids drift as the corpus grows, degrading assignment quality, not
    correctness (probing still reranks exactly); the rebuild cadence is the
    caller's policy. Queries over the layout (ivf_search / ivf_search_batch)
    see added rows immediately — partition pruning is directory-based."""
    assign_clusters(new_rows, index).write.mode("append").partitionBy(
        "cluster_id"
    ).parquet(index.path)


def measure_recall(
    spark: SparkSession,
    index: IVFIndex,
    corpus: DataFrame,
    query_vectors: list[list[float]],
    *,
    k: int = 10,
    nprobe: int = 4,
) -> float:
    """Recall@k of the probed search vs exact KNN, averaged over queries —
    the measured (never assumed) quality number for an nprobe setting."""
    total = 0.0
    for qv in query_vectors:
        exact = {r[index.id_col] for r in knn(
            corpus, qv, k, vector_col=index.vector_col, id_col=index.id_col,
            metric=index.metric, clamp=False,
        ).collect()}
        # clamp=False so k > the API's clamp ceiling doesn't silently
        # truncate the probed side and understate recall vs the exact side.
        probed = {r[index.id_col] for r in ivf_search(
            spark, index, qv, k, nprobe=nprobe, clamp=False
        ).collect()}
        total += len(exact & probed) / max(len(exact), 1)
    return total / max(len(query_vectors), 1)


def ivf_search(
    spark: SparkSession,
    index: IVFIndex,
    query_vector: list[float],
    k: int,
    *,
    nprobe: int = 4,
    pre_filter=None,
    round_dp: int | None = 6,
    clamp: bool = True,
    layout: DataFrame | None = None,
) -> DataFrame:
    """Probe nprobe clusters (partition-pruned scan) + exact rerank within.

    ``layout`` lets a serving path hand in the (possibly cached) clustered
    relation instead of re-opening the parquet layout per query — the
    cluster IN-filter then prunes cached in-memory batches the same way it
    prunes partition directories on the cold path."""
    clusters = index.nearest_clusters(query_vector, nprobe)
    if layout is None:
        layout = spark.read.parquet(index.path)
    scan = layout.where(F.col("cluster_id").isin(clusters))
    return knn(
        scan.drop("cluster_id"),
        query_vector,
        k,
        vector_col=index.vector_col,
        id_col=index.id_col,
        metric=index.metric,
        pre_filter=pre_filter,
        round_dp=round_dp,
        clamp=clamp,
    )


def ivf_search_batch(
    spark: SparkSession,
    index: IVFIndex,
    queries: list[tuple[int, list[float]]],
    k: int,
    *,
    nprobe: int = 4,
    round_dp: int | None = 6,
    layout: DataFrame | None = None,
) -> DataFrame:
    """IVF probing for a BATCH of queries as ONE plan (same serving shape as
    lsh_ann.lsh_search_batch): each query's nprobe nearest centroids are
    picked driver-side (tiny — centroids are the index), the (query_id,
    qvec, cluster_id) probe rows broadcast-join the clustered layout on
    cluster_id, scores come from the joined qvec column, and
    knn.topk_per_group takes per-query top-k without a global sort. On the
    partitioned-by-cluster layout the equi-join key is the partition key, so
    the scan stays pruned to the union of probed clusters; the whole batch
    costs one scan of that union instead of one scan per query."""
    from ..functions.vector import atlas_score
    from .knn import topk_per_group

    rows = [
        (int(qid), [float(x) for x in qv], int(c))
        for qid, qv in queries
        for c in index.nearest_clusters(qv, nprobe)
    ]
    probes = spark.createDataFrame(
        rows, "query_id bigint, __qvec array<double>, cluster_id int"
    )
    if layout is None:
        layout = spark.read.parquet(index.path)
    score = atlas_score(F.col(index.vector_col), F.col("__qvec"), index.metric)
    if round_dp is not None:
        score = F.round(score, round_dp)
    scored = (
        layout.join(F.broadcast(probes), "cluster_id")
        .withColumn("score", score)
        .select("query_id", index.id_col, "score")
    )
    return topk_per_group(
        scored, k, group_col="query_id", score_col="score", id_col=index.id_col
    )
