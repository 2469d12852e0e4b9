"""IVF index properties: recall vs exact KNN, full-probe equivalence, and
partition pruning actually reaching the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_MID

N_CLUSTERS = 8


@pytest.fixture(scope="module")
def ivf(spark, tmp_path_factory):
    from hybrid_vector_search_spark.operators.ivf import build_ivf
    from hybrid_vector_search_spark.sources import load_table

    emb = load_table(spark, SF_MID, "embeddings")
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    return build_ivf(spark, emb, path, n_clusters=N_CLUSTERS)


def _query_vec(spark):
    from hybrid_vector_search_spark.sources import load_table

    row = (
        load_table(spark, SF_MID, "embeddings").where(F.col("vec_id") == 0).head()
    )
    return [float(x) for x in row.embedding]


def test_full_probe_equals_exact(spark, ivf):
    from hybrid_vector_search_spark.operators.ivf import ivf_search
    from hybrid_vector_search_spark.operators.knn import knn
    from hybrid_vector_search_spark.sources import load_table

    qv = _query_vec(spark)
    exact = knn(load_table(spark, SF_MID, "embeddings"), qv, 10).collect()
    probed = ivf_search(spark, ivf, qv, 10, nprobe=N_CLUSTERS).collect()
    assert [(r.vec_id, r.score) for r in probed] == [(r.vec_id, r.score) for r in exact]


def test_recall_improves_with_nprobe(spark, ivf):
    from hybrid_vector_search_spark.operators.ivf import ivf_search
    from hybrid_vector_search_spark.operators.knn import knn
    from hybrid_vector_search_spark.sources import load_table

    qv = _query_vec(spark)
    exact_ids = {r.vec_id for r in knn(load_table(spark, SF_MID, "embeddings"), qv, 10).collect()}
    r1 = {r.vec_id for r in ivf_search(spark, ivf, qv, 10, nprobe=1).collect()}
    r4 = {r.vec_id for r in ivf_search(spark, ivf, qv, 10, nprobe=4).collect()}
    recall1 = len(r1 & exact_ids) / len(exact_ids)
    recall4 = len(r4 & exact_ids) / len(exact_ids)
    assert recall4 >= recall1
    assert recall4 >= 0.5


def test_index_save_load_roundtrip(spark, ivf):
    import numpy as np

    from hybrid_vector_search_spark.operators.ivf import IVFIndex, ivf_search

    ivf.save()
    loaded = IVFIndex.load(ivf.path)
    assert np.array_equal(loaded.centroids, ivf.centroids)
    qv = _query_vec(spark)
    a = ivf_search(spark, ivf, qv, 5, nprobe=2).collect()
    b = ivf_search(spark, loaded, qv, 5, nprobe=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_measured_recall_reasonable(spark, ivf):
    from hybrid_vector_search_spark.operators.ivf import measure_recall
    from hybrid_vector_search_spark.sources import load_table

    emb = load_table(spark, SF_MID, "embeddings")
    qvs = [[float(x) for x in r.embedding] for r in emb.where("vec_id < 3").collect()]
    r = measure_recall(spark, ivf, emb, qvs, k=10, nprobe=4)
    assert 0.3 <= r <= 1.0


def test_partition_pruning_reaches_scan(spark, ivf):
    from hybrid_vector_search_spark.operators.ivf import ivf_search

    qv = _query_vec(spark)
    df = ivf_search(spark, ivf, qv, 5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "cluster_id" in plan and ("PartitionFilters" in plan or "partition" in plan.lower())


def test_batch_search_equals_per_query(spark, ivf):
    """ivf_search_batch (one cluster-join plan for the whole query set) must
    return exactly the per-query ivf_search results."""
    from hybrid_vector_search_spark.operators.ivf import ivf_search, ivf_search_batch
    from hybrid_vector_search_spark.sources import load_table

    emb = load_table(spark, SF_MID, "embeddings")
    rows = emb.where("vec_id < 4").select("vec_id", "embedding").collect()
    queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]
    k = 10
    batch = {
        (r.query_id, r.vec_id, r.score)
        for r in ivf_search_batch(spark, ivf, queries, k, nprobe=3).collect()
    }
    single = {
        (qid, r.vec_id, r.score)
        for qid, qv in queries
        for r in ivf_search(spark, ivf, qv, k, nprobe=3, clamp=False).collect()
    }
    assert batch == single and len(batch) == len(queries) * k


def test_ivf_add_appends_without_retrain(spark, tmp_path_factory):
    """ivf_add assigns new vectors to their nearest EXISTING centroid and
    appends them to the layout: assignments match the argmin rule, queries
    see added rows immediately, and a full-probe search still equals exact
    KNN over the grown corpus."""
    import numpy as np

    from hybrid_vector_search_spark.operators.ivf import (
        assign_clusters,
        build_ivf,
        ivf_add,
        ivf_search,
    )
    from hybrid_vector_search_spark.operators.knn import knn
    from hybrid_vector_search_spark.sources import load_table

    emb = load_table(spark, SF_MID, "embeddings")
    base = emb.where("vec_id % 2 = 0")
    new = emb.where("vec_id % 2 = 1")
    path = str(tmp_path_factory.mktemp("ivf_add") / "index")
    idx = build_ivf(spark, base, path, n_clusters=4)
    n_base = spark.read.parquet(path).count()

    # assignment follows the nearest-centroid rule exactly
    got = assign_clusters(new, idx).select("vec_id", "cluster_id").collect()
    by_id = {r.vec_id: [float(x) for x in r.embedding] for r in new.collect()}
    for r in got[:50]:
        v = np.asarray(by_id[r.vec_id])
        want = int(((idx.centroids - v) ** 2).sum(axis=1).argmin())
        assert r.cluster_id == want, (r.vec_id, r.cluster_id, want)

    ivf_add(spark, idx, new)
    layout = spark.read.parquet(path)
    assert layout.count() == n_base + new.count()

    # full probe over the grown layout equals exact KNN over the full corpus
    q = [float(x) for x in emb.where("vec_id = 1").head().embedding]
    exact = [(r.vec_id,) for r in knn(emb, q, 10, metric="cosine").collect()]
    probed = [
        (r.vec_id,)
        for r in ivf_search(spark, idx, q, 10, nprobe=4, clamp=False).collect()
    ]
    assert probed == exact
    # the added vector's own query finds it top-1 with a single probe
    top = ivf_search(spark, idx, q, 1, nprobe=1, clamp=False).head()
    assert top.vec_id == 1


def test_batch_probe_join_is_broadcast(spark, ivf):
    from hybrid_vector_search_spark.operators.ivf import ivf_search_batch
    from hybrid_vector_search_spark.sources import load_table

    emb = load_table(spark, SF_MID, "embeddings")
    q = [float(x) for x in emb.where("vec_id = 0").head().embedding]
    plan = (
        ivf_search_batch(spark, ivf, [(0, q)], 10, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_skewed_corpus_split_bounds_probe_fanout(spark, tmp_path):
    """r7 verdict stretch: a 90/10-skewed corpus (90% of vectors in one
    tight blob) makes one KMeans cluster swallow ~90% of rows — every probe
    touching it scans ~everything. With max_cluster_frac the oversized
    cluster is split at build (sub-KMeans + one re-assignment pass), so the
    largest partition is bounded and probe cost stays ~nprobe*cap. Recall
    is unaffected in kind: exact scoring still happens inside the probed
    subset."""
    import numpy as np
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators.ivf import build_ivf, ivf_search

    rng = np.random.RandomState(11)
    # dense-but-structured hot region (realistic embedding skew) vs far tail
    hot = rng.normal(loc=0.0, scale=1.0, size=(900, 8))
    spread = rng.normal(loc=0.0, scale=30.0, size=(100, 8))
    vecs = np.vstack([hot, spread])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )

    naive = build_ivf(spark, df, str(tmp_path / "naive"), n_clusters=8, seed=3)
    naive_sizes = {
        r["cluster_id"]: r["n"]
        for r in spark.read.parquet(str(tmp_path / "naive"))
        .groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    assert max(naive_sizes.values()) >= 0.8 * 1000  # the skew is real

    capped = build_ivf(
        spark, df, str(tmp_path / "capped"), n_clusters=8, seed=3,
        max_cluster_frac=0.25,
    )
    sizes = {
        r["cluster_id"]: r["n"]
        for r in spark.read.parquet(str(tmp_path / "capped"))
        .groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    # nearest-centroid re-assignment isn't an exact partitioner, so allow
    # slack over the 250-row cap — but the hot blob must be genuinely split
    assert max(sizes.values()) <= 0.45 * 1000
    assert len(capped.centroids) > 8  # split added sub-centroids
    # the layout still serves queries (exact rerank inside probed subset)
    q = [float(x) for x in vecs[0]]
    hits = ivf_search(spark, capped, q, k=5, nprobe=3).collect()
    assert len(hits) == 5
