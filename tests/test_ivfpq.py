"""IVF-PQ (coarse pruning × residual PQ): kernel cross-check vs NumPy,
batch ≡ single-query serving, exact-rerank bit-equality, the residual-vs-raw
quantization-error advantage, measured recall, and index persistence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    emb = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select(F.col("vec_id"), F.col("embedding"))
        .cache()
    )
    emb.count()
    qrows = emb.where("vec_id < 3").orderBy("vec_id").collect()
    queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in qrows]
    return emb, queries


@pytest.fixture(scope="module")
def ivfpq_index(spark, corpus, tmp_path_factory):
    from hybrid_vector_search_spark.operators.ivfpq import build_ivfpq

    emb, _ = corpus
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    index = build_ivfpq(
        spark, emb, path, n_clusters=4, n_subspaces=8, ksub=16, seed=7
    )
    layout = spark.read.parquet(path).cache()
    layout.count()
    return index, layout


def test_layout_is_codes_only_partitioned_by_cluster(ivfpq_index):
    index, layout = ivfpq_index
    assert set(layout.columns) == {"id", "codes", "cluster_id"}
    rows = layout.collect()
    M, ksub, _ = index.codebooks.shape
    assert all(len(r.codes) == M for r in rows)
    assert all(0 <= c < ksub for r in rows for c in r.codes)
    n_clusters = layout.select("cluster_id").distinct().count()
    assert n_clusters == index.centroids.shape[0]


def test_adc_scores_match_numpy_reference(spark, corpus, ivfpq_index):
    """The distributed ADC (residual tables + coarse offset) equals a plain
    NumPy reconstruction: score = dot(centroid, q) + dot(decoded_residual, q)
    for every probed row — the kernel is a lookup-table evaluation of exactly
    that quantity."""
    from hybrid_vector_search_spark.operators.ivfpq import ivfpq_search_batch

    emb, queries = corpus
    index, layout = ivfpq_index
    nprobe = index.centroids.shape[0]  # probe ALL clusters: no pruning loss
    got = ivfpq_search_batch(
        spark, index, queries, 10_000, nprobe=nprobe, layout=layout
    ).collect()

    codes = {r.id: (np.asarray(r.codes), r.cluster_id) for r in layout.collect()}
    M, ksub, dsub = index.codebooks.shape
    for qid, qv in queries:
        q = np.asarray(qv)
        mine = {r.id: r.score for r in got if r.query_id == qid}
        assert len(mine) == len(codes)
        for vid, (cd, cl) in codes.items():
            dec = np.concatenate(
                [index.codebooks[m][cd[m]] for m in range(M)]
            )
            want = round(float(index.centroids[cl] @ q + dec @ q), 6)
            assert abs(mine[vid] - want) < 1e-9, (qid, vid)


def test_batch_equals_single_query(spark, corpus, ivfpq_index):
    from hybrid_vector_search_spark.operators.ivfpq import (
        ivfpq_search,
        ivfpq_search_batch,
    )

    emb, queries = corpus
    index, layout = ivfpq_index
    batch = ivfpq_search_batch(
        spark, index, queries, K, nprobe=2, rerank=emb, layout=layout
    ).collect()
    for qid, qv in queries:
        single = ivfpq_search(
            spark, index, qv, K, nprobe=2, rerank=emb, layout=layout
        ).collect()
        got = sorted(
            [(r.id, r.score) for r in batch if r.query_id == qid],
            key=lambda t: (-t[1], t[0]),
        )
        want = sorted(
            [(r.id, r.score) for r in single], key=lambda t: (-t[1], t[0])
        )
        assert got == want


def test_rerank_scores_equal_float_path(spark, corpus, ivfpq_index):
    """Reranked scores are the exact rounded dot products — identical to
    what the float scoring path computes for those ids."""
    from hybrid_vector_search_spark.functions.vector import dot
    from hybrid_vector_search_spark.operators.ivfpq import ivfpq_search_batch

    emb, queries = corpus
    index, layout = ivfpq_index
    qid, qv = queries[0]
    got = {
        r.id: r.score
        for r in ivfpq_search_batch(
            spark, index, [(qid, qv)], K, nprobe=2, rerank=emb, layout=layout
        ).collect()
    }
    exact = {
        r.vec_id: r.s
        for r in emb.select(
            "vec_id", F.round(dot(F.col("embedding"), qv), 6).alias("s")
        ).collect()
    }
    for vid, s in got.items():
        assert s == exact[vid]


def test_residual_beats_raw_pq_quantization_error(spark, corpus, ivfpq_index):
    """The reason IVFPQ encodes residuals: on a clustered corpus the
    residual distribution is tighter than the raw one, so the SAME code
    budget (M, ksub) reconstructs with lower mean squared error than raw
    PQ. Fully seeded — deterministic, not a flake."""
    from hybrid_vector_search_spark.operators.pq import encode_pq, train_pq

    emb, _ = corpus
    index, layout = ivfpq_index
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    M, ksub, dsub = index.codebooks.shape

    resid_se = 0.0
    for r in layout.collect():
        dec = np.concatenate([index.codebooks[m][r.codes[m]] for m in range(M)])
        recon = index.centroids[r.cluster_id] + dec
        resid_se += float(((vecs[r.id] - recon) ** 2).sum())

    cb = train_pq(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
        "v",
        n_subspaces=M,
        ksub=ksub,
        seed=7,
    )
    raw_se = 0.0
    for r in encode_pq(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
        cb,
        id_col="id",
        vector_col="v",
    ).collect():
        dec = np.concatenate([cb.codebooks[m][r.codes[m]] for m in range(M)])
        raw_se += float(((vecs[r.id] - dec) ** 2).sum())

    assert resid_se < raw_se


def test_measured_recall_with_rerank(spark, corpus, ivfpq_index):
    from hybrid_vector_search_spark.operators.knn import knn
    from hybrid_vector_search_spark.operators.ivfpq import ivfpq_search_batch

    emb, queries = corpus
    index, layout = ivfpq_index
    got = ivfpq_search_batch(
        spark, index, queries, K, nprobe=2, rerank=emb, rerank_factor=4,
        layout=layout,
    ).collect()
    total = 0.0
    for qid, qv in queries:
        exact = {
            r.vec_id
            for r in knn(
                emb, qv, K, vector_col="embedding", id_col="vec_id",
                metric="dotProduct", clamp=False,
            ).collect()
        }
        mine = {r.id for r in got if r.query_id == qid}
        total += len(exact & mine) / len(exact)
    assert total / len(queries) >= 0.5


def test_ivfpq_add_appends_without_retrain(spark, corpus, tmp_path):
    """ivfpq_add: new rows land in their nearest existing cluster with
    residual codes from the FROZEN codebooks (identical to what a rebuild
    over the same assignment would produce), and full-probe search sees
    them immediately."""
    from hybrid_vector_search_spark.operators.ivfpq import (
        build_ivfpq,
        ivfpq_add,
        ivfpq_search_batch,
    )

    emb, queries = corpus
    base = emb.where("vec_id >= 100")
    extra = emb.where("vec_id < 100")
    path = str(tmp_path / "grow")
    index = build_ivfpq(
        spark, base, path, n_clusters=4, n_subspaces=8, ksub=16, seed=7
    )
    n_base = spark.read.parquet(path).count()
    ivfpq_add(spark, index, extra)
    layout = spark.read.parquet(path)
    assert layout.count() == n_base + extra.count()
    # frozen-quantizer contract: added rows' codes match an encode of the
    # same rows against the same index
    added = {r.id: (list(r.codes), r.cluster_id) for r in layout.collect()
             if r.id < 100}
    cents = index.centroids
    for r in extra.collect():
        v = np.asarray(r.embedding, dtype=np.float64)
        want_cluster = int(((cents - v) ** 2).sum(axis=1).argmin())
        assert added[r.vec_id][1] == want_cluster, r.vec_id
    # and the grown corpus is immediately searchable
    qid, qv = queries[0]
    got = ivfpq_search_batch(
        spark, index, [(qid, qv)], K, nprobe=4, rerank=emb,
    ).collect()
    assert len(got) == K


def test_save_load_roundtrip(spark, corpus, ivfpq_index):
    from hybrid_vector_search_spark.operators.ivfpq import (
        IVFPQIndex,
        ivfpq_search_batch,
    )

    emb, queries = corpus
    index, layout = ivfpq_index
    loaded = IVFPQIndex.load(index.path)
    assert np.array_equal(loaded.centroids, index.centroids)
    assert np.array_equal(loaded.codebooks, index.codebooks)
    qid, qv = queries[0]
    a = ivfpq_search_batch(spark, index, [(qid, qv)], K, nprobe=2, layout=layout)
    b = ivfpq_search_batch(spark, loaded, [(qid, qv)], K, nprobe=2, layout=layout)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_unknown_metric_refused_at_search(spark, tmp_path):
    import numpy as np
    import pytest

    from hybrid_vector_search_spark.operators.ivfpq import (
        IVFPQIndex,
        ivfpq_search,
    )

    idx = IVFPQIndex(
        path=str(tmp_path / "pq"),
        centroids=np.eye(4),
        codebooks=np.zeros((2, 4, 2)),
        id_col="vec_id",
        vector_col="embedding",
        metric="manhattan",
    )
    with pytest.raises(ValueError, match="manhattan"):
        ivfpq_search(spark, idx, [1.0, 0.0, 0.0, 0.0], 3)


def _euclid_corpus(spark, n=400, dim=8, seed=5):
    """Clustered corpus so euclidean probing is meaningful."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 10.0, size=(8, dim))
    vecs = centers[rng.randint(0, 8, n)] + rng.normal(0, 0.5, size=(n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    return df, vecs


def test_euclidean_adc_search_end_to_end(spark, tmp_path):
    """r8: euclidean ADC (per-(query, cluster) squared-distance tables).
    With exact rerank the returned top-k must equal the brute-force
    euclidean top-k on a clustered corpus (the probed neighborhood
    contains the true neighbors), and the scores must be the exact Atlas
    euclidean rescale of the true distances."""
    import numpy as np

    from hybrid_vector_search_spark.operators.ivfpq import (
        build_ivfpq,
        ivfpq_search,
    )

    df, vecs = _euclid_corpus(spark)
    idx = build_ivfpq(
        spark, df, str(tmp_path / "idx"),
        n_clusters=8, n_subspaces=4, ksub=32, metric="euclidean", seed=3,
    )
    q = [float(x) for x in vecs[7]]
    got = ivfpq_search(
        spark, idx, q, 5, nprobe=3, rerank=df, rerank_factor=6
    ).collect()
    d = np.linalg.norm(vecs - np.asarray(q), axis=1)
    want_ids = list(np.argsort(d)[:5])
    assert [r["id"] for r in got] == [int(i) for i in want_ids]
    for r in got:
        assert r["score"] == round(1.0 / (1.0 + float(d[r["id"]])), 6)


def test_euclidean_adc_approximates_distance(spark, tmp_path):
    """Without rerank the ADC score 1/(1+sqrt(d2_quantized)) must correlate
    with the true distances: recall@10 of the pure-ADC ranking >= 0.6 on
    the clustered corpus (residual codebooks are tight within clusters)."""
    import numpy as np

    from hybrid_vector_search_spark.operators.ivfpq import (
        build_ivfpq,
        ivfpq_search,
    )

    df, vecs = _euclid_corpus(spark, seed=11)
    idx = build_ivfpq(
        spark, df, str(tmp_path / "idx"),
        n_clusters=8, n_subspaces=4, ksub=32, metric="euclidean", seed=3,
    )
    q = [float(x) for x in vecs[42]]
    got = {r["id"] for r in ivfpq_search(spark, idx, q, 10, nprobe=3).collect()}
    d = np.linalg.norm(vecs - np.asarray(q), axis=1)
    true = {int(i) for i in np.argsort(d)[:10]}
    assert len(got & true) >= 6
