"""LSH ANN: bucket determinism, multi-probe recall vs exact KNN, and the
recall→1 limit when probing everything."""

from __future__ import annotations

import pytest

from hybrid_vector_search_spark.operators.knn import knn
from hybrid_vector_search_spark.operators.lsh_ann import (
    LSHIndex,
    lsh_search,
    with_buckets,
)
from hybrid_vector_search_spark.sources import load_table

SF = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    emb = load_table(spark, SF, "embeddings")
    dim = len(emb.select("embedding").head().embedding)
    index = LSHIndex(bits=8, seed=7, dim=dim, id_col="vec_id", vector_col="embedding")
    bucketed = with_buckets(emb, index).cache()
    bucketed.count()
    q = emb.where("vec_id = 0").select("embedding").head().embedding
    return bucketed, index, [float(x) for x in q]


def test_buckets_deterministic_and_bounded(spark, corpus):
    bucketed, index, _ = corpus
    a = {r.vec_id: r.lsh_bucket for r in bucketed.collect()}
    b = {r.vec_id: r.lsh_bucket for r in with_buckets(
        load_table(spark, SF, "embeddings"), index).collect()}
    assert a == b
    assert all(0 <= v < (1 << index.bits) for v in a.values())


def test_multiprobe_recall_improves(spark, corpus):
    bucketed, index, q = corpus
    exact = {r.vec_id for r in knn(bucketed, q, K, metric="cosine").collect()}
    total = bucketed.count()
    recalls, fractions = [], []
    for h in (0, 1, 2):
        buckets = index.probe_buckets(q, h)
        scanned = bucketed.where(bucketed.lsh_bucket.isin(buckets)).count()
        got = {r.vec_id for r in lsh_search(bucketed, index, q, K, probe_hamming=h).collect()}
        recalls.append(len(got & exact) / K)
        fractions.append(scanned / total)
    assert recalls == sorted(recalls), recalls  # monotone in probe radius
    # the LSH claim: recall beats the scan fraction (better than random
    # bucketing at the same scan budget) at every probe radius
    for r, f in zip(recalls[1:], fractions[1:]):
        assert r > f, (recalls, fractions)


def test_full_probe_equals_exact(spark, corpus):
    bucketed, index, q = corpus
    exact = [(r.vec_id,) for r in knn(bucketed, q, K, metric="cosine").collect()]
    got = [(r.vec_id,) for r in lsh_search(
        bucketed, index, q, K, probe_hamming=index.bits).collect()]
    assert got == exact


def test_batch_search_equals_per_query(spark, corpus):
    """lsh_search_batch (one probe-join plan for the whole query set) must
    return exactly the per-query lsh_search results — same ids, same scores,
    same (score DESC, id ASC) top-k membership."""
    from hybrid_vector_search_spark.operators.lsh_ann import lsh_search_batch

    bucketed, index, _ = corpus
    rows = bucketed.where("vec_id < 4").select("vec_id", "embedding").collect()
    queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]
    batch = {
        (r.query_id, r.vec_id, r.score)
        for r in lsh_search_batch(bucketed, index, queries, K, probe_hamming=2).collect()
    }
    single = {
        (qid, r.vec_id, r.score)
        for qid, qv in queries
        for r in lsh_search(bucketed, index, qv, K, probe_hamming=2).collect()
    }
    assert batch == single and len(batch) == len(queries) * K


def test_batch_probe_join_is_broadcast(spark, corpus):
    """The batch probe relation must broadcast into the corpus join — the
    corpus side never shuffles for the join (topk_per_group's pruned-triple
    exchange is the only one downstream)."""
    from hybrid_vector_search_spark.operators.lsh_ann import lsh_search_batch

    bucketed, index, q = corpus
    plan = (
        lsh_search_batch(bucketed, index, [(0, q)], K, probe_hamming=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
