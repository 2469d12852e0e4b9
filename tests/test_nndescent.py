"""NN-Descent approximate k-NN graph (operators/nndescent.py) — the batch
analog of the reference's HNSW index (reference indexes.py:55-71): shape
invariants, determinism, recall against exact brute-force ground truth,
convergence over iterations, and the scale-shape plan pins."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.nndescent import knn_graph_nndescent
from hybrid_vector_search_spark.sources import load_table

from .conftest import SF_SMALL

K = 10


def _exact_topk(emb_rows, k):
    """Ground truth: per-id exact cosine top-k via numpy (500x500 at test
    scale — fine driver-side for a TEST oracle, never for the operator)."""
    ids = np.array([r[0] for r in emb_rows])
    vecs = np.array([r[1] for r in emb_rows], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    out = {}
    for i, vid in enumerate(ids):
        top = np.argsort(-sims[i], kind="stable")[:k]
        out[int(vid)] = {int(ids[j]) for j in top}
    return out


def _recall(graph_rows, truth, k):
    got: dict[int, set[int]] = {}
    for r in graph_rows:
        got.setdefault(int(r.src), set()).add(int(r.dst))
    hits = total = 0
    for vid, t in truth.items():
        hits += len(got.get(vid, set()) & t)
        total += len(t)
    return hits / total


def test_graph_shape_and_determinism(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    g1 = knn_graph_nndescent(emb, k=K, iterations=2).collect()
    g2 = knn_graph_nndescent(emb, k=K, iterations=2).collect()
    assert [tuple(r) for r in g1] == [tuple(r) for r in g2]
    per_src: dict[int, list[int]] = {}
    for r in g1:
        assert r.src != r.dst
        per_src.setdefault(r.src, []).append(r.dst)
    n = emb.count()
    assert len(per_src) == n  # every node got neighbors
    for src, dsts in per_src.items():
        assert len(dsts) <= K
        assert len(set(dsts)) == len(dsts), f"duplicate edge at {src}"


def test_recall_converges_to_exact(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    truth = _exact_topk(
        [(r.vec_id, list(r.embedding)) for r in emb.collect()], K
    )
    r0 = _recall(
        knn_graph_nndescent(emb, k=K, iterations=0).collect(), truth, K
    )
    r5 = _recall(
        knn_graph_nndescent(emb, k=K, iterations=5).collect(), truth, K
    )
    # random-bucket init alone is weak (~0.08 on this corpus); five
    # neighbor-of-neighbor rounds measured 0.875 recall@10 — the corpus
    # is near-isotropic 64-dim (the hard case for graph ANN). The
    # operator is deterministic, so the floor is stable, not flaky.
    assert r5 > r0, (r0, r5)
    assert r5 >= 0.86, (r0, r5)


def test_euclidean_metric_ranks_nearest(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    g = knn_graph_nndescent(emb, k=3, iterations=2, metric="euclidean")
    rows = g.where(F.col("src") == 0).collect()
    assert 1 <= len(rows) <= 3
    # euclidean similarity is the negated distance: scores must be <= 0
    assert all(r.score <= 0 for r in rows)


def test_graph_search_recall(spark):
    """Batch beam search over the built graph (the HNSW-query analog):
    recall@10 against exact brute force for 20 corpus queries. Beam
    search re-scores real neighborhoods with the true query vector, so
    its recall sits ABOVE the graph's own edge recall (measured 0.965
    at beam=20/hops=3 on a 0.875-recall graph; deterministic)."""
    from hybrid_vector_search_spark.operators.nndescent import knn_graph_search

    emb = load_table(spark, SF_SMALL, "embeddings")
    emb_rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    truth = _exact_topk(emb_rows, K)
    graph = knn_graph_nndescent(emb, k=K, iterations=5).localCheckpoint(
        eager=True
    )
    qids = [r[0] for r in emb_rows[:20]]
    queries = emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # k+1 then drop self: corpus members find themselves at score 1.0
    res = knn_graph_search(graph, emb, queries, k=K + 1, beam=20, hops=3)
    got: dict[int, list[int]] = {}
    for r in res.collect():
        if r.vec_id != r.query_id:
            got.setdefault(int(r.query_id), []).append(int(r.vec_id))
    hits = total = 0
    for qid in qids:
        hits += len(set(got[qid][:K]) & truth[qid])
        total += K
    assert hits / total >= 0.94, hits / total


def test_plan_stays_join_shaped(spark):
    """The 100 TB contract: no cartesian product, no row-at-a-time Python
    in the scored-graph plan (init + 1 round)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    g = knn_graph_nndescent(emb, k=5, iterations=1)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_edge_cases_small_and_oversized_k(spark):
    """k >= n-1 degenerates to the exact graph (every other node is a
    candidate via buckets+rounds); n<=1 returns an empty graph."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    tiny = emb.limit(5)
    g = knn_graph_nndescent(tiny, k=10, iterations=2).collect()
    per_src = {}
    for r in g:
        per_src.setdefault(r.src, set()).add(r.dst)
    assert len(per_src) == 5
    # with k=10 > n-1=4 every node must hold ALL other nodes
    assert all(len(d) == 4 for d in per_src.values()), per_src
    one = knn_graph_nndescent(emb.limit(1), k=3, iterations=1)
    assert one.count() == 0


def test_build_k_widens_then_truncates_to_k(spark):
    """build_k=2k iterates with a degree-20 working graph and truncates to
    k at the end: still ≤ k edges per node, and on the near-isotropic
    corpus the wider candidate pool lifts recall@10 from the 0.875
    plateau to ≥0.99 (deterministic, so the bound is stable)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    truth = _exact_topk(
        [(r.vec_id, list(r.embedding)) for r in emb.collect()], K
    )
    g = knn_graph_nndescent(emb, k=K, iterations=4, build_k=2 * K).collect()
    per_src: dict[int, list[int]] = {}
    for r in g:
        per_src.setdefault(r.src, []).append(r.dst)
    assert all(len(d) <= K for d in per_src.values())
    assert _recall(g, truth, K) >= 0.99


def test_build_k_below_k_rejected(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    try:
        knn_graph_nndescent(emb, k=10, build_k=5)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_empty_graph_inherits_id_type(spark):
    """n<=1 degenerate case: src/dst take the INPUT id column's type, so
    the empty graph unions/joins cleanly with a populated one built from
    the same (e.g. string-keyed) corpus."""
    rows = [("doc-a", [1.0, 0.0]), ("doc-b", [0.9, 0.1]), ("doc-c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    empty = knn_graph_nndescent(df.limit(1), k=3, iterations=1)
    full = knn_graph_nndescent(df, k=2, iterations=1)
    assert empty.count() == 0
    assert [f.dataType for f in empty.schema.fields] == [
        f.dataType for f in full.schema.fields
    ]
    assert empty.unionAll(full).count() == full.count()
