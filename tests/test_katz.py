"""operators.graph.katz_centrality — hand-checkable fixpoint values."""

from __future__ import annotations


def test_katz_path_graph_values(spark):
    """Path a->b->c, alpha=0.5, 2 iterations:
    x0 = 1 everywhere
    x1: a=1, b=1+.5, c=1+.5
    x2: a=1, b=1+.5*1, c=1+.5*1.5 = 1.75
    """
    from hybrid_vector_search_spark.operators.graph import katz_centrality

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {
        r["node"]: r["katz"]
        for r in katz_centrality(edges, alpha=0.5, iterations=2).collect()
    }
    assert got == {0: 1.0, 1: 1.5, 2: 1.75}


def test_katz_rewards_all_walks_not_degree_normalized(spark):
    """Two parents pointing at the same child: child accumulates BOTH
    contributions undivided (PageRank would split each parent's mass by
    outdegree; Katz does not normalize)."""
    from hybrid_vector_search_spark.operators.graph import katz_centrality

    edges = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
    got = {
        r["node"]: r["katz"]
        for r in katz_centrality(edges, alpha=0.1, iterations=1).collect()
    }
    assert got == {0: 1.0, 1: 1.0, 2: 1.2}
