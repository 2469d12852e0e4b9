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


def test_hits_star_graph_values(spark):
    """operators.graph.hits_scores on the classic star: pages 0 and 1 both
    link to 2 (and 0 also links to 3). After any number of iterations with
    max-normalization: 2 is the top authority (norm 1.0), 0 the top hub
    (it cites both authorities), and pure-hub nodes have authority 0."""
    from hybrid_vector_search_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([(0, 2), (1, 2), (0, 3)], "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_scores(edges, iterations=3).collect()
    }
    # authorities: 2 gets two hub-votes -> max, 3 gets one, sources none
    assert got[2][1] == 1.0
    assert 0 < got[3][1] < 1.0
    assert got[0][1] == 0.0 and got[1][1] == 0.0
    # hubs: 0 cites {2,3}, 1 cites {2} only, sinks are not hubs
    assert got[0][0] == 1.0
    assert 0 < got[1][0] < 1.0
    assert got[2][0] == 0.0 and got[3][0] == 0.0


def test_hits_mutual_reinforcement_vs_indegree(spark):
    """HITS ranks an authority cited by a GOOD hub above one with equal
    in-degree cited by a weak (single-link) hub — the mutual-reinforcement
    property raw in-degree (and Katz at small alpha) cannot express.
    Node 10 is cited by hub 0 (which also cites the consensus authority 99,
    making 0 a strong hub); node 20 is cited only by the isolated hub 5."""
    from hybrid_vector_search_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [(0, 99), (1, 99), (2, 99), (0, 10), (5, 20)],
        "src long, dst long",
    )
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits_scores(edges, iterations=4).collect()
    }
    assert got[10][1] > got[20][1]
    assert got[99][1] == 1.0
