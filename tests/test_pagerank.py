"""operators.pagerank: known-graph values, partition invariance, mass."""

from __future__ import annotations

from hybrid_vector_search_spark.operators.pagerank import pagerank


def _ranks(edges_df, **kw):
    return {
        r["node"]: r["rank"] for r in pagerank(edges_df, **kw).collect()
    }


def test_star_graph_center_dominates(spark):
    """All leaves link to the center: the center's rank must exceed every
    leaf's, and leaves (in-degree 0 beyond teleport) tie exactly — the
    decimal accumulation makes 'exactly' literal."""
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], "src long, dst long"
    )
    got = _ranks(edges)
    # the hub pair (0 collects all leaves; 1 collects 0's whole mass) must
    # dominate the teleport-only leaves
    assert min(got[0], got[1]) > 4 * got[2]
    leaf_ranks = {got[i] for i in range(2, 6)}
    assert len(leaf_ranks) == 1  # exact tie, not approximate


def test_partitioning_invariance(spark):
    """Repartitioning the edge list must not change ANY rank bit — the
    property the DECIMAL(38,12) contribution sum buys."""
    edges = spark.createDataFrame(
        [(i, (i * 31 + 7) % 50) for i in range(50)]
        + [(i, (i * 17 + 3) % 50) for i in range(50)],
        "src long, dst long",
    )
    a = _ranks(edges)
    b = _ranks(edges.repartition(13))
    assert a == b


def test_total_mass_conserved(spark):
    """With no dangling nodes, total rank stays ~1 (up to the 12dp rounding
    of each contribution)."""
    edges = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    got = _ranks(edges)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # a pure cycle is perfectly symmetric: every node has the same rank
    assert len(set(got.values())) == 1


def test_personalized_teleports_only_to_seeds(spark):
    """Seeded PPR: unreachable nodes rank exactly 0; seeds carry the
    teleport mass; uniform and personalized agree when seeds = all nodes."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators.pagerank import pagerank

    # two components: a 3-cycle {0,1,2} and an isolated pair {10 -> 11}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    pr = {r.node: r.rank for r in pagerank(edges, iterations=8, seeds=seeds).collect()}
    assert pr[10] == 0.0 and pr[11] == 0.0
    assert pr[0] > pr[1] > 0 and pr[2] > 0
    assert abs(sum(pr.values()) - 1.0) < 1e-6

    all_nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 10, 11)], "node long")
    uni = {r.node: r.rank for r in pagerank(edges, iterations=8).collect()}
    per = {
        r.node: r.rank
        for r in pagerank(edges, iterations=8, seeds=all_nodes).collect()
    }
    assert uni == per


def test_personalized_foreign_seeds_dropped_before_counting(spark):
    """Seed ids absent from the graph must not inflate the teleport
    denominator (mass would leak); an all-foreign seed set raises."""
    import pytest
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    seeds_mixed = spark.createDataFrame([(1,), (99,)], "node long")
    ranks = pagerank(edges, src="src", dst="dst", iterations=5, seeds=seeds_mixed)
    total = ranks.agg(F.sum("rank").alias("s")).collect()[0]["s"]
    assert abs(float(total) - 1.0) < 1e-6  # no leaked teleport mass
    seeds_foreign = spark.createDataFrame([(98,), (99,)], "node long")
    with pytest.raises(ValueError, match="seed"):
        pagerank(edges, src="src", dst="dst", iterations=2, seeds=seeds_foreign)
