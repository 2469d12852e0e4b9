"""Connected components: fixpoint correctness on crafted graphs."""

from __future__ import annotations

from hybrid_vector_search_spark.operators.graph import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, "src", "dst")
    return {r.node: r.component for r in out.collect()}


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5 (needs multiple propagation rounds), triangle 10-11-12,
    # isolated pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _components(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_direction_irrelevant(spark):
    # edges listed high->low must yield the same labels (symmetrized)
    got = _components(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_long_chain_converges(spark):
    n = 40  # diameter >> 1: exercises the iteration cap logic
    got = _components(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1
