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


def _components_star(spark, edges):
    from hybrid_vector_search_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components_star(df, "src", "dst")
    return {r.node: r.component for r in out.collect()}


def test_star_matches_minlabel_on_crafted_graphs(spark):
    cases = [
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        [(5, 4), (4, 3), (3, 2), (2, 1)],
        [(i, i + 1) for i in range(40)],  # the long-chain adversarial case
        [(7, 7), (1, 2), (2, 1)],  # self-loop + duplicate both-direction edge
    ]
    for edges in cases:
        assert _components_star(spark, edges) == _components(spark, edges)


def test_star_matches_minlabel_on_random_graphs(spark):
    import random

    rng = random.Random(1234)
    for _ in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        edges = [(a, b) for a, b in edges if a != b]
        assert _components_star(spark, edges) == _components(spark, edges)


def test_star_log_rounds_on_long_chain(spark):
    """The point of large-star/small-star: a diameter-300 chain must converge
    in O(log n) alternation rounds, far under a round-per-link budget."""
    from hybrid_vector_search_spark.operators.graph import connected_components_star

    n = 300
    df = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    out = connected_components_star(df, "src", "dst", max_iter=14)
    got = {r.node: r.component for r in out.collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_shared_closure_variants_equal_self_contained(spark):
    """The materialize-once components table must yield byte-identical
    canonicalization and cluster-size rollups to the self-contained queries
    that recompute the closure inline (r6 verdict ask: the 100 TB shape is
    write components once, read everywhere)."""
    from hybrid_vector_search_spark.plans import pipeline

    sf = "/root/testdata/sf0.001"
    a = pipeline.dedup_canonical(spark, sf).collect()
    b = pipeline.dedup_canonical_shared(spark, sf).collect()
    assert a == b and len(a) > 0
    a = pipeline.dedup_cluster_sizes(spark, sf).collect()
    b = pipeline.dedup_cluster_sizes_shared(spark, sf).collect()
    assert a == b and len(a) > 0


def test_label_propagation_triangles_and_invariance(spark):
    """Two disjoint triangles converge to their min labels within 5
    synchronous rounds, and the assignment is partition-invariant (the
    determinism the chained-CTE oracle relies on)."""
    from hybrid_vector_search_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)],
        "src long, dst long",
    )
    got = {
        r.node: r.community
        for r in label_propagation(edges, iterations=5).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}
    got13 = {
        r.node: r.community
        for r in label_propagation(edges.repartition(13), iterations=5).collect()
    }
    assert got13 == got
    # self-loops are ignored; a graph of only self-loops has no nodes
    loops = spark.createDataFrame([(5, 5)], "src long, dst long")
    assert label_propagation(loops, iterations=2).count() == 0


def test_triangle_count_known_graph(spark):
    """K4 plus a pendant: every K4 vertex sits in C(3,2)=3 triangles, the
    pendant in none."""
    from hybrid_vector_search_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src int, dst int",
    )
    got = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_count_brute_force_parity(spark):
    """Degree-ordered counting equals the O(n^3) reference on a seeded
    random graph, per node."""
    import itertools
    import random

    from hybrid_vector_search_spark.operators.graph import triangle_count

    rnd = random.Random(7)
    nodes = list(range(24))
    edges = sorted(
        {(a, b) for a, b in itertools.combinations(nodes, 2) if rnd.random() < 0.25}
    )
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = {}
    for n in nodes:
        cnt = sum(
            1
            for v, w in itertools.combinations(sorted(adj[n]), 2)
            if w in adj[v]
        )
        if adj[n]:
            expect[n] = cnt
    got = {
        r.node: r.n_triangles
        for r in triangle_count(
            spark.createDataFrame(edges, "src int, dst int")
        ).collect()
    }
    assert got == expect


def test_triangle_count_multi_edge_and_self_loop_safe(spark):
    from hybrid_vector_search_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (3, 1)],
        "src int, dst int",
    )
    got = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_kcore_peels_chain_keeps_clique(spark):
    """A 5-chain has an empty 2-core (endpoints peel, then the chain
    unravels); a triangle+pendant keeps exactly the triangle with all
    degrees 2. The separation components cannot make."""
    from hybrid_vector_search_spark.operators.graph import kcore

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    assert kcore(chain, 2).count() == 0

    tri = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12), (12, 13)], "src long, dst long"
    )
    got = {r["node"]: r["degree"] for r in kcore(tri, 2).collect()}
    assert got == {10: 2, 11: 2, 12: 2}


def test_kcore_cascading_peel(spark):
    """Peeling must CASCADE: removing a low-degree node can drop a
    neighbor below k in a later round (two triangles joined by a bridge
    node of degree 2 survive; a 'lollipop' tail unravels node by node)."""
    from hybrid_vector_search_spark.operators.graph import kcore

    # triangle with a 3-node tail: tail needs 3 peel rounds to unravel
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = {r["node"] for r in kcore(edges, 2).collect()}
    assert got == {1, 2, 3}


def test_kcore_k3_inside_k2(spark):
    """k=3 core of a 4-clique plus a triangle keeps only the 4-clique."""
    from hybrid_vector_search_spark.operators.graph import kcore

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tri = [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(k4 + tri, "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore(edges, 3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
