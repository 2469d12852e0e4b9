"""operators.pca + graph.harmonic/seed-hop — hand-checkable values."""

from __future__ import annotations

import pytest


def test_pc1_line_data_explains_everything(spark):
    """Points on the line (t, 2t): covariance is rank-1, so PC1 explains
    ~100% of the variance and lambda1 ~= trace."""
    from hybrid_vector_search_spark.operators.pca import pc1_power_iteration

    rows = [(i, [float(t), 2.0 * t]) for i, t in enumerate([-2.0, -1.0, 0.0, 1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    row = pc1_power_iteration(df, "vec_id", "embedding", iterations=8).head()
    assert row["dim"] == 2 and row["n_vectors"] == 5
    assert row["explained_frac"] == pytest.approx(1.0, abs=1e-6)
    assert row["lambda1"] == pytest.approx(row["trace"], abs=1e-4)


def test_pc1_isotropic_splits_variance(spark):
    """Axis-aligned symmetric data: both eigenvalues equal, explained ~0.5."""
    from hybrid_vector_search_spark.operators.pca import pc1_power_iteration

    rows = [
        (0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    row = pc1_power_iteration(df, "vec_id", "embedding", iterations=8).head()
    assert row["explained_frac"] == pytest.approx(0.5, abs=1e-6)


def test_seed_hop_distances_per_seed_fields(spark):
    """Path 0->1->2 with seeds {0, 1}: each seed keeps its own field
    (hop_distances would collapse both into one frontier)."""
    from hybrid_vector_search_spark.operators.graph import seed_hop_distances

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    got = {
        (r["seed"], r["node"]): r["hops"]
        for r in seed_hop_distances(edges, seeds, max_hops=4).collect()
    }
    assert got == {
        (0, 0): 0, (0, 1): 1, (0, 2): 2,
        (1, 1): 0, (1, 2): 1,
    }


def test_harmonic_centrality_sums_reciprocal_hops(spark):
    """Same path graph: H(2) = 1/2 (from 0) + 1/1 (from 1) = 1.5;
    H(1) = 1 (from 0); seeds' own zero-distance terms excluded."""
    from hybrid_vector_search_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    got = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality(edges, seeds, max_hops=4).collect()
    }
    assert got == {1: 1.0, 2: 1.5}
