"""operators.mmr: greedy maximal-marginal-relevance diversity rerank."""

from __future__ import annotations

import pytest


def _cands(spark):
    # two tight near-duplicate pairs + two singletons, relevance descending
    rows = [
        (1, 0.99, [1.0, 0.0, 0.0]),
        (2, 0.98, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, 0.90, [0.0, 1.0, 0.0]),
        (4, 0.89, [0.0, 0.999, 0.01]),   # near-dup of 3
        (5, 0.50, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "id long, score double, embedding array<double>")


def test_rank1_is_top_relevance_and_diversity_wins(spark):
    from hybrid_vector_search_spark.operators.mmr import mmr_rerank

    out = {r["rank"]: r["id"] for r in mmr_rerank(_cands(spark), k=4).collect()}
    assert out[1] == 1  # pure relevance on the first pick
    # the near-dup of 1 (id 2, sim≈1) drops below the orthogonal id 3:
    # 0.7·0.98 − 0.3·1.0 = 0.386 < 0.7·0.90 = 0.63
    assert out[2] == 3
    # then 2 re-enters at 0.386 ahead of 5 (0.7·0.5 = 0.35), and 5 beats
    # the doubly-penalized 4 (0.323) — diversity reorders the tail
    assert out[3] == 2 and out[4] == 5


def test_lambda_one_is_pure_relevance(spark):
    from hybrid_vector_search_spark.operators.mmr import mmr_rerank

    out = [r["id"] for r in mmr_rerank(_cands(spark), k=4, lam=1.0)
           .orderBy("rank").collect()]
    assert out == [1, 2, 3, 4]


def test_k_clamps_to_candidate_count(spark):
    from hybrid_vector_search_spark.operators.mmr import mmr_rerank

    out = mmr_rerank(_cands(spark), k=50).collect()
    assert len(out) == 5
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5]


def test_unbounded_candidates_raise(spark):
    """The driver fold enforces its documented bound instead of trusting the
    caller (the dedup.embedding_near_dups guarded-kernel contract)."""
    from hybrid_vector_search_spark.operators.mmr import mmr_rerank

    big = spark.range(0, 300).selectExpr(
        "id", "1.0 - id / 1000.0 AS score",
        "array(cast(id AS double), 1.0, 0.0) AS embedding"
    )
    with pytest.raises(ValueError, match="max_candidates"):
        mmr_rerank(big, k=5)
    # raising the bound re-admits the same relation
    out = mmr_rerank(big, k=3, max_candidates=300).collect()
    assert len(out) == 3
