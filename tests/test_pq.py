"""Product-quantization ANN: determinism, compression shape, and measured
recall vs exact KNN (with the standard ADC + exact-rerank recipe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    ).cache()
    emb.count()
    q = [float(x) for x in emb.where("id = 0").head().v]
    return emb.where("id <> 0"), q


@pytest.fixture(scope="module")
def pq_index(corpus):
    from hybrid_vector_search_spark.operators.pq import encode_pq, train_pq

    emb, _ = corpus
    cb = train_pq(emb, "v", n_subspaces=8, ksub=32, seed=7)
    encoded = encode_pq(emb, cb, id_col="id", vector_col="v").cache()
    encoded.count()
    return cb, encoded


def test_codes_shape_and_determinism(corpus, pq_index):
    from hybrid_vector_search_spark.operators.pq import encode_pq, train_pq

    emb, _ = corpus
    cb, encoded = pq_index
    assert cb.codebooks.shape == (8, 32, 8)  # dim 64 → 8 subspaces of 8
    rows = {r.id: list(r.codes) for r in encoded.collect()}
    assert all(len(c) == 8 for c in rows.values())
    assert all(0 <= x < 32 for c in rows.values() for x in c)
    # retrain with the same seed → identical codes (codebook is seeded)
    cb2 = train_pq(emb, "v", n_subspaces=8, ksub=32, seed=7)
    again = {r.id: list(r.codes) for r in encode_pq(emb, cb2, id_col="id", vector_col="v").collect()}
    assert rows == again


def test_adc_recall_with_rerank(corpus, pq_index):
    from hybrid_vector_search_spark.operators.knn import knn
    from hybrid_vector_search_spark.operators.pq import pq_search

    emb, q = corpus
    cb, encoded = pq_index
    exact = [r.id for r in knn(emb, q, K, vector_col="v", id_col="id", metric="dotProduct").collect()]

    got_plain = {r.id for r in pq_search(encoded, cb, q, K).collect()}
    got_rr = {
        r.id
        for r in pq_search(
            encoded, cb, q, K, rerank=emb, rerank_factor=8, id_col="id", vector_col="v"
        ).collect()
    }
    recall_plain = len(got_plain & set(exact)) / K
    recall_rr = len(got_rr & set(exact)) / K
    assert recall_rr >= recall_plain  # rerank can only help
    assert recall_rr >= 0.7, (recall_plain, recall_rr)


def test_rerank_scores_are_exact(corpus, pq_index):
    """Reranked scores must equal the exact dot-product scores for the ids
    returned (compression affects WHICH rows surface, never their scores)."""
    from hybrid_vector_search_spark.operators.pq import pq_search
    from hybrid_vector_search_spark.functions.vector import dot

    emb, q = corpus
    cb, encoded = pq_index
    got = pq_search(
        encoded, cb, q, 5, rerank=emb, rerank_factor=8, id_col="id", vector_col="v"
    ).collect()
    truth = {
        r.id: r.s
        for r in emb.select("id", F.round(dot(F.col("v"), q), 6).alias("s")).collect()
    }
    for r in got:
        assert r.score == truth[r.id]


def test_batch_search_equals_per_query(corpus, pq_index):
    """pq_search_batch (one ADC scan + one rerank join for the whole query
    set) must return exactly the per-query pq_search results."""
    from hybrid_vector_search_spark.operators.pq import pq_search, pq_search_batch

    emb, q0 = corpus
    cb, encoded = pq_index
    rows = emb.where("id < 5").select("id", "v").collect()
    queries = [(r.id, [float(x) for x in r.v]) for r in rows]
    batch = {
        (r.query_id, r.id, r.score)
        for r in pq_search_batch(
            encoded, cb, queries, K, rerank=emb, rerank_factor=4,
            id_col="id", vector_col="v",
        ).collect()
    }
    single = {
        (qid, r.id, r.score)
        for qid, qv in queries
        for r in pq_search(
            encoded, cb, qv, K, rerank=emb, rerank_factor=4,
            id_col="id", vector_col="v",
        ).collect()
    }
    assert batch == single and len(batch) == len(queries) * K
