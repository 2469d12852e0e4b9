"""Embedding pipeline: determinism, skip-existing incrementality, and the
driver-side/cluster-side consistency the query path depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def test_embedder_deterministic_and_normalized():
    import numpy as np

    from hybrid_vector_search_spark.operators.embed import HashingEmbedder

    e = HashingEmbedder(dim=64)
    a, b = e.embed_one("spark fast table"), e.embed_one("spark fast table")
    assert np.array_equal(a, b)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-6
    assert not np.array_equal(a, e.embed_one("different text"))


def test_cluster_and_driver_embeddings_agree(spark):
    """The pandas-UDF (cluster) path and query_vector (driver) path must
    produce identical vectors — queries are compared against stored
    embeddings (reference embed.py vs backend/api.py:158-160)."""
    import numpy as np

    from hybrid_vector_search_spark.operators.embed import embed_documents, query_vector
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    rows = embed_documents(docs, "text", "emb").select("text", "emb").collect()
    for r in rows:
        assert np.allclose(r.emb, query_vector(r.text), atol=0)


def test_embed_missing_only_fills_nulls(spark):
    from hybrid_vector_search_spark.operators.embed import embed_missing

    df = spark.createDataFrame(
        [(1, "some text", None), (2, "other text", [0.5] * 4)],
        "id long, text string, emb array<float>",
    )
    out = {r.id: r.emb for r in embed_missing(df, "text", "emb").collect()}
    assert out[1] is not None and len(out[1]) == 64
    assert out[2] == [0.5] * 4  # untouched (skip-existing, embed.py:95-96)
