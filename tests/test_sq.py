"""Scalar-quantization (SQ8) ANN: bounded reconstruction error, compression
shape, determinism (no seed, no sample), and measured recall vs exact KNN."""

from __future__ import annotations

import numpy as np
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
    return emb


@pytest.fixture(scope="module")
def sq_index(corpus):
    from hybrid_vector_search_spark.operators.sq import encode_sq, train_sq

    params = train_sq(corpus, "v")
    encoded = encode_sq(corpus, params, id_col="id", vector_col="v").cache()
    encoded.count()
    return params, encoded


def test_codes_shape_and_determinism(corpus, sq_index):
    from hybrid_vector_search_spark.operators.sq import encode_sq, train_sq

    params, encoded = sq_index
    assert params.dim == 64
    rows = {r.id: bytes(r.codes) for r in encoded.collect()}
    assert all(len(c) == 64 for c in rows.values())  # 4x down from float32
    # retrain (no seed, no sample: exact corpus min/max) -> identical codes
    params2 = train_sq(corpus, "v")
    again = {
        r.id: bytes(r.codes)
        for r in encode_sq(corpus, params2, id_col="id", vector_col="v").collect()
    }
    assert rows == again


def test_reconstruction_error_bounded_by_half_step(corpus, sq_index):
    """Midpoint decode: |x - decode(encode(x))| <= step/2 per dimension,
    the defining property of the affine quantizer."""
    params, encoded = sq_index
    originals = {r.id: np.asarray(r.v, dtype=np.float64) for r in corpus.collect()}
    step = params.step
    for r in encoded.limit(50).collect():
        codes = np.frombuffer(bytes(r.codes), dtype=np.uint8).astype(np.float64)
        dec = params.lo + (codes + 0.5) * step
        err = np.abs(originals[r.id] - dec)
        assert (err <= step / 2 + 1e-12).all()


def test_sq_recall_vs_exact(corpus, sq_index):
    """Asymmetric SQ8 cosine top-10 vs exact cosine top-10: 8-bit affine
    quantization barely moves cosine neighborhoods — require >= 8/10 per
    query over a 5-query set and a mean >= 0.9."""
    from hybrid_vector_search_spark.operators.knn import knn_join
    from hybrid_vector_search_spark.operators.sq import sq_search_batch

    params, encoded = sq_index
    qrows = corpus.where("id < 5").orderBy("id").collect()
    qvecs = [(r.id, [float(x) for x in r.v]) for r in qrows]
    qdf = corpus.where("id < 5").select(
        F.col("id").alias("query_id"), F.col("v").alias("embedding")
    )
    exact = knn_join(
        qdf, corpus, K, corpus_vector_col="v", corpus_id_col="id", metric="cosine"
    )
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.id)
    approx = sq_search_batch(encoded, params, qvecs, K)
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets[q]) / K for q in exact_sets
    ]
    assert len(recalls) == 5
    assert min(recalls) >= 0.8
    assert sum(recalls) / len(recalls) >= 0.9


def test_degenerate_constant_dimension(spark):
    """A constant dimension must encode to code 0 everywhere and decode
    without dividing by zero."""
    from hybrid_vector_search_spark.operators.sq import encode_sq, train_sq

    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0]), (3, [1.0, 6.0])],
        "id long, v array<double>",
    )
    params = train_sq(df, "v")
    assert params.step[0] > 0
    enc = encode_sq(df, params, id_col="id", vector_col="v").collect()
    first_bytes = {bytes(r.codes)[0] for r in enc}
    assert first_bytes == {0}
