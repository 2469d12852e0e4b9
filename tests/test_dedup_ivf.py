"""IVF-bucketed embedding near-dup: the sub-quadratic path must emit a
subset of the exact kernel's pairs with identical cosines, at measured
recall — never assumed (the same policy as the IVF/LSH ANN paths)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import dedup
from tests.conftest import SF_SMALL


def _pairs(df):
    return {(r.id_a, r.id_b): r.cos for r in df.collect()}


def test_ivf_near_dups_subset_and_recall(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    exact = _pairs(dedup.embedding_near_dups(emb, "vec_id", "embedding", threshold=0.45))
    assert len(exact) > 0, "fixture must contain near-dup pairs"

    approx = _pairs(
        dedup.embedding_near_dups_ivf(
            emb, "vec_id", "embedding", threshold=0.45, n_clusters=8, nprobe=2
        )
    )
    # soundness: every reported pair is a true pair with the identical cosine
    for k, cos in approx.items():
        assert k in exact, f"false positive {k}"
        assert cos == exact[k]
    # recall: multi-probe over 8 clusters must keep most true pairs
    recall = len(approx) / len(exact)
    assert recall >= 0.8, f"recall {recall:.3f} below floor"


def test_ivf_near_dups_recall_rises_with_nprobe(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    exact = _pairs(dedup.embedding_near_dups(emb, "vec_id", "embedding", threshold=0.45))

    sizes = []
    for nprobe in (1, 4):
        approx = _pairs(
            dedup.embedding_near_dups_ivf(
                emb, "vec_id", "embedding", threshold=0.45, n_clusters=8, nprobe=nprobe
            )
        )
        sizes.append(len(approx))
    assert sizes[0] <= sizes[1] <= len(exact)
    # nprobe = n_clusters degenerates to every row in every bucket → exact
    full = _pairs(
        dedup.embedding_near_dups_ivf(
            emb, "vec_id", "embedding", threshold=0.45, n_clusters=4, nprobe=4
        )
    )
    assert full == exact


def test_ivf_near_dups_preserves_double_precision(spark):
    """The assign kernel re-emits vectors with the INPUT element type: for an
    array<double> corpus the degenerate-exact configuration must reproduce
    the exact kernel's cosines bit-for-bit (a fixed array<float> schema here
    would downcast and flip pairs at the 6-dp rounding boundary)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    exact = _pairs(dedup.embedding_near_dups(emb, "vec_id", "embedding", threshold=0.45))
    full = _pairs(
        dedup.embedding_near_dups_ivf(
            emb, "vec_id", "embedding", threshold=0.45, n_clusters=2, nprobe=2
        )
    )
    assert full == exact
