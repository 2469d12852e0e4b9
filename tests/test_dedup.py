"""Dedup-pipeline plan knobs: minhash_lsh_eval sampled-audit mode."""

from __future__ import annotations
def test_minhash_lsh_eval_sample_frac(spark):
    """sample_frac audits a deterministic hash-slice: full run and sampled
    run both produce the one-row attestation; the sampled truth count is a
    subset (≤), and frac=1.0 reproduces the full-corpus row exactly."""
    import pytest

    from hybrid_vector_search_spark.plans.pipeline import minhash_lsh_eval

    sf = "/root/testdata/sf0.001"
    full = minhash_lsh_eval(spark, sf).collect()[0]
    again = minhash_lsh_eval(spark, sf, sample_frac=1.0).collect()[0]
    assert full.asDict() == again.asDict()
    half = minhash_lsh_eval(spark, sf, sample_frac=0.5).collect()[0]
    assert half["n_truth"] <= full["n_truth"]
    assert half["n_candidates"] <= full["n_candidates"]
    with pytest.raises(ValueError, match="sample_frac"):
        minhash_lsh_eval(spark, sf, sample_frac=0.0)


def test_jaccard_pairs_size_fastpath_matches_plain(spark):
    """r13: jaccard_pairs over a with_size shingle table (sizes ride the
    join) must equal the plain aggregate-sizes shape exactly."""
    from hybrid_vector_search_spark.operators import dedup
    from hybrid_vector_search_spark.sources import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    plain = dedup.shingle_table(docs, "doc_id", "text", n=3)
    sized = dedup.shingle_table(docs, "doc_id", "text", n=3, with_size=True)
    a = {tuple(r) for r in dedup.jaccard_pairs(plain, min_jaccard=0.5).collect()}
    b = {tuple(r) for r in dedup.jaccard_pairs(sized, min_jaccard=0.5).collect()}
    assert a == b and len(a) > 0


def test_jaccard_between_size_fastpath_matches_plain(spark):
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators import dedup
    from hybrid_vector_search_spark.sources import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    base = docs.select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 30_000).alias("doc_id"), "text"
    )
    plain = dedup.jaccard_pairs_between(
        dedup.shingle_table(base, "doc_id", "text", n=3),
        dedup.shingle_table(new, "doc_id", "text", n=3),
        min_jaccard=0.5,
    )
    fast = dedup.jaccard_pairs_between(
        dedup.shingle_table(base, "doc_id", "text", n=3, with_size=True),
        dedup.shingle_table(new, "doc_id", "text", n=3, with_size=True),
        min_jaccard=0.5,
    )
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in fast.collect()}
    assert a == b and len(a) > 0


def test_minhash_near_dups_candidate_first_matches_filtered_exact(spark):
    """r13: candidate-first verify (exact Jaccard computed only for LSH
    candidates) must equal the old exact-everything ∩ candidates shape."""
    from hybrid_vector_search_spark.operators import dedup
    from hybrid_vector_search_spark.sources import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    new = {
        tuple(r)
        for r in dedup.minhash_near_dups(
            docs, "doc_id", "text", min_jaccard=0.7, bands=4, rows_per_band=2,
            shingle_n=3,
        ).collect()
    }
    # old shape, reconstructed: full exact pairs filtered to LSH candidates
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_n=3)
    cands = dedup.lsh_candidates(sigs, bands=4, rows_per_band=2, max_bucket_size=1000)
    sh = dedup.shingle_table(docs, "doc_id", "text", n=3)
    exact = dedup.jaccard_pairs(sh, min_jaccard=0.7)
    old = {tuple(r) for r in exact.join(cands, ["id_a", "id_b"], "left_semi").collect()}
    assert new == old and len(new) > 0
