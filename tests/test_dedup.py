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
