"""corpus_clean_observed: Spark Observation metrics as a free side-channel —
one action yields both the cleaned summary and corpus-wide funnel counters,
and those counters must equal the aggregate twin's totals."""

from __future__ import annotations

from hybrid_vector_search_spark.plans import pipeline

from .conftest import SF_SMALL


def test_observation_equals_funnel_totals(spark):
    result, obs = pipeline.corpus_clean_observed(spark, SF_SMALL)
    rows = result.collect()  # the ONE action; metrics ride along
    got = obs.get
    funnel = pipeline.corpus_clean_funnel(spark, SF_SMALL).collect()
    want = {
        k: sum(r[k] for r in funnel)
        for k in ["n_total", "n_quality", "n_lang", "n_unique", "n_train", "n_kept"]
    }
    assert got == want
    # and the observed result is exactly corpus_clean's
    assert rows == pipeline.corpus_clean(spark, SF_SMALL).collect()
    assert want["n_kept"] == sum(r["n_docs"] for r in rows)
