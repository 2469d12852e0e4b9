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


def test_embedding_drift_detects_planted_shift(spark, tmp_path):
    """A deliberately shifted 'current' half must score centroid_cos well
    below the unshifted label's ~1.0."""
    import numpy as np

    rng = np.random.RandomState(7)
    # label independent of vec_id parity so every label has both halves;
    # each label clusters around its own base direction (a centroid of pure
    # noise has a RANDOM direction, which would make even the undrifted
    # halves decorrelate)
    bases = {0: rng.normal(0, 1, 16), 1: rng.normal(0, 1, 16)}
    rows = [
        (
            i,
            [float(x) for x in bases[(i // 2) % 2] + 0.3 * rng.normal(0, 1, 16)],
            (i // 2) % 2,
        )
        for i in range(400)
    ]
    # plant the drift on label 0's CURRENT half (odd vec_ids): add +8 on dim 0
    rows = [
        (i, ([v[0] + 8.0] + v[1:]) if (lab == 0 and i % 2 == 1) else v, lab)
        for (i, v, lab) in rows
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path / "emb")
    df.write.mode("overwrite").parquet(d + "/embeddings.parquet")
    out = {r["label"]: r for r in pipeline.embedding_drift(spark, str(tmp_path / "emb")).collect()}
    assert out[0]["centroid_cos"] < 0.9 < out[1]["centroid_cos"]
    assert out[0]["n_ref"] + out[0]["n_cur"] == 200
