"""Deterministic sampling operators — focused on temperature_mixing (the
other members are pinned by driver oracles: sample_deterministic,
stratified_sample, dataset_split_counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.sampling import temperature_mixing

ROWS = [(i, "en" if i % 10 < 7 else ("de" if i % 10 < 9 else "fr")) for i in range(2000)]
# strata: en 1400, de 400, fr 200


def _df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "lang"])


def test_smallest_stratum_keeps_everything(spark):
    out = temperature_mixing(_df(spark), "doc_id", "lang", alpha=0.3)
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept["fr"] == 200  # keep_rate = (200/200)^0.7 = 1
    # dominant strata flattened toward the target rate (hash sampling is
    # exact on the bucket threshold, so tolerance is just hash granularity)
    exp_en = (200 / 1400) ** 0.7
    exp_de = (200 / 400) ** 0.7
    assert abs(kept["en"] / 1400 - exp_en) < 0.05
    assert abs(kept["de"] / 400 - exp_de) < 0.05


def test_alpha_one_is_identity(spark):
    df = _df(spark)
    assert temperature_mixing(df, "doc_id", "lang", alpha=1.0).count() == df.count()


def test_membership_is_partitioning_invariant(spark):
    df = _df(spark)
    a = {r.doc_id for r in temperature_mixing(df, "doc_id", "lang").collect()}
    b = {
        r.doc_id
        for r in temperature_mixing(df.repartition(17), "doc_id", "lang").collect()
    }
    assert a == b and len(a) > 0


def test_corpus_never_shuffles(spark):
    """The census aggregates map-side and comes back broadcast; the corpus
    relation itself must reach the filter without a hash exchange."""
    plan = (
        temperature_mixing(_df(spark), "doc_id", "lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the only Exchanges are the census aggregate's own (tiny, stratum-sized)
    # and broadcasts; no hashpartitioning exchange of the full corpus by lang
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "lang" in line and "doc_id" not in line, line
