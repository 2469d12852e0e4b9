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


def test_stratified_exact_k_counts_and_stability(spark):
    """Exactly min(k, |stratum|) rows per stratum; growing a stratum can only
    EVICT tail rows from the kept prefix, never admit previously-unranked
    rows ahead of kept ones (the hash ordering is static)."""
    from hybrid_vector_search_spark.operators.sampling import stratified_sample_exact

    rows = [(i, "a" if i % 2 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_sample_exact(df, "id", "s", 7)
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 7, "b": 7}
    # tiny stratum: returns the whole stratum, not an error
    small = spark.createDataFrame([(1, "x"), (2, "x")], "id long, s string")
    assert stratified_sample_exact(small, "id", "s", 7).count() == 2
    # stability: sample from a 50-row prefix corpus; every kept id that is
    # ALSO kept in the 100-row corpus keeps its relative hash order — i.e.
    # kept(100) ∩ prefix ⊆ kept(50)
    pre = spark.createDataFrame(rows[:50], "id long, s string")
    kept_small = {r["id"] for r in stratified_sample_exact(pre, "id", "s", 7).collect()}
    kept_big = {r["id"] for r in stratified_sample_exact(df, "id", "s", 7).collect()}
    assert kept_big & {i for i, _ in rows[:50]} <= kept_small


def test_user_purge_removes_every_listed_user(spark):
    """No event of a purged user survives, and the audit counts reconcile."""
    from hybrid_vector_search_spark.plans.pipeline import user_purge_counts
    from hybrid_vector_search_spark.sources import load_table

    from .conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    kept = ev.join(
        F.broadcast(ev.select("user_id").distinct().where(F.col("user_id") % 97 == 0)),
        "user_id",
        "left_anti",
    )
    assert kept.where(F.col("user_id") % 97 == 0).count() == 0
    audit = user_purge_counts(spark, SF_SMALL).collect()
    assert all(r["n_total"] == r["n_kept"] + r["n_purged"] for r in audit)
    assert sum(r["n_purged"] for r in audit) == ev.where(F.col("user_id") % 97 == 0).count()


def test_user_purge_anti_join_is_broadcast(spark):
    """The deletion list must broadcast: BroadcastHashJoin ... LeftAnti in
    the plan, never a shuffled anti join of the fact table."""
    from hybrid_vector_search_spark.plans.pipeline import user_purge_counts

    from .conftest import SF_SMALL

    plan = (
        user_purge_counts(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan and "SortMergeJoin LeftAnti" not in plan, plan


def test_exact_k_prerank_equals_window(spark):
    """method='prerank' (partition-local TakeOrdered prune + small window)
    must select EXACTLY the same rows as the window plan — r5 verdict ask #6."""
    from hybrid_vector_search_spark.operators.sampling import (
        stratified_sample_exact,
    )

    from .conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").repartition(7)
    for k in (1, 10, 100000):  # k beyond stratum size → whole stratum kept
        a = stratified_sample_exact(docs, "doc_id", "lang", k, method="window")
        b = stratified_sample_exact(docs, "doc_id", "lang", k, method="prerank")
        rows_a = sorted((r["lang"], r["doc_id"]) for r in a.collect())
        rows_b = sorted((r["lang"], r["doc_id"]) for r in b.collect())
        assert rows_a == rows_b, k
    assert sorted(a.columns) == sorted(docs.columns)


def test_exact_k_prerank_shuffles_pruned_rows_only(spark):
    """The prerank plan must prune BEFORE the stratum exchange: the
    mapInPandas stage sits under the window's shuffle, so the exchange
    carries <= partitions*k rows per stratum, never the stratum."""
    from hybrid_vector_search_spark.operators.sampling import (
        stratified_sample_exact,
    )

    from .conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").repartition(5)
    plan = (
        stratified_sample_exact(docs, "doc_id", "lang", 3, method="prerank")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    i_map = plan.find("MapInPandas")
    i_ex = plan.find("Exchange hashpartitioning(lang")
    assert i_map != -1 and i_ex != -1
    # toString prints downstream-first: the exchange must appear ABOVE the
    # Arrow prune (i.e. consume it), not below
    assert i_ex < i_map, plan
