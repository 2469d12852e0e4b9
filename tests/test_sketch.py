"""Count-min heavy hitters: one-sided error + exact-top-k recovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.sketch import (
    count_min_heavy_hitters,
    exact_heavy_hitters,
)


def _skewed_df(spark):
    # zipf-ish: value i appears ~ 3000/i times for i in 1..40 — clear heavy head
    rows = []
    for i in range(1, 41):
        rows.extend([(f"v{i:02d}",)] * (3000 // i))
    return spark.createDataFrame(rows, ["w"]).repartition(8)


def test_cm_matches_exact_on_skewed_data(spark):
    df = _skewed_df(spark)
    exact = [(r.value, r.n) for r in exact_heavy_hitters(df, "w", 10).collect()]
    est = [(r.value, r.n_est) for r in count_min_heavy_hitters(df, "w", 10).collect()]
    assert [v for v, _ in est] == [v for v, _ in exact]
    # count-min is one-sided: estimate >= truth, and tight at this width
    truth = dict(exact)
    for v, n_est in est:
        assert n_est >= truth[v]
        assert n_est <= truth[v] * 1.05


def test_cm_estimate_never_underestimates(spark):
    df = _skewed_df(spark)
    truth = {r.value: r.n for r in exact_heavy_hitters(df, "w", 40).collect()}
    est = {r.value: r.n_est for r in count_min_heavy_hitters(df, "w", 40).collect()}
    for v, n in est.items():
        assert n >= truth.get(v, 0)


def test_exact_heavy_hitters_on_documents(spark):
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = exact_heavy_hitters(docs, "source", 5).collect()
    assert len(out) >= 1
    assert out == sorted(out, key=lambda r: (-r.n, r.value))


def test_exact_heavy_hitters_plan_is_partial_agg_topk(spark):
    """One shuffle (partial count) + TakeOrderedAndProject — no global sort."""
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        exact_heavy_hitters(docs, "source", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_hll_union_of_partials_equals_global_sketch(spark):
    """The mergeable-sketch contract behind plans.relational.hll_partial_union:
    unioning per-group HLL sketches (same lgK) estimates exactly what one
    global sketch over all rows estimates — merging loses nothing, so
    sketch partials can be persisted per partition/day and the raw table
    never re-scanned."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    merged = (
        ev.groupBy("event_type")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk, true))").alias("est"))
        .first()[0]
    )
    direct = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
    ).first()[0]
    assert merged == direct


def test_hll_union_partitioning_invariant(spark):
    """Same union estimate no matter how the rows are partitioned."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    def est(df):
        return (
            df.groupBy(F.col("user_id") % 7)
            .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
            .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
            .first()[0]
        )

    assert est(ev) == est(ev.repartition(17))
