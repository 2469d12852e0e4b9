"""operators.profiling: one-pass column profile semantics and plan shape."""

from __future__ import annotations

from hybrid_vector_search_spark.operators.profiling import (
    profile_aggregates,
    profile_table,
)


def _by_col(df):
    return {r["column"]: r for r in df.collect()}


def test_profile_statistics(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", None), (2, None, 2.25), (4, "a", 99.0)],
        "k long, s string, v double",
    )
    got = _by_col(profile_table(df))
    assert got["k"]["n_rows"] == 4
    assert (got["k"]["n_null"], got["k"]["n_distinct"]) == (0, 3)
    assert (got["k"]["min_value"], got["k"]["max_value"]) == ("1", "4")
    assert (got["s"]["n_null"], got["s"]["n_distinct"]) == (1, 2)
    # fractional numerics canonicalize through DECIMAL(30,6): no scientific
    # notation, fixed scale — byte-identical across engines
    assert (got["v"]["min_value"], got["v"]["max_value"]) == (
        "2.250000",
        "99.000000",
    )
    assert got["v"]["n_null"] == 1


def test_profile_is_two_hash_aggregate_passes(spark):
    """However many columns are profiled, the plan is exactly TWO scans of
    the relation — counts + count-distincts (one Expand, hash-aggregated)
    and an Expand-free min/max pass — never per-column jobs or unions.
    The split is deliberate: a string-typed min/max buffer disqualifies
    hash aggregation, and folding min/max into the distinct aggregate drags
    the whole Expand through a SortAggregate + Sort cascade (measured
    2.6s -> 2.0s on sf0.1 orders)."""
    df = spark.createDataFrame(
        [(i, str(i % 3), float(i)) for i in range(50)], "k long, s string, v double"
    )
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") == 2, plan
    assert "Union" not in plan
    # the Expand must ride hash aggregation, not the sort-based fallback
    assert "HashAggregate" in plan, plan
    # the ONLY sort-based aggregation is the Expand-free min/max pair
    # (partial + final, global — no grouping keys, so no Sort node exists
    # anywhere in the plan)
    assert plan.count("SortAggregate") == 2, plan
    assert "+- Sort " not in plan, plan


def test_profile_shared_exact_agg_equivalence(spark):
    """The shared-exact-pass shapes (r7): a report unpivoted from a
    precomputed/persisted profile_aggregates row is row-identical to the
    self-contained plan, and the attesting twin built on the shared row
    keeps the exact columns identical while adding only the HLL scan —
    the Expand never has to run once per downstream report."""
    df = spark.createDataFrame(
        [(i, str(i % 5), float(i) / 3) for i in range(200)],
        "k long, s string, v double",
    )
    cols = ["k", "s", "v"]
    shared = profile_aggregates(df, cols).cache()
    try:
        shared.count()
        base = {
            r["column"]: r for r in profile_table(df, cols).collect()
        }
        via_shared = {
            r["column"]: r
            for r in profile_table(df, cols, exact_agg=shared).collect()
        }
        assert base == via_shared
        attested = profile_table(
            df, cols, attest_rsd=0.02, exact_agg=shared
        ).collect()
        for r in attested:
            b = base[r["column"]]
            assert (r["n_rows"], r["n_null"], r["n_distinct"]) == (
                b["n_rows"],
                b["n_null"],
                b["n_distinct"],
            )
            assert (r["min_value"], r["max_value"]) == (
                b["min_value"],
                b["max_value"],
            )
            assert r["approx_within_tol"] is True
    finally:
        shared.unpersist()


def test_profile_approx_distinct_mode(spark):
    """approx_distinct=True (the 100 TB default) keeps the schema, estimates
    n_distinct, and drops the Expand from the plan."""
    df = spark.createDataFrame([(i, i % 7) for i in range(1000)], "a long, b long")
    prof = profile_table(df, approx_distinct=True)
    got = _by_col(prof)
    assert got["b"]["n_distinct"] == 7  # HLL is exact at tiny cardinality
    assert abs(got["a"]["n_distinct"] - 1000) / 1000 < 0.05
    assert "Expand" not in prof._jdf.queryExecution().executedPlan().toString()
