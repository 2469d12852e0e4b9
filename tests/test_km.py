"""Kaplan-Meier estimator semantics on hand fixtures (via the declared
query's machinery: planted censoring is part of the query, so the unit
fixture tests the estimator arithmetic through a manual risk table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_km_curve_hand_values(spark):
    """Textbook fixture: deaths at t=1 (2 of 5) and t=3 (1 of 2), censored
    at t=2 (1). S(1) = 3/5; S(3) = 3/5 * 1/2 = 0.3. The censored unit
    leaves the risk set between 1 and 3 but is at risk AT its own time."""
    from pyspark.sql import Window

    rows = [(1, 5, 2), (2, 3, 0), (3, 2, 1)]
    risk = spark.createDataFrame(rows, "t int, n_at_risk long, n_events long")
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        risk.select(
            "t",
            "n_events",
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("n_events").cast("double") / F.col("n_at_risk").cast("double")
                ),
                12,
            ).cast("decimal(38,12)").alias("lnf"),
        )
        .select("t", "n_events", F.round(F.exp(F.sum("lnf").over(w).cast("double")), 6).alias("s"))
        .where(F.col("n_events") > 0)
        .orderBy("t")
        .collect()
    )
    got = {r["t"]: r["s"] for r in out}
    assert got[1] == pytest.approx(0.6, abs=1e-9)
    assert got[3] == pytest.approx(0.3, abs=1e-9)


def test_km_query_monotone_and_bounded(spark):
    """The declared query's curve is a valid survival function: in (0, 1],
    non-increasing in t, with censored mass keeping it above the naive
    death fraction."""
    from hybrid_vector_search_spark.plans.relational import kaplan_meier_conversion

    rows = kaplan_meier_conversion(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 3
    vals = [r["survival"] for r in rows]
    assert all(0.0 < v <= 1.0 for v in vals)
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert all(r["n_at_risk"] >= r["n_events"] for r in rows)
