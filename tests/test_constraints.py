"""operators.constraints: violation semantics and the one-pass plan."""

from __future__ import annotations

from hybrid_vector_search_spark.operators import constraints as C


def _report(df, checks):
    return {r["constraint"]: r["n_violations"] for r in C.validate(df, checks).collect()}


def test_each_check_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "ok-1"),
            (2, -5.0, "B", "ok-2"),     # range violation
            (None, 20.0, "A", "ok-3"),  # null violation
            (4, 30.0, "Z", "bad"),      # accepted_values + regex violations
            (4, 40.0, "A", "ok-4"),     # duplicate key (with row above)
        ],
        "id long, amount double, status string, code string",
    )
    ref = spark.createDataFrame([(1,), (2,)], "id long")
    got = _report(
        df,
        [
            C.not_null("id"),
            C.in_range("amount", 0, 100),
            C.accepted_values("status", ["A", "B"]),
            C.matches("code", "^ok-"),
            C.unique("id"),
            C.foreign_key("id", ref, "id", "ref"),
        ],
    )
    assert got == {
        "not_null(id)": 1,
        "in_range(amount)": 1,
        "accepted_values(status)": 1,
        "matches(code)": 1,
        "unique(id)": 1,           # ONE duplicated key, not two rows
        "foreign_key(id->ref.id)": 2,  # the two id=4 rows; null id is not an FK violation
    }


def test_nulls_belong_to_not_null_only(spark):
    """A null value violates not_null and NOTHING else — range/domain/regex/
    FK checks must not double-count it."""
    df = spark.createDataFrame([(None, None, None)], "v double, s string, k long")
    ref = spark.createDataFrame([(1,)], "k long")
    got = _report(
        df,
        [
            C.in_range("v", 0, 1),
            C.accepted_values("s", ["A"]),
            C.matches("s", "^A"),
            C.foreign_key("k", ref, "k", "ref"),
        ],
    )
    assert set(got.values()) == {0}


def test_clean_data_reports_all_zeros(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, v double")
    got = _report(df, [C.not_null("id"), C.in_range("v", 0, 10), C.unique("id")])
    assert set(got.values()) == {0}


def test_row_checks_fold_into_one_aggregate(spark):
    """However many row-level checks are declared, the plan scans the fact
    relation ONCE (a single aggregate; no join, no unions of scans)."""
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "id long, v double")
    checks = [C.not_null("id"), C.in_range("v", 0, 100), C.not_null("v"), C.in_range("id", 0, None)]
    plan = (
        C.validate(df, checks)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") == 1, plan
