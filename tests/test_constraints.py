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


def test_empty_checks_returns_empty_report(spark):
    """No declared checks → empty (constraint, n_violations) relation, not
    an IndexError (ADVICE r5)."""
    df = spark.createDataFrame([(1,)], "id long")
    out = C.validate(df, [])
    assert out.columns == ["constraint", "n_violations"]
    assert out.count() == 0


def test_duplicate_check_names_each_get_a_row(spark):
    """Declaring the same check twice must not trip Spark's map-key dedup
    policy (ADVICE r5) — the unpivot is array-of-structs, so both rows
    survive."""
    df = spark.createDataFrame([(1,), (None,)], "id long")
    rows = C.validate(df, [C.not_null("id"), C.not_null("id")]).collect()
    assert [r["n_violations"] for r in rows] == [1, 1]
    assert {r["constraint"] for r in rows} == {"not_null(id)"}


def test_foreign_key_broadcast_is_opt_in(spark):
    """Default FK leaves join strategy to the planner (no forced broadcast
    hint — a fact-to-fact FK must be allowed to shuffle); broadcast=True
    plants the hint for dimension refs."""
    df = spark.createDataFrame([(1,), (9,)], "k long")
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    for bcast in (False, True):
        got = {
            r["constraint"]: r["n_violations"]
            for r in C.validate(df, [C.foreign_key("k", ref, "k", "ref", broadcast=bcast)]).collect()
        }
        assert got == {"foreign_key(k->ref.k)": 1}
    hinted = C.validate(df, [C.foreign_key("k", ref, "k", "ref", broadcast=True)])
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
