"""PII redaction: planted fixtures, Spark vs DuckDB twin, and flag stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.pii import REDACTION_RULES, pii_doc_flags, redact_pii

FIXTURES = [
    (1, "reach me at john.doe+spam@example.co.uk or 555-867-5309 today"),
    (2, "ssn 123-45-6789 ip 10.0.0.1 phone 800-555-0100"),
    (3, "no pii here, just 1234 numbers and a-b-c dashes"),
    (4, "two mails a@b.io c.d@e.org and ip 192.168.001.255"),
    (5, ""),
]


def test_redact_counts_and_text(spark):
    df = spark.createDataFrame(FIXTURES, ["id", "text"])
    rows = {r.id: r for r in redact_pii(df, "id", "text").collect()}
    assert rows[1].n_email == 1 and rows[1].n_phone == 1 and rows[1].n_ssn == 0
    assert rows[2].n_ssn == 1 and rows[2].n_ipv4 == 1 and rows[2].n_phone == 1
    assert rows[3].n_email == rows[3].n_ssn == rows[3].n_phone == rows[3].n_ipv4 == 0
    assert rows[4].n_email == 2 and rows[4].n_ipv4 == 1
    assert rows[1].redacted == "reach me at [EMAIL] or [PHONE] today"
    assert rows[2].redacted == "ssn [SSN] ip [IP] phone [PHONE]"
    assert rows[3].redacted == FIXTURES[2][1]
    assert rows[5].redacted == ""


def test_redact_matches_duckdb_twin(spark, duck):
    """Byte-identical patterns must behave identically under DuckDB's RE2 —
    the property the driver oracle depends on."""
    df = spark.createDataFrame(FIXTURES, ["id", "text"])
    got = {
        r.id: (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4, r.redacted)
        for r in redact_pii(df, "id", "text").collect()
    }
    red = "text"
    counts = []
    for name, pat, repl in REDACTION_RULES:
        counts.append(f"len(regexp_extract_all(text, '{pat}')) AS n_{name}")
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    duck.execute("CREATE OR REPLACE TABLE pii_fix(id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO pii_fix VALUES (?, ?)", FIXTURES)
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in duck.execute(
            f"SELECT id, {', '.join(counts)}, {red} AS redacted FROM pii_fix"
        ).fetchall()
    }
    assert got == want


def test_pii_flags(spark):
    df = spark.createDataFrame(FIXTURES, ["id", "text"])
    flags = {r.id: r.has_pii for r in pii_doc_flags(df, "id", "text").collect()}
    assert flags == {1: True, 2: True, 3: False, 4: True, 5: False}


def test_redaction_is_jvm_only(spark):
    """The redaction plan must stay inside codegen — no Python boundary."""
    df = spark.createDataFrame(FIXTURES, ["id", "text"])
    plan = redact_pii(df, "id", "text")._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_t_closeness_flags_divergent_group_only(spark):
    """Group `a` splits 50/50 across bands while the table runs 87.5/12.5,
    so TV(a) = (|0.5-0.875| + |0.5-0.125|)/2 = 0.375 > t; group `b` matches
    the majority band (TV = 0.125) and passes. The absent-band mass path is
    exercised by `b` (band 1 never appears in it)."""
    from hybrid_vector_search_spark.operators.pii import t_closeness_violations

    rows = [("a", 0), ("a", 0), ("a", 1), ("a", 1)] + [("b", 0)] * 12
    df = spark.createDataFrame(rows, "grp string, band long")
    out = t_closeness_violations(df, ["grp"], "band", t=0.3).collect()
    assert [(r["grp"], r["group_size"], r["tv_distance"]) for r in out] == [
        ("a", 4, 0.375)
    ]
