"""operators.urls: normalization and registrable-domain unit behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import urls


def _norm(spark, u):
    return (
        spark.createDataFrame([(u,)], "url string")
        .select(urls.normalize_url(F.col("url")).alias("n"))
        .first()["n"]
    )


def test_normalize_strips_tracking_fragment_case_slash(spark):
    assert (
        _norm(spark, "https://WWW.Ex.COM/Page?utm_source=a&id=7&utm_medium=b#frag")
        == "https://www.ex.com/Page?id=7"
    )
    assert _norm(spark, "http://Ex.com/path/") == "https://ex.com/path"
    assert _norm(spark, "https://ex.com/p?utm_x=1") == "https://ex.com/p"
    # path case is PRESERVED (paths are case-sensitive; only host lowers)
    assert _norm(spark, "https://EX.com/CaseSensitive") == "https://ex.com/CaseSensitive"


def test_registrable_domain_rules(spark):
    rows = [
        ("www.example.com", "example.com"),
        ("a.b.c.example.co.uk", "example.co.uk"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("deep.sub.example.org", "example.org"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "host string")
    got = [
        r["d"]
        for r in df.select(urls.registrable_domain(F.col("host")).alias("d")).collect()
    ]
    assert got == [want for _, want in rows]


def test_extract_counts_occurrences_not_distinct(spark):
    df = spark.createDataFrame(
        [(1, "x https://a.com/p y https://a.com/p z")], "id long, text string"
    )
    assert urls.extract_urls(df, "id", "text").count() == 2


def test_domain_stats_is_single_aggregate_plan(spark):
    """Everything before the domain groupBy must be a narrow map (regex
    projections + explode) — the aggregate exchanges are the only shuffles
    (two hashpartitionings: the distinct-expand pass and the final merge)."""
    df = spark.createDataFrame(
        [(i, f"see https://ex{i % 3}.com/p{i}") for i in range(30)],
        "id long, text string",
    )
    plan = (
        urls.domain_stats(df, "id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "Generate explode" in plan, plan


def test_normalize_is_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) — normalized output re-parses
    to itself, so URL-level dedup keys are stable under re-processing."""
    cases = [
        "https://WWW.Ex.COM/Page?utm_source=a&id=7#f",
        "http://blog.example.co.uk/post-5/",
        "https://a.b.example.org",
        "https://ex.com/p?utm_x=1&utm_y=2",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    once = df.select(urls.normalize_url(F.col("url")).alias("n"))
    twice = once.select(urls.normalize_url(F.col("n")).alias("n"))
    assert [r["n"] for r in once.collect()] == [r["n"] for r in twice.collect()]


def test_snm_precision_is_one_by_construction(spark):
    """Every returned SNM pair must actually satisfy the Jaccard threshold —
    candidates are verified, never trusted."""
    from hybrid_vector_search_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"common opening words here tail{i // 2}") for i in range(40)],
        "doc_id long, text string",
    )
    out = dd.sorted_neighborhood_pairs(docs, "doc_id", "text", min_jaccard=0.5)
    assert all(r["jaccard"] >= 0.5 for r in out.collect())


def test_sentence_trailing_dot_not_absorbed_into_host(spark):
    """'see https://example.com.' must yield host example.com, not
    'example.com.' (whose registrable domain would be 'com.') — ADVICE r5."""
    df = spark.createDataFrame(
        [(1, "see https://example.com. And http://a.b.co.uk- then.")],
        "id long, text string",
    )
    got = sorted(
        r["url"] for r in urls.extract_urls(df, "id", "text").collect()
    )
    assert got == ["http://a.b.co.uk", "https://example.com"]
    stats = urls.domain_stats(df, "id", "text")
    assert sorted(r["domain"] for r in stats.collect()) == ["b.co.uk", "example.com"]
