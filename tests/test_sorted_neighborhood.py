"""dedup.sorted_neighborhood_pairs: recall on planted dupes, linear candidate
bound, and the bucketed-window plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import dedup
from hybrid_vector_search_spark.plans import pipeline

from .conftest import SF_SMALL


def test_finds_planted_exact_dupes(spark):
    """Exact copies share their original's sort key, so they rank adjacent
    and every planted pair must surface with jaccard 1.0."""
    rows = pipeline.sorted_neighborhood_dedup(spark, SF_SMALL).collect()
    found = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    expect = {
        (r["doc_id"], r["doc_id"] + pipeline.PLANT_OFFSET)
        for r in docs.where(F.col("doc_id") % pipeline.PLANT_STEP == 0).collect()
    }
    assert expect, "fixture lost its planted dupes"
    for pair in expect:
        assert found.get(pair) == 1.0, pair


def test_candidate_count_is_linear(spark):
    """SNM's whole point: ≤ n·window candidate pairs, never n²."""
    docs = spark.createDataFrame(
        [(i, f"common opening words here then tail {i}") for i in range(200)],
        "doc_id long, text string",
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^\p{L}\p{N}]+", " "))
    keys = docs.select(F.col("doc_id").alias("id"), norm.substr(1, 24).alias("key"))
    # all 200 docs share one bucket and one key prefix — the adversarial case
    out = dedup.sorted_neighborhood_pairs(
        docs, "doc_id", "text", window=3, min_jaccard=0.0
    )
    assert keys.select("key").distinct().count() == 1
    assert out.count() <= 200 * 3


def test_window_is_bucketed_not_global(spark):
    """The rank window must partition by the bucket — no Exchange
    SinglePartition feeding a global sort of the corpus."""
    docs = spark.createDataFrame(
        [(i, f"text number {i} with some shared words") for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        dedup.sorted_neighborhood_pairs(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(b" in plan, plan


def test_second_pass_catches_differing_openings(spark):
    """Docs identical except a prepended headline miss the prefix pass but
    share the reversed-text (ending) key — passes=2 must find them."""
    body = "shared body text alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, body), (2, "zzz unique headline " + body)]
        + [(10 + i, f"filler document number {i} totally different words") for i in range(8)],
        "doc_id long, text string",
    )
    one = dedup.sorted_neighborhood_pairs(docs, "doc_id", "text", min_jaccard=0.5, passes=1)
    two = dedup.sorted_neighborhood_pairs(docs, "doc_id", "text", min_jaccard=0.5, passes=2)
    assert not [r for r in one.collect() if (r["id_a"], r["id_b"]) == (1, 2)]
    assert [r for r in two.collect() if (r["id_a"], r["id_b"]) == (1, 2)]


def test_passes_validation(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.sorted_neighborhood_pairs(docs, "doc_id", "text", passes=3)
