"""oov_rate and compression_ratio: value pins the oracle can't cover."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import textstats


def test_oov_rate_with_explicit_vocab(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha alpha zzz"), (3, "")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("alpha",), ("beta",)], "tok string")
    rows = {
        r["id"]: r
        for r in textstats.oov_rate(docs, "doc_id", "text", vocab=vocab).collect()
    }
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_oov"] == 2 and rows[1]["oov_rate"] == 0.5
    assert rows[2]["n_tokens"] == 3 and rows[2]["n_oov"] == 1
    # token-less doc survives with rate 0.0 (explode_outer keeps it)
    assert rows[3]["n_tokens"] == 0 and rows[3]["oov_rate"] == 0.0


def test_oov_default_vocab_cut_is_takeordered(spark):
    """The top-N vocab cut must plan as TakeOrderedAndProject — never a
    single-partition global sort of the token relation."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common") for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        textstats.oov_rate(docs, "doc_id", "text", vocab_size=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_compression_ratio_matches_direct_zlib(spark):
    texts = [
        (1, "spam spam spam " * 50),
        (2, "the quick brown fox jumps over the lazy dog and keeps going"),
        (3, ""),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {
        r["id"]: r
        for r in textstats.compression_ratio(docs, "doc_id", "text").collect()
    }
    for i, t in texts:
        b = t.encode()
        assert rows[i]["n_bytes"] == len(b)
        want = len(zlib.compress(b, 6)) if b else 0
        assert rows[i]["n_compressed"] == want
    # repetitive text compresses far harder than prose; empty reports 0.0
    assert rows[1]["compression_ratio"] < 0.1 < rows[2]["compression_ratio"]
    assert rows[3]["compression_ratio"] == 0.0


def test_compression_ratio_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"doc body {i} " * (i % 9 + 1)) for i in range(60)],
        "doc_id long, text string",
    )
    one = sorted(
        map(tuple, textstats.compression_ratio(docs.coalesce(1), "doc_id", "text").collect())
    )
    many = sorted(
        map(tuple, textstats.compression_ratio(docs.repartition(13), "doc_id", "text").collect())
    )
    assert one == many


def test_kl_zero_for_identical_distribution_and_positive_for_skew(spark):
    """A group whose token distribution equals the corpus's has KL 0; a
    group concentrated on its own jargon scores strictly higher. KL >= 0
    always (Gibbs)."""
    same = [("a", "x y z"), ("b", "x y z")]  # both groups == corpus mix
    df = spark.createDataFrame(same, "src string, text string")
    rows = {r["g"]: r for r in textstats.source_token_divergence(df, "src", "text").collect()}
    assert rows["a"]["kl_divergence"] == 0.0 == rows["b"]["kl_divergence"]

    skew = [("a", "x x x x y"), ("b", "jargon jargon jargon jargon y")]
    df2 = spark.createDataFrame(skew, "src string, text string")
    rows2 = {r["g"]: r for r in textstats.source_token_divergence(df2, "src", "text").collect()}
    assert rows2["a"]["kl_divergence"] > 0 and rows2["b"]["kl_divergence"] > 0
    # all groups' KL values are non-negative by Gibbs' inequality
    assert min(r["kl_divergence"] for r in rows2.values()) >= 0.0
