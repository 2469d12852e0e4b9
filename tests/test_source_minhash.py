"""dedup.grouped_minhash_signatures / signature_jaccard_estimates: the
group-level MinHash estimator's boundary behavior and plan shape."""

from __future__ import annotations

from hybrid_vector_search_spark.operators import dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "src string, text string")


def test_identical_groups_estimate_one(spark):
    rows = [("a", f"alpha beta gamma delta epsilon {i}") for i in range(5)] + [
        ("b", f"alpha beta gamma delta epsilon {i}") for i in range(5)
    ]
    sig = dedup.grouped_minhash_signatures(_df(spark, rows), "src", "text", num_hashes=16)
    [est] = dedup.signature_jaccard_estimates(sig, num_hashes=16).collect()
    assert (est["g_a"], est["g_b"]) == ("a", "b")
    assert est["n_agree"] == 16 and est["est_jaccard"] == 1.0


def test_disjoint_groups_estimate_zero(spark):
    rows = [("a", "one two three four five six")] + [("b", "seven eight nine ten eleven twelve")]
    sig = dedup.grouped_minhash_signatures(_df(spark, rows), "src", "text", num_hashes=16)
    [est] = dedup.signature_jaccard_estimates(sig, num_hashes=16).collect()
    assert est["n_agree"] == 0 and est["est_jaccard"] == 0.0


def test_estimate_tracks_true_jaccard(spark):
    """Half-overlapping shingle sets → estimate within MinHash noise of the
    true Jaccard (H=64 → σ≈0.06; assert a 4σ band)."""
    base = [f"tok{i}" for i in range(40)]
    # group a: shingles over tokens 0..39; group b: tokens 20..59 — the
    # 3-gram shingle sets overlap roughly in the shared 20-token span
    a_text = " ".join(base)
    b_text = " ".join([f"tok{i}" for i in range(20, 60)])
    sig = dedup.grouped_minhash_signatures(
        _df(spark, [("a", a_text), ("b", b_text)]), "src", "text", num_hashes=64
    )
    [est] = dedup.signature_jaccard_estimates(sig, num_hashes=64).collect()
    # true jaccard: 18 shared 3-grams of 38+38 per side → 18/58 ≈ 0.31
    assert 0.07 < est["est_jaccard"] < 0.55


def test_signature_agg_is_partial(spark):
    """The groupBy(min…) must partial-aggregate map-side (partial_min before
    the one Exchange — string mins lower to SortAggregate, not
    HashAggregate), so the shuffle carries group-level mins only."""
    rows = [(f"s{i % 4}", f"word{i} word{i+1} word{i+2} word{i+3}") for i in range(40)]
    sig = dedup.grouped_minhash_signatures(_df(spark, rows), "src", "text", num_hashes=8)
    plan = sig._jdf.queryExecution().executedPlan().toString()
    # the kernel's RoundRobin rebalance is narrow-row (g, t); the only
    # signature-bearing exchange is the single group hashpartitioning
    assert "partial_min" in plan and plan.count("Exchange hashpartitioning") == 1, plan


def test_pandas_kernel_matches_sql_kernel(spark):
    """The Arrow fast path must emit EXACTLY the Catalyst explosion's
    signatures (min associativity over per-doc mins) — same pin discipline
    as minhash_signatures' kernels."""
    rows = [
        (f"s{i % 3}", f"alpha beta gamma tok{i} tok{i+1} delta epsilon")
        for i in range(30)
    ]
    df = _df(spark, rows)
    fast = dedup.grouped_minhash_signatures(df, "src", "text", num_hashes=8)
    base = dedup.grouped_minhash_signatures(df, "src", "text", num_hashes=8, kernel="sql")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, base.collect()))
