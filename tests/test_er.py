"""operators.er.fellegi_sunter_pairs — linkage semantics on a hand fixture."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _recs(spark):
    return spark.createDataFrame(
        [
            (1, "alice smith", 10, 100.0),
            (2, "alice smyth", 10, 100.5),   # typo + drift: true dupe of 1
            (3, "bob jones", 10, 100.2),     # same block, disagrees on name
            (4, "carol white", 20, 500.0),   # different block entirely
        ],
        "id long, name string, grp int, bal double",
    )


def _link(spark, threshold):
    from hybrid_vector_search_spark.operators.er import fellegi_sunter_pairs

    return fellegi_sunter_pairs(
        _recs(spark),
        "id",
        block_keys=[F.col("grp")],
        comparators=[
            ("name", lambda a, b: F.levenshtein(a["name"], b["name"]) <= 2, 0.9, 0.01),
            ("bal", lambda a, b: F.abs(a["bal"] - b["bal"]) <= 1.0, 0.8, 0.05),
        ],
        threshold=threshold,
    )


def test_true_dupe_links_and_scores_loglikelihood(spark):
    rows = {(r["id_a"], r["id_b"]): r["weight"] for r in _link(spark, 6.0).collect()}
    assert set(rows) == {(1, 2)}
    expect = round(math.log(0.9 / 0.01) + math.log(0.8 / 0.05), 6)
    assert abs(rows[(1, 2)] - expect) < 1e-9


def test_partial_agreement_scores_below_full(spark):
    """(1,3)/(2,3) agree on balance only: weight = ln(.1/.99) + ln(16) —
    negative name evidence pulls them under any sensible threshold."""
    got = {(r["id_a"], r["id_b"]): r["weight"] for r in _link(spark, -10.0).collect()}
    expect = round(math.log(0.1 / 0.99) + math.log(0.8 / 0.05), 6)
    assert got[(1, 3)] == expect and got[(2, 3)] == expect
    assert got[(1, 2)] > got[(1, 3)]


def test_blocking_never_compares_across_blocks(spark):
    got = _link(spark, -100.0).collect()
    assert all({r["id_a"], r["id_b"]} <= {1, 2, 3} for r in got), got


def test_multipass_blocking_unions_candidates(spark):
    from hybrid_vector_search_spark.operators.er import fellegi_sunter_pairs

    out = fellegi_sunter_pairs(
        _recs(spark),
        "id",
        block_keys=[F.col("grp"), F.floor(F.col("bal") / 1000.0)],
        comparators=[
            ("name", lambda a, b: F.levenshtein(a["name"], b["name"]) <= 2, 0.9, 0.01),
        ],
        threshold=-100.0,
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # pass 2 (bal-millennium) brings the cross-group (x, 4) candidates in
    assert (1, 4) in pairs and (1, 2) in pairs


def test_empty_block_keys_or_comparators_raises(spark):
    import pytest

    from hybrid_vector_search_spark.operators.er import fellegi_sunter_pairs

    with pytest.raises(ValueError, match="blocking key"):
        fellegi_sunter_pairs(
            _recs(spark), "id", block_keys=[],
            comparators=[("name", lambda a, b: a["name"] == b["name"], 0.9, 0.01)],
            threshold=0.0,
        )
    with pytest.raises(ValueError, match="comparator"):
        fellegi_sunter_pairs(
            _recs(spark), "id", block_keys=[F.col("grp")], comparators=[],
            threshold=0.0,
        )


def test_max_block_size_guard_raises_with_recipe(spark):
    """The hot-block guard (Σ n² fan-out contract): floor(bal/1000) puts
    all 4 rows in one block, so a cap of 2 must fail loud naming the
    offending pass and the salt-or-cap recipe; a cap of 4 (= the largest
    block) must pass and link normally."""
    import pytest

    from hybrid_vector_search_spark.operators.er import fellegi_sunter_pairs

    kwargs = dict(
        id_col="id",
        block_keys=[F.floor(F.col("bal") / 1000.0), F.col("grp")],
        comparators=[
            ("name", lambda a, b: F.levenshtein(a["name"], b["name"]) <= 2, 0.9, 0.01),
        ],
        threshold=-100.0,
    )
    with pytest.raises(ValueError, match=r"pass 0 .* 4 rows .*[Ss]alt"):
        fellegi_sunter_pairs(_recs(spark), max_block_size=2, **kwargs)
    out = fellegi_sunter_pairs(_recs(spark), max_block_size=4, **kwargs)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} >= {(1, 2)}


def test_stacked_blocking_matches_per_pass(spark):
    """r13: stacked=True (one exploded self-join for all passes) must
    produce the identical linkage as the per-pass join loop."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators.er import fellegi_sunter_pairs
    from hybrid_vector_search_spark.sources import load_table
    from tests.conftest import SF_SMALL

    cust = load_table(spark, SF_SMALL, "customer")
    recs = cust.select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    keys = [
        F.substring("c_name", 1, 12),
        F.concat_ws("|", F.col("c_nationkey"), F.floor(F.col("c_acctbal") / 500.0)),
    ]
    comps = [
        ("name", lambda a, b: F.levenshtein(a["c_name"], b["c_name"]) <= 2, 0.9, 0.01),
        ("seg", lambda a, b: a["c_mktsegment"] == b["c_mktsegment"], 0.95, 0.2),
    ]
    kw = dict(block_keys=keys, comparators=comps, threshold=2.0)
    plain = {tuple(r) for r in fellegi_sunter_pairs(recs, "c_custkey", **kw).collect()}
    fast = {
        tuple(r)
        for r in fellegi_sunter_pairs(recs, "c_custkey", stacked=True, **kw).collect()
    }
    assert plain == fast and len(plain) > 0


def test_stacked_rejects_block_size_guard(spark):
    import pytest
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators.er import fellegi_sunter_pairs
    from hybrid_vector_search_spark.sources import load_table
    from tests.conftest import SF_SMALL

    cust = load_table(spark, SF_SMALL, "customer")
    with pytest.raises(ValueError, match="max_block_size"):
        fellegi_sunter_pairs(
            cust,
            "c_custkey",
            block_keys=[F.substring("c_name", 1, 8)],
            comparators=[
                ("seg", lambda a, b: a["c_mktsegment"] == b["c_mktsegment"], 0.9, 0.1)
            ],
            threshold=1.0,
            stacked=True,
            max_block_size=10,
        )
