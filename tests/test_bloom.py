"""operators.bloom: build/prefilter semantics + the decontaminate_bloom
equivalence that makes the shared oracle valid."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import bloom
from hybrid_vector_search_spark.plans import pipeline

from .conftest import SF_SMALL


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_no_false_negatives(spark):
    """Every inserted key must pass the prefilter — the property the shared
    decontaminate oracle rests on — even with a degenerate 64-bit bitmap
    where collisions are guaranteed."""
    vals = [f"key-{i}" for i in range(200)]
    keys = _keys(spark, vals)
    for m_bits in (64, 1 << 10, 1 << 16):
        bm = bloom.bloom_build(keys, "k", m_bits=m_bits, k=3)
        passed = {
            r["k"]
            for r in bloom.bloom_prefilter(keys, "k", bm, m_bits=m_bits, k=3).collect()
        }
        assert passed == set(vals), f"false negative at m_bits={m_bits}"


def test_false_positive_rate_is_bounded(spark):
    """At m/n = 40 bits/key and k=4 the textbook FP rate is ~1e-4; assert a
    generous ceiling so the test pins the mechanism, not the constant."""
    inserted = _keys(spark, [f"in-{i}" for i in range(400)])
    probes = _keys(spark, [f"out-{i}" for i in range(4000)])
    bm = bloom.bloom_build(inserted, "k", m_bits=1 << 14, k=4)
    n_fp = bloom.bloom_prefilter(probes, "k", bm, m_bits=1 << 14, k=4).count()
    assert n_fp <= 40, f"{n_fp}/4000 false positives — hashing is broken"


def test_small_bitmap_still_superset_not_equal(spark):
    """A deliberately tiny bitmap yields false positives (prefilter strictly
    larger than truth) but never loses a true member — the asymmetry that
    lets callers re-verify instead of trust."""
    inserted = _keys(spark, [f"in-{i}" for i in range(300)])
    probes = _keys(spark, [f"in-{i}" for i in range(300)] + [f"out-{i}" for i in range(300)])
    bm = bloom.bloom_build(inserted, "k", m_bits=256, k=2)
    passed = {r["k"] for r in bloom.bloom_prefilter(probes, "k", bm, m_bits=256, k=2).collect()}
    assert {f"in-{i}" for i in range(300)} <= passed
    assert len(passed) > 300  # collisions guaranteed at 256 bits / 300 keys


def test_build_rejects_unaligned_bits(spark):
    with pytest.raises(ValueError):
        bloom.bloom_build(_keys(spark, ["a"]), "k", m_bits=100)


def test_decontaminate_bloom_equals_exact(spark):
    """The driver query's whole claim: prefilter + exact re-verify ≡ the
    broadcast-exact plan, row for row."""
    exact = pipeline.decontaminate(spark, SF_SMALL).collect()
    via_bloom = pipeline.decontaminate_bloom(spark, SF_SMALL).collect()
    assert via_bloom == exact and len(exact) > 0


def test_prefilter_plan_is_mapside(spark):
    """All k membership joins must be broadcast hash joins (no fact-side
    shuffle), and the bitmap build must partial-aggregate map-side."""
    keys = _keys(spark, [f"key-{i}" for i in range(50)])
    probes = _keys(spark, [f"p-{i}" for i in range(50)])
    bm = bloom.bloom_build(keys, "k", m_bits=1 << 12, k=4)
    plan = (
        bloom.bloom_prefilter(probes, "k", bm, m_bits=1 << 12, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 4, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
