"""operators.snapshots: diff statuses, reconciliation, fingerprint-only join."""

from __future__ import annotations

import pytest

from hybrid_vector_search_spark.operators.snapshots import (
    snapshot_diff,
    snapshot_diff_counts,
)


def _snaps(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 modified, 3 removed, 5 added
        [(1, "a"), (2, "B!"), (4, "d"), (5, "e")],
        "doc_id long, text string",
    )
    return old, new


def test_statuses(spark):
    old, new = _snaps(spark)
    got = {
        r["key"]: r["status"]
        for r in snapshot_diff(old, new, "doc_id", "text").collect()
    }
    assert got == {2: "modified", 3: "removed", 5: "added"}


def test_unchanged_reconciles_to_key_union(spark):
    old, new = _snaps(spark)
    counts = {
        r["status"]: r["n"]
        for r in snapshot_diff_counts(old, new, "doc_id", "text").collect()
    }
    assert counts == {"unchanged": 2, "modified": 1, "removed": 1, "added": 1}
    assert sum(counts.values()) == 5  # |old ∪ new| keys


def test_join_carries_fingerprints_not_text(spark):
    """The shuffle input must be (key, md5) — the content column is dropped
    before the join, so a 100 TB text column never crosses the exchange."""
    old, new = _snaps(spark)
    plan = (
        snapshot_diff(old, new, "doc_id", "text")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the full-outer join node must see only key + fingerprint attributes
    join_part = plan[plan.index("Join FullOuter") :]
    first_project = join_part.index("Project")
    assert "text" not in join_part[:first_project] or "md5(text" in plan


def test_duplicate_free_requirement_is_callers(spark):
    """Keys are assumed unique per snapshot (a snapshot IS keyed); the diff
    itself never multiplies rows for unique-keyed inputs."""
    old, new = _snaps(spark)
    assert snapshot_diff(old, new, "doc_id", "text", include_unchanged=True).count() == 5


def test_weighted_sample_k_properties(spark):
    """A-ES weighted sampling: deterministic under repartitioning, exact-k,
    length-biased, loud on non-positive weights."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators.sampling import weighted_sample_k

    rows = [(i, 1.0 if i < 900 else 1000.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = sorted(r["id"] for r in weighted_sample_k(df, "id", "w", 50).collect())
    b = sorted(
        r["id"]
        for r in weighted_sample_k(df.repartition(13), "id", "w", 50).collect()
    )
    assert a == b and len(a) == 50
    # the 100 heavy rows (1000x weight) must dominate the draw
    heavy = sum(1 for i in a if i >= 900)
    assert heavy > 40, heavy

    # k > n keeps everything
    assert weighted_sample_k(df, "id", "w", 5000).count() == 1000

    bad = spark.createDataFrame([(1, 0.0)], "id long, w double")
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_sample_k(bad, "id", "w", 1).collect()


def test_scd2_history_semantics(spark):
    """Type-2 history rows per diff status: unchanged=1 open, modified=1
    closed + 1 open, removed=1 closed, added=1 open; exactly one current
    row per key present in the new snapshot, none for removed keys."""
    from hybrid_vector_search_spark.operators.snapshots import scd2_merge

    old, new = _snaps(spark)
    hist = scd2_merge(old, new, "doc_id", "text").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["key"], []).append(r)
    assert {k: len(v) for k, v in by_key.items()} == {1: 1, 2: 2, 3: 1, 4: 1, 5: 1}
    # current rows: keys 1,2,4,5 (present in new); removed key 3 has none
    current = {r["key"] for r in hist if r["is_current"]}
    assert current == {1, 2, 4, 5}
    assert all(r["valid_to"] is None for r in hist if r["is_current"])
    assert all(r["valid_to"] == 2 for r in hist if not r["is_current"])
    # modified key 2: closed v1 row + open v2 row with different fingerprints
    k2 = sorted(by_key[2], key=lambda r: r["valid_from"])
    assert [r["valid_from"] for r in k2] == [1, 2]
    assert k2[0]["fingerprint"] != k2[1]["fingerprint"]
