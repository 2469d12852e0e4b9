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


def _hist_key(r):
    return (r["key"], r["fingerprint"], r["valid_from"], r["valid_to"], r["is_current"])


def test_scd2_apply_two_batches_equals_snapshot_merge(spark):
    """Incremental maintenance: applying batch 1 = snapshot 1 as upserts,
    batch 2 = the snapshot diff (modified/added upserts + removed deletes)
    must yield exactly the two-snapshot scd2_merge history."""
    from hybrid_vector_search_spark.operators.snapshots import scd2_apply, scd2_merge

    old, new = _snaps(spark)
    batch1 = old.selectExpr("doc_id", "text", "'upsert' AS op")
    batch2 = spark.createDataFrame(
        [(2, "B!", "upsert"), (3, None, "delete"), (5, "e", "upsert")],
        "doc_id long, text string, op string",
    )
    h1 = scd2_apply(None, batch1, 1, "doc_id", "text")
    h2 = scd2_apply(h1, batch2, 2, "doc_id", "text")
    want = sorted(_hist_key(r) for r in scd2_merge(old, new, "doc_id", "text").collect())
    got = sorted(_hist_key(r) for r in h2.collect())
    assert got == want


def test_scd2_apply_is_idempotent_per_batch(spark):
    """Re-applying the SAME batch (at-least-once redelivery) must change
    nothing: fingerprints are already current, deletes already closed."""
    from hybrid_vector_search_spark.operators.snapshots import scd2_apply

    old, _ = _snaps(spark)
    batch1 = old.selectExpr("doc_id", "text", "'upsert' AS op")
    batch2 = spark.createDataFrame(
        [(2, "B!", "upsert"), (3, None, "delete"), (5, "e", "upsert")],
        "doc_id long, text string, op string",
    )
    h1 = scd2_apply(None, batch1, 1, "doc_id", "text")
    h2 = scd2_apply(h1, batch2, 2, "doc_id", "text")
    h2 = h2.localCheckpoint()
    replayed = scd2_apply(h2, batch2, 2, "doc_id", "text")
    assert sorted(map(_hist_key, replayed.collect())) == sorted(
        map(_hist_key, h2.collect())
    )


def test_stream_scd2_apply_matches_batch_build(spark, tmp_path):
    """The streaming foreachBatch wrapper over two staged CDC files must
    build the same history as the two-snapshot batch scd2_merge, and a
    restart with the same checkpoint must process only NEW files."""
    import os
    import shutil

    from hybrid_vector_search_spark.operators.snapshots import scd2_merge
    from hybrid_vector_search_spark.streaming.ingest import stream_scd2_apply

    old, new = _snaps(spark)
    src = tmp_path / "cdc"
    src.mkdir()

    def stage(df, name, mtime):
        d = tmp_path / f"_stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(d))
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dest = src / f"{name}.parquet"
        shutil.copy(d / part, dest)
        os.utime(dest, (mtime, mtime))

    batch1 = old.selectExpr("doc_id", "text", "'upsert' AS op")
    batch2 = spark.createDataFrame(
        [(2, "B!", "upsert"), (3, None, "delete"), (5, "e", "upsert")],
        "doc_id long, text string, op string",
    )
    stage(batch1, "cdc_001", 1_000_000_000)
    stage(batch2, "cdc_002", 1_000_000_100)
    hist_path = str(tmp_path / "history")
    ckpt = str(tmp_path / "ckpt")
    q = stream_scd2_apply(
        spark, str(src), hist_path, ckpt, key_col="doc_id", content_col="text"
    )
    q.awaitTermination()
    got = sorted(_hist_key(r) for r in spark.read.parquet(hist_path).collect())
    want = sorted(_hist_key(r) for r in scd2_merge(old, new, "doc_id", "text").collect())
    assert got == want

    # restart: a third CDC file closes key 1 at version 3; keys already
    # processed are not re-applied (checkpoint), versions continue
    batch3 = spark.createDataFrame(
        [(1, None, "delete")], "doc_id long, text string, op string"
    )
    stage(batch3, "cdc_003", 1_000_000_200)
    q = stream_scd2_apply(
        spark, str(src), hist_path, ckpt, key_col="doc_id", content_col="text"
    )
    q.awaitTermination()
    hist = spark.read.parquet(hist_path).collect()
    k1 = sorted((r["valid_from"], r["valid_to"], r["is_current"])
                for r in hist if r["key"] == 1)
    assert k1 == [(1, 3, False)]
    assert {r["key"] for r in hist if r["is_current"]} == {2, 4, 5}


def test_scd2_apply_null_content_row_stays_visible(spark):
    """A current row whose content was NULL at insert has a NULL md5
    fingerprint; presence must come from an explicit marker, not
    fingerprint nullability — a later upsert must CLOSE that row (one
    is_current row per key, ever), and a delete must be able to close it."""
    from hybrid_vector_search_spark.operators.snapshots import scd2_apply

    b1 = spark.createDataFrame(
        [(1, None, "upsert"), (2, None, "upsert")],
        "doc_id long, text string, op string",
    )
    h1 = scd2_apply(None, b1, 1, "doc_id", "text")
    b2 = spark.createDataFrame(
        [(1, "now-real", "upsert"), (2, None, "delete")],
        "doc_id long, text string, op string",
    )
    h2 = scd2_apply(h1, b2, 2, "doc_id", "text").collect()
    cur = [r for r in h2 if r["is_current"]]
    assert len(cur) == 1 and cur[0]["key"] == 1 and cur[0]["valid_from"] == 2
    closed = sorted(
        (r["key"], r["valid_from"], r["valid_to"]) for r in h2 if not r["is_current"]
    )
    assert closed == [(1, 1, 2), (2, 1, 2)]


def test_scd2_apply_null_content_upsert_is_noop_when_unchanged(spark):
    """NULL content re-upserted over NULL content: null-safe fingerprint
    compare says unchanged → kept as-is, no close/reopen churn."""
    from hybrid_vector_search_spark.operators.snapshots import scd2_apply

    b = spark.createDataFrame([(1, None, "upsert")], "doc_id long, text string, op string")
    h1 = scd2_apply(None, b, 1, "doc_id", "text")
    h2 = scd2_apply(h1, b, 2, "doc_id", "text").collect()
    assert len(h2) == 1 and h2[0]["is_current"] and h2[0]["valid_from"] == 1
