"""Streaming count-min parity: folding per-micro-batch partials into the
persisted state must reproduce the one-shot batch sketch exactly (the cell
merge is a sum, so the algebra guarantees it — these pin the plumbing)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _topk(df):
    return [(r.value, r.n_est) for r in df.collect()]


def test_stream_sketch_matches_batch_over_multiple_batches(spark, tmp_path):
    from hybrid_vector_search_spark.operators.sketch import count_min_heavy_hitters
    from hybrid_vector_search_spark.streaming.sketch import (
        heavy_hitters_from_state,
        stream_heavy_hitters,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    # stage as TWO files and cap the trigger at one file per batch, so the
    # parity must survive a genuinely incremental two-batch fold
    src = str(tmp_path / "src")
    events.where("event_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    events.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    q = stream_heavy_hitters(
        spark, src, "user_id", state, ckpt, k=20, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    got = _topk(heavy_hitters_from_state(spark, state, 20))
    want = _topk(count_min_heavy_hitters(spark.read.parquet(src), "user_id", 20))
    assert got == want
    assert len(got) > 0  # sf0.001 has fewer than k distinct users


def test_stream_sketch_restart_folds_only_new_files(spark, tmp_path):
    """Restart with the same checkpoint after new data arrives: only the new
    file folds in (no double counting), and the state tracks the union."""
    from hybrid_vector_search_spark.operators.sketch import count_min_heavy_hitters
    from hybrid_vector_search_spark.streaming.sketch import (
        heavy_hitters_from_state,
        stream_heavy_hitters,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "src")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    first = events.where("event_id % 3 = 0")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_heavy_hitters(spark, src, "user_id", state, ckpt, k=20)
    q.awaitTermination(120)
    assert _topk(heavy_hitters_from_state(spark, state, 20)) == _topk(
        count_min_heavy_hitters(first, "user_id", 20)
    )

    events.where("event_id % 3 <> 0").coalesce(1).write.mode("append").parquet(src)
    q = stream_heavy_hitters(spark, src, "user_id", state, ckpt, k=20)
    q.awaitTermination(120)
    assert _topk(heavy_hitters_from_state(spark, state, 20)) == _topk(
        count_min_heavy_hitters(spark.read.parquet(src), "user_id", 20)
    )


def test_stream_sketch_candidate_cap_keeps_heavy_hitters(spark, tmp_path):
    """A tight max_candidates must still surface the true top values: the
    trim keeps the strongest by estimate, and estimates only over-count."""
    from hybrid_vector_search_spark.operators.sketch import exact_heavy_hitters
    from hybrid_vector_search_spark.streaming.sketch import (
        heavy_hitters_from_state,
        stream_heavy_hitters,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    q = stream_heavy_hitters(
        spark, src, "user_id", state, ckpt, k=5, max_candidates=8
    )
    q.awaitTermination(120)
    got_values = {v for v, _ in _topk(heavy_hitters_from_state(spark, state, 5))}
    exact_top3 = [r.value for r in exact_heavy_hitters(events, "user_id", 3).collect()]
    # the unambiguous head of the exact ranking must survive the cap
    assert {str(v) for v in exact_top3} <= got_values


def test_stream_sketch_rejects_foreign_checkpoint(spark, tmp_path):
    """State built under one checkpoint must refuse to fold under another:
    epoch ids restart at 0 with a fresh checkpoint, so the old bare-epoch
    guard would silently SKIP every batch until the new counter passed the
    stored one — the guard now keys on checkpoint identity and fails loudly."""
    import pytest

    from hybrid_vector_search_spark.streaming.sketch import stream_heavy_hitters

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    state = str(tmp_path / "state")

    q = stream_heavy_hitters(spark, src, "user_id", state, str(tmp_path / "ckpt1"))
    q.awaitTermination(120)

    events.limit(10).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_heavy_hitters(spark, src, "user_id", state, str(tmp_path / "ckpt2"))
    with pytest.raises(Exception, match="checkpoint"):
        q2.awaitTermination(120)
        if q2.exception() is not None:
            raise q2.exception()


def test_manifest_commit_mode_matches_batch(spark, tmp_path):
    """commit_mode='manifest' (object-store-safe pointer commit): multi-batch
    fold reproduces the one-shot batch sketch, the pointer names the live
    immutable version, and at most two versions are retained (GC)."""
    import json
    import os

    from hybrid_vector_search_spark.operators.sketch import count_min_heavy_hitters
    from hybrid_vector_search_spark.streaming.sketch import (
        POINTER,
        heavy_hitters_from_state,
        stream_heavy_hitters,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "src")
    events.where("event_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    events.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    q = stream_heavy_hitters(
        spark, src, "user_id", state, ckpt, k=20,
        max_files_per_trigger=1, commit_mode="manifest",
    )
    q.awaitTermination(120)

    got = _topk(heavy_hitters_from_state(spark, state, 20, commit_mode="manifest"))
    want = _topk(count_min_heavy_hitters(spark.read.parquet(src), "user_id", 20))
    assert got == want and len(got) > 0

    with open(os.path.join(state, POINTER)) as fh:
        ptr = json.load(fh)
    versions = sorted(n for n in os.listdir(state) if n.startswith("v"))
    assert ptr["version"] in versions
    assert len(versions) <= 2  # live + one predecessor, older GC'd
    assert ptr["version"] == versions[-1]


def test_manifest_crash_before_pointer_write_is_safe(spark, tmp_path):
    """A partially-written NEW version dir with the pointer still on the old
    version (crash between version write and pointer commit) must leave
    readers on the committed state, and a re-fold of the same data must
    overwrite the garbage and commit cleanly."""
    import json
    import os

    from hybrid_vector_search_spark.operators.sketch import count_min_heavy_hitters
    from hybrid_vector_search_spark.streaming.sketch import (
        POINTER,
        heavy_hitters_from_state,
        stream_heavy_hitters,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "src")
    first = events.where("event_id % 3 = 0")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    q = stream_heavy_hitters(
        spark, src, "user_id", state, ckpt, k=20, commit_mode="manifest"
    )
    q.awaitTermination(120)
    committed = _topk(heavy_hitters_from_state(spark, state, 20, commit_mode="manifest"))

    # simulate the crash: garbage half-version newer than the pointer
    garbage = os.path.join(state, "v999999999999")
    os.makedirs(os.path.join(garbage, "cells"), exist_ok=True)
    with open(os.path.join(garbage, "_epoch"), "w") as fh:
        fh.write("{}")
    assert (
        _topk(heavy_hitters_from_state(spark, state, 20, commit_mode="manifest"))
        == committed
    ), "reader must resolve the pointer, never the newest directory"

    # new data arrives; the next fold commits past the garbage and GC's it
    events.where("event_id % 3 <> 0").coalesce(1).write.mode("append").parquet(src)
    q = stream_heavy_hitters(
        spark, src, "user_id", state, ckpt, k=20, commit_mode="manifest"
    )
    q.awaitTermination(120)
    got = _topk(heavy_hitters_from_state(spark, state, 20, commit_mode="manifest"))
    want = _topk(count_min_heavy_hitters(spark.read.parquet(src), "user_id", 20))
    assert got == want
    assert not os.path.exists(garbage)


def _daily(df):
    return [(str(r.day), r.users_est) for r in df.collect()]


def test_stream_daily_distinct_matches_batch(spark, tmp_path):
    """Two-batch incremental fold reproduces the one-shot batch daily
    sketches exactly (HLL union is associative+commutative)."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.streaming.sketch import (
        daily_distinct_from_state,
        stream_daily_distinct,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "src")
    events.where("event_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    events.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    q = stream_daily_distinct(
        spark, src, "ts", "user_id", state, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    got = _daily(daily_distinct_from_state(spark, state))
    want = [
        (str(r.day), r.users_est)
        for r in spark.read.parquet(src)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("users_est"))
        .orderBy("day")
        .collect()
    ]
    assert got == want
    assert len(got) > 1


def test_stream_daily_distinct_late_events_fold_into_old_days(spark, tmp_path):
    """A second run delivering ONLY old-day (late) events updates those
    days' sketches — union is order-free, no watermark drop."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.streaming.sketch import (
        daily_distinct_from_state,
        stream_daily_distinct,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    first_day = events.select(F.min(F.to_date("ts"))).first()[0]
    on_time = events.where(F.to_date("ts") > F.lit(first_day))
    late = events.where(F.to_date("ts") == F.lit(first_day))

    src = str(tmp_path / "src")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    on_time.coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_daily_distinct(spark, src, "ts", "user_id", state, ckpt)
    q.awaitTermination(120)
    assert str(first_day) not in dict(_daily(daily_distinct_from_state(spark, state)))

    late.coalesce(1).write.mode("append").parquet(src)
    q = stream_daily_distinct(spark, src, "ts", "user_id", state, ckpt)
    q.awaitTermination(120)

    got = dict(_daily(daily_distinct_from_state(spark, state)))
    want = {
        str(r.day): r.users_est
        for r in events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("users_est"))
        .collect()
    }
    assert got == want


def test_stream_daily_distinct_windowed_serve_manifest_mode(spark, tmp_path):
    """Manifest commit mode + trailing-window serve: estimates from the
    maintained state equal the batch window answer."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.streaming.sketch import (
        daily_distinct_from_state,
        stream_daily_distinct,
    )

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    q = stream_daily_distinct(
        spark, src, "ts", "user_id", state, ckpt, commit_mode="manifest"
    )
    q.awaitTermination(120)

    got = dict(
        _daily(
            daily_distinct_from_state(
                spark, state, window_days=7, commit_mode="manifest"
            )
        )
    )
    daily = events.groupBy(F.to_date("ts").alias("pday")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    spine = daily.select(F.col("pday").alias("d")).distinct()
    want = {
        str(r.d): r.est
        for r in daily.join(
            F.broadcast(spine),
            (F.col("pday") <= F.col("d"))
            & (F.col("pday") >= F.date_sub(F.col("d"), 6)),
        )
        .groupBy("d")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk, true))").alias("est"))
        .collect()
    }
    assert got == want


def test_stream_ivm_matches_batch_with_retractions(spark, tmp_path):
    """Multi-batch streaming view maintenance (inserts + 'D' retractions)
    equals the batch IVM chain AND a from-scratch recompute."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.streaming.sketch import (
        ivm_view_from_state,
        stream_ivm,
    )

    orders = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    ins = orders.withColumn("_op", F.lit("I"))
    dels = (
        orders.where("o_orderkey % 7 = 0")
        .withColumn("_op", F.lit("D"))
    )
    src = str(tmp_path / "src")
    ins.where("o_orderkey % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    ins.where("o_orderkey % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    dels.coalesce(1).write.mode("append").parquet(src)

    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    q = stream_ivm(
        spark, src, ["o_orderpriority"], "o_totalprice", state, ckpt,
        op_col="_op", max_files_per_trigger=1, commit_mode="manifest",
    )
    q.awaitTermination(180)

    got = {
        r.o_orderpriority: (r.total, r.n_rows, r.avg_value)
        for r in ivm_view_from_state(spark, state, commit_mode="manifest").collect()
    }
    live = orders.where("o_orderkey % 7 <> 0")
    want = {
        r.o_orderpriority: (
            float(r.s),
            r.n,
            round(float(r.s) / r.n, 6),
        )
        for r in live.groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == want


def test_stream_ivm_restart_folds_only_new_files(spark, tmp_path):
    """Same checkpoint, new data: only the new file folds in (epoch guard +
    checkpoint ledger), and the view tracks the running union."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.streaming.sketch import (
        ivm_view_from_state,
        stream_ivm,
    )

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    src = str(tmp_path / "src")
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    first = orders.where("o_orderkey % 3 = 0")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_ivm(spark, src, ["o_orderpriority"], "o_totalprice", state, ckpt)
    q.awaitTermination(120)

    def snap(df):
        return {r.o_orderpriority: (r.total, r.n_rows) for r in df.collect()}

    def want(live):
        return {
            r.o_orderpriority: (float(r.s), r.n)
            for r in live.groupBy("o_orderpriority")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        }

    assert snap(ivm_view_from_state(spark, state)) == want(first)

    orders.where("o_orderkey % 3 = 1").coalesce(1).write.mode("append").parquet(src)
    q = stream_ivm(spark, src, ["o_orderpriority"], "o_totalprice", state, ckpt)
    q.awaitTermination(120)
    assert snap(ivm_view_from_state(spark, state)) == want(
        orders.where("o_orderkey % 3 <> 2")
    )


def test_stream_markov_equals_batch_recount(spark, tmp_path):
    """Multi-batch maintained transition counts ≡ one-shot batch recount:
    the per-user frontier state must supply the batch-boundary transitions
    a naive per-batch recount loses (planted so every boundary crosses)."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.streaming.sketch import (
        markov_from_state,
        stream_markov,
    )

    rows = []
    eid = 0
    for u in range(6):
        for k, ty in enumerate(["view", "click", "view", "purchase", "click", "view"]):
            rows.append((u, f"2024-01-01 00:{k:02d}:00", eid, ty))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long, event_type string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_id", "event_type")
    src = str(tmp_path / "src")
    # three time-ordered files: every user's journey SPANS all three files,
    # so 2 of each user's 5 transitions exist only as batch boundaries
    df.where("event_id % 6 < 2").coalesce(1).write.mode("overwrite").parquet(src)
    df.where("event_id % 6 >= 2 and event_id % 6 < 4").coalesce(1).write.mode("append").parquet(src)
    df.where("event_id % 6 >= 4").coalesce(1).write.mode("append").parquet(src)

    q = stream_markov(
        spark, src, state_dir=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in markov_from_state(spark, str(tmp_path / "state")).collect()
    }
    # batch recount over the full relation
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in df.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) == 6 * 5  # every transition counted exactly once


def test_stream_markov_equals_declared_batch_query(spark, tmp_path):
    """The maintained matrix must equal relational.events_markov_transitions
    — the DECLARED batch query, not an inline recount — over the real
    sf0.001 events table split into three time-ordered files (the same
    batch/stream twin pinning every other streaming operator has)."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.plans.relational import (
        events_markov_transitions,
    )
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.sketch import (
        markov_from_state,
        stream_markov,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    cuts = ev.agg(
        F.percentile_approx("ts", F.array(F.lit(0.33), F.lit(0.66)), 10_000)
        .alias("c")
    ).collect()[0]["c"]
    src = str(tmp_path / "src")
    ev.where(F.col("ts") <= cuts[0]).coalesce(1).write.mode("overwrite").parquet(src)
    ev.where((F.col("ts") > cuts[0]) & (F.col("ts") <= cuts[1])).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("ts") > cuts[1]).coalesce(1).write.mode("append").parquet(src)

    q = stream_markov(
        spark, src, state_dir=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    got = [
        (r["from_type"], r["to_type"], r["n_transitions"], r["prob"])
        for r in markov_from_state(spark, str(tmp_path / "state"))
        .orderBy("from_type", "to_type").collect()
    ]
    want = [
        (r["from_type"], r["to_type"], r["n_transitions"], r["prob"])
        for r in events_markov_transitions(spark, sf_dir)
        .orderBy("from_type", "to_type").collect()
    ]
    assert got == want and len(got) > 0


def test_stream_funnel_equals_declared_batch_query(spark, tmp_path):
    """The maintained funnel frontier must equal relational.events_funnel
    over the real sf0.001 events split into three time-ordered files —
    including the cross-batch journeys (view in one file, qualifying click
    in a later one) a naive per-batch recount would lose."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.plans.relational import events_funnel
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.sketch import (
        funnel_from_state,
        stream_funnel,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    cuts = ev.agg(
        F.percentile_approx("ts", F.array(F.lit(0.33), F.lit(0.66)), 10_000)
        .alias("c")
    ).collect()[0]["c"]
    src = str(tmp_path / "src")
    ev.where(F.col("ts") <= cuts[0]).coalesce(1).write.mode("overwrite").parquet(src)
    ev.where((F.col("ts") > cuts[0]) & (F.col("ts") <= cuts[1])).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("ts") > cuts[1]).coalesce(1).write.mode("append").parquet(src)

    q = stream_funnel(
        spark, src, state_dir=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    got = [
        (r["stage_idx"], r["stage"], r["n_users"])
        for r in funnel_from_state(spark, str(tmp_path / "state")).collect()
    ]
    want = [
        (r["stage_idx"], r["stage"], r["n_users"])
        for r in events_funnel(spark, sf_dir).collect()
    ]
    assert got == want and len(got) == 3


def test_stream_funnel_cross_batch_journey(spark, tmp_path):
    """A journey split across micro-batches (view | click | purchase, each
    within the 1-hour step window) must complete: the frontier carries the
    earlier stages between batches."""
    import datetime as dt

    from hybrid_vector_search_spark.streaming.sketch import (
        funnel_from_state,
        stream_funnel,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows, path, mode):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        ).coalesce(1).write.mode(mode).parquet(path)

    src = str(tmp_path / "src")
    mins = dt.timedelta(minutes=30)
    # user 1 completes across three batches; user 2's click misses the window
    mk([(1, t0, "view"), (2, t0, "view")], src, "overwrite")
    mk([(1, t0 + mins, "click"), (2, t0 + dt.timedelta(hours=2), "click")], src, "append")
    mk([(1, t0 + mins + mins, "purchase")], src, "append")

    q = stream_funnel(
        spark, src, state_dir=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_from_state(spark, str(tmp_path / "state")).collect()
    }
    assert got == {"view": 2, "click": 1, "purchase": 1}


def test_stream_ohlc_equals_declared_batch_query(spark, tmp_path):
    """Maintained candles ≡ relational.events_value_ohlc_hourly over the
    time-ordered three-file split."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.plans.relational import (
        events_value_ohlc_hourly,
    )
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.sketch import (
        ohlc_from_state,
        stream_ohlc,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    cuts = ev.agg(
        F.percentile_approx("ts", F.array(F.lit(0.33), F.lit(0.66)), 10_000)
        .alias("c")
    ).collect()[0]["c"]
    src = str(tmp_path / "src")
    ev.where(F.col("ts") <= cuts[0]).coalesce(1).write.mode("overwrite").parquet(src)
    ev.where((F.col("ts") > cuts[0]) & (F.col("ts") <= cuts[1])).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("ts") > cuts[1]).coalesce(1).write.mode("append").parquet(src)

    q = stream_ohlc(
        spark, src, state_dir=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    cols = ["hour", "open", "high", "low", "close", "n_trades", "volume"]
    got = [tuple(r[c] for c in cols)
           for r in ohlc_from_state(spark, str(tmp_path / "state")).collect()]
    want = [tuple(r[c] for c in cols)
            for r in events_value_ohlc_hourly(spark, sf_dir).collect()]
    assert got == want and len(got) > 0


def test_stream_ohlc_is_batching_order_insensitive(spark, tmp_path):
    """Candles merge by (ts, id) witnesses, so even a NON-time-ordered
    delivery (files split by user hash, not time) folds to the same state
    — the property the frontier-based streams cannot offer."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.plans.relational import (
        events_value_ohlc_hourly,
    )
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.sketch import (
        ohlc_from_state,
        stream_ohlc,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    ev.where(F.col("user_id") % 3 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    ev.where(F.col("user_id") % 3 == 1).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("user_id") % 3 == 2).coalesce(1).write.mode("append").parquet(src)

    q = stream_ohlc(
        spark, src, state_dir=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    cols = ["hour", "open", "high", "low", "close", "n_trades", "volume"]
    got = [tuple(r[c] for c in cols)
           for r in ohlc_from_state(spark, str(tmp_path / "state")).collect()]
    want = [tuple(r[c] for c in cols)
            for r in events_value_ohlc_hourly(spark, sf_dir).collect()]
    assert got == want


def test_stream_histogram_equals_declared_batch_query(spark, tmp_path):
    """The maintained (2-dp value, count) state rebuilt into data-derived
    buckets must equal relational.value_histogram over the real sf0.001
    events split across three micro-batches — exactly, not approximately:
    counts merge by sum and bounds come from the state keys."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.plans.relational import value_histogram
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.sketch import (
        histogram_from_state,
        stream_histogram,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    src = str(tmp_path / "src")
    ev.where(F.col("event_id") % 3 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    ev.where(F.col("event_id") % 3 == 1).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("event_id") % 3 == 2).coalesce(1).write.mode("append").parquet(src)

    q = stream_histogram(
        spark, src, "value", state_dir=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    got = [
        (r["bucket"], r["n"])
        for r in histogram_from_state(spark, str(tmp_path / "state")).collect()
    ]
    want = [
        (r["bucket"], r["n"]) for r in value_histogram(spark, sf_dir).collect()
    ]
    assert got == want and len(got) >= 2


def test_stream_histogram_batching_invariance(spark, tmp_path):
    """One-file delivery and three-file delivery produce identical state
    relations (merge is associative + commutative), hence identical
    histograms."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.sketch import (
        histogram_from_state,
        stream_histogram,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    outs = []
    for tag, nparts in (("one", 1), ("three", 3)):
        src = str(tmp_path / f"src_{tag}")
        if nparts == 1:
            ev.coalesce(1).write.mode("overwrite").parquet(src)
        else:
            for m in range(nparts):
                ev.where(F.col("event_id") % nparts == m).coalesce(1).write.mode(
                    "append" if m else "overwrite"
                ).parquet(src)
        q = stream_histogram(
            spark, src, "value", state_dir=str(tmp_path / f"state_{tag}"),
            checkpoint_path=str(tmp_path / f"ckpt_{tag}"), max_files_per_trigger=1,
        )
        q.awaitTermination(180)
        if q.isActive:
            q.stop()
        outs.append(
            [
                (r["bucket"], r["n"])
                for r in histogram_from_state(
                    spark, str(tmp_path / f"state_{tag}")
                ).collect()
            ]
        )
    assert outs[0] == outs[1]


def test_stream_type_mix_equals_declared_batch_query(spark, tmp_path):
    """The maintained (day, type, n) counts served through the entropy
    ladder must equal relational.event_type_entropy_daily over the real
    sf0.001 events split across three micro-batches — bit-for-bit: the
    sufficient statistics merge exactly and the serve-time expression is
    the batch expression."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.plans.relational import (
        event_type_entropy_daily,
    )
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.sketch import (
        stream_type_mix,
        type_mix_entropy_from_state,
    )

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    src = str(tmp_path / "src")
    for m in range(3):
        ev.where(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "append" if m else "overwrite"
        ).parquet(src)

    q = stream_type_mix(
        spark, src, "ts", "event_type", state_dir=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    got = [
        (r["day"], r["n_events"], r["n_types"], r["entropy_bits"])
        for r in type_mix_entropy_from_state(
            spark, str(tmp_path / "state")
        ).collect()
    ]
    want = [
        (r["day"], r["n_events"], r["n_types"], r["entropy_bits"])
        for r in event_type_entropy_daily(spark, sf_dir).collect()
    ]
    assert got == want and len(got) >= 10
