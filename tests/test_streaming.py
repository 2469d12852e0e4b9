"""Batch/stream parity: the streaming variants drained with availableNow must
reproduce the batch aggregates over the same input (Spark's unified-semantics
promise, pinned)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, spark):
    """File-source streams read directories; stage a user-subset of
    events.parquet (per-user semantics are unaffected by dropping users, and
    the stateful sessionize test's per-group Python overhead scales with
    user count)."""
    d = tmp_path_factory.mktemp("events_stream")
    (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .where("user_id % 7 = 0")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(d / "events.parquet"))
    )
    return str(d / "events.parquet")


def _drain(stream_df, query_name: str, output_mode: str = "complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_embed_ingest_exactly_once(spark, tmp_path):
    """Streamed embeddings equal the batch embedder's output, and a restart
    with the same checkpoint ingests nothing new (exactly-once; the
    reference's --skip-existing as checkpoint state)."""
    import numpy as np
    import shutil as sh

    from hybrid_vector_search_spark.operators.embed import query_vector
    from hybrid_vector_search_spark.streaming.ingest import load_ingested, stream_embed_ingest

    src = tmp_path / "src"
    src.mkdir()
    sh.copy(f"{SF_SMALL}/documents.parquet", src / "documents.parquet")
    target, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    q = stream_embed_ingest(spark, str(src), target, cp)
    q.awaitTermination(120)
    out = load_ingested(spark, target)
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert out.count() == n_docs
    row = out.where("doc_id = 3").head()
    assert np.allclose(row.embedding, query_vector(row.text), atol=0)

    # restart: same checkpoint, no new files -> nothing re-ingested
    q2 = stream_embed_ingest(spark, str(src), target, cp)
    q2.awaitTermination(120)
    assert load_ingested(spark, target).count() == n_docs


def test_stream_hourly_rollup_matches_batch(spark, events_dir):
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.events import hourly_rollup, stream_hourly_rollup

    name = f"rollup_{uuid.uuid4().hex[:8]}"
    stream = stream_hourly_rollup(spark, events_dir)
    _drain(stream, name)
    got = (
        spark.table(name)
        .select("hour", "event_type", "n_events", "sum_value")
        .orderBy("hour", "event_type")
        .collect()
    )
    want = (
        hourly_rollup(load_table(spark, SF_SMALL, "events").where("user_id % 7 = 0"))
        .select("hour", "event_type", "n_events", "sum_value")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_stream_sessionize_closed_sessions_match_batch(spark, events_dir):
    """availableNow drains all events in one batch, then the watermark pass
    fires event-time timeouts: rows with open=false must match the batch
    sessionization's non-final sessions exactly; rows with open=true are
    watermark-evicted final sessions, each matching a batch final session.
    The EventTimeTimeout design is what makes the drain terminate at all —
    processing-time timers keep an availableNow query alive forever."""
    import uuid as _uuid

    from pyspark.sql import Window
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.events import sessionize, stream_sessionize

    name = f"sess_{_uuid.uuid4().hex[:8]}"
    stream = stream_sessionize(spark, events_dir)
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow sessionize drain must terminate"
    got = (
        spark.table(name)
        .where("not open")
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
        .collect()
    )

    batch = sessionize(load_table(spark, SF_SMALL, "events").where("user_id % 7 = 0"))
    w = Window.partitionBy("user_id")
    closed = (
        batch.withColumn("max_seq", F.max("session_seq").over(w))
        .where(F.col("session_seq") < F.col("max_seq"))
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in closed]
    assert len(got) > 0

    # watermark-evicted rows: each is a FINAL batch session, exact match
    flushed = {
        tuple(r)
        for r in spark.table(name)
        .where("open")
        .select("user_id", "session_start", "n_events")
        .collect()
    }
    finals = {
        tuple(r)
        for r in batch.withColumn("max_seq", F.max("session_seq").over(w))
        .where(F.col("session_seq") == F.col("max_seq"))
        .select("user_id", "session_start", "n_events")
        .collect()
    }
    assert flushed <= finals


def _drain_append(stream_df, query_name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_view_click_join_matches_batch(spark, events_dir):
    """Stream-stream interval join (watermarked both sides) drained with
    availableNow must emit exactly the batch join's pairs."""
    from hybrid_vector_search_spark.streaming import events as ev

    lag = 7 * 24 * 60  # the sparse test subset needs a wide match window
    batch = ev.view_click_join(
        spark.read.parquet(events_dir), max_lag_minutes=lag
    ).collect()
    name = f"vc_{uuid.uuid4().hex[:8]}"
    _drain_append(
        ev.stream_view_click_join(spark, events_dir, max_lag_minutes=lag), name
    )
    streamed = spark.table(name).collect()
    key = lambda r: (r.view_id, r.click_id)
    assert sorted(map(key, streamed)) == sorted(map(key, batch))
    assert len(batch) > 0


def test_stream_dedup_within_watermark(spark, events_dir, tmp_path):
    """An at-least-once feed (every file delivered twice) deduped on
    event_id must yield each event exactly once — the batch distinct."""
    from hybrid_vector_search_spark.streaming import events as ev

    dup_dir = str(tmp_path / "dup_events")
    base = spark.read.parquet(events_dir)
    base.coalesce(1).write.mode("overwrite").parquet(dup_dir)
    base.coalesce(1).write.mode("append").parquet(dup_dir)
    assert spark.read.parquet(dup_dir).count() == 2 * base.count()

    name = f"dd_{uuid.uuid4().hex[:8]}"
    _drain_append(ev.stream_dedup_events(spark, dup_dir), name)
    streamed = spark.table(name)
    assert streamed.count() == base.count()
    assert sorted(r.event_id for r in streamed.select("event_id").collect()) == sorted(
        r.event_id for r in base.select("event_id").collect()
    )


def test_stream_merge_into_upserts_by_key(spark, tmp_path):
    """foreachBatch MERGE: second delivery carrying updates + new rows must
    upsert (no duplicates, updates win, inserts appear), and redelivered
    rows must not duplicate."""
    from hybrid_vector_search_spark.streaming.ingest import stream_merge_into

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit("v1").alias("v")
    )
    base.coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_merge_into(spark, src, tgt, ckpt, ["k"])
    q.awaitTermination(120)
    assert spark.read.parquet(tgt).count() == 100

    # second file: update keys 0-9, insert keys 100-104, redeliver 50-59
    upd = spark.range(10).select(F.col("id").alias("k"), F.lit("v2").alias("v"))
    ins = spark.range(100, 105).select(F.col("id").alias("k"), F.lit("v1").alias("v"))
    red = spark.range(50, 60).select(F.col("id").alias("k"), F.lit("v1").alias("v"))
    upd.unionByName(ins).unionByName(red).coalesce(1).write.mode("append").parquet(src)
    q = stream_merge_into(spark, src, tgt, ckpt, ["k"])
    q.awaitTermination(120)

    out = spark.read.parquet(tgt)
    assert out.count() == 105
    assert out.where("v = 'v2'").count() == 10
    assert out.where("k < 10 AND v = 'v1'").count() == 0
    assert out.groupBy("k").count().where("count > 1").count() == 0


def test_stream_session_window_emits_closed_sessions(spark, events_dir):
    """Native session_window over a watermarked stream: availableNow append
    emits EXACTLY the batch sessions whose end precedes the final watermark
    (max event ts - delay); later sessions stay in state. This is the
    determinism contract that makes the one-groupBy sessionization safe to
    run incrementally."""
    import datetime

    from pyspark.sql import functions as F

    def agg(df):
        return df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        ).agg(F.count("*").alias("n"))

    from hybrid_vector_search_spark.sources.loaders import _normalize_ts
    from hybrid_vector_search_spark.streaming.events import _event_stream

    batch_src = _normalize_ts(spark.read.parquet(events_dir))

    stream = _event_stream(spark, events_dir).withWatermark("ts", "2 hours")
    name = f"sw_{uuid.uuid4().hex[:8]}"
    _drain_append(agg(stream), name)
    streamed = sorted(
        (r.user_id, r.sw.start, r.n) for r in spark.table(name).collect()
    )

    wm = batch_src.agg(F.max("ts")).first()[0] - datetime.timedelta(hours=2)
    closed = agg(batch_src).where(F.col("sw.end") <= F.lit(wm))
    expected = sorted((r.user_id, r.sw.start, r.n) for r in closed.collect())
    assert streamed == expected
    assert len(streamed) > 0


def test_stream_merge_into_recovers_from_mid_swap_crash(spark, tmp_path):
    """Crash simulation: a process dying between 'rename target aside' and
    'move staging in' leaves only the ._old copy on disk. The next batch must
    RESTORE it before merging — otherwise the table silently rebuilds from
    the new batch alone and the old rows are lost."""
    import os

    from hybrid_vector_search_spark.streaming.ingest import stream_merge_into

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    base = spark.range(100).select(F.col("id").alias("k"), F.lit("v1").alias("v"))
    base.coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_merge_into(spark, src, tgt, ckpt, ["k"])
    q.awaitTermination(120)
    assert spark.read.parquet(tgt).count() == 100

    # simulate the crash window: target renamed aside, staging never moved in
    os.replace(tgt, f"{tgt}._old")
    assert not os.path.exists(tgt)

    ins = spark.range(100, 105).select(F.col("id").alias("k"), F.lit("v1").alias("v"))
    ins.coalesce(1).write.mode("append").parquet(src)
    q = stream_merge_into(spark, src, tgt, ckpt, ["k"])
    q.awaitTermination(120)

    out = spark.read.parquet(tgt)
    # pre-crash rows restored AND the new batch merged — no silent data loss
    assert out.count() == 105
    assert out.where("k < 100").count() == 100
    assert not os.path.exists(f"{tgt}._old")


def test_stream_sliding_rollup_matches_batch(spark, events_dir):
    """Overlapping (sliding) windows drained availableNow equal the batch
    sliding_rollup on the same subset — window assignment and DECIMAL sums
    agree across the incremental and one-shot plans."""
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.events import sliding_rollup, stream_sliding_rollup

    name = f"sliding_{uuid.uuid4().hex[:8]}"
    _drain(stream_sliding_rollup(spark, events_dir), name)
    got = (
        spark.table(name)
        .select("w_start", "event_type", "n_events", "sum_value")
        .orderBy("w_start", "event_type")
        .collect()
    )
    want = (
        sliding_rollup(load_table(spark, SF_SMALL, "events").where("user_id % 7 = 0"))
        .select("w_start", "event_type", "n_events", "sum_value")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_tws_user_totals_match_batch(spark, events_dir):
    """Spark 4 transformWithStateInPandas: per-user running totals drained
    availableNow must equal the batch groupBy's DECIMAL-exact aggregate —
    the new-generation stateful API answers to the same semantics as the
    rest of the engine. Requires the RocksDB state store provider AND
    protobuf (TWS's driver-worker wire format — absent in this container,
    so the lane auto-upgrades when it appears, same policy as the
    Pillow/av codec lane)."""
    pytest.importorskip(
        "google.protobuf", reason="transformWithState driver worker needs protobuf"
    )
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.streaming.events import stream_user_totals_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        name = f"tws_{uuid.uuid4().hex[:8]}"
        _drain(stream_user_totals_tws(spark, events_dir), name, output_mode="update")
        # Update mode: keep each user's LAST emitted row (the final totals)
        got = {
            r["user_id"]: (r["n_events"], round(r["total_value"], 4))
            for r in spark.table(name).collect()
        }
        want = {
            r["user_id"]: (r["n"], round(r["total"], 4))
            for r in (
                load_table(spark, SF_SMALL, "events")
                .where("user_id % 7 = 0")
                .groupBy("user_id")
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
                )
                .collect()
            )
        }
        assert got == want and len(got) > 0
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
