"""Structured Streaming operators over the events stream.

The reference has NO streaming surface (SURVEY.md §2.10) — its offline
pipeline is restartable batch scripts. A 100 TB engine needs the streaming
variants of its aggregations, so this module provides:

- ``hourly_rollup``          — batch tumbling-window aggregate (driver-checkable
                               against SQL); the semantics shared by both paths
- ``stream_hourly_rollup``   — the same aggregate as an incremental
                               Structured Streaming query with a watermark
- ``sessionize``             — batch gap-based sessionization (lag + running
                               sum of session breaks)
- ``stream_sessionize``      — stateful streaming sessionization via
                               applyInPandasWithState with a session-gap
                               timeout

Batch/stream parity is pinned by tests/test_streaming.py: running the stream
with ``trigger(availableNow=True)`` over the same parquet input must produce
exactly the batch result (this is Spark's unified-semantics promise — the
incremental plan maintains the same aggregation state the batch plan computes
in one shot).

Scale notes: the streaming aggregate is keyed by (window, event_type) — state
size ∝ active windows × types, bounded by the watermark which expires state
older than the allowed lateness. Sessionization state is per user_id with an
event-time timeout eviction (watermark-driven, deterministic); on a real
cluster back it with RocksDB state store
(spark.sql.streaming.stateStore.providerClass).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

# THE canonical per-user journey ordering. Every operator that walks a
# user's event stream in order — sessionize (here), the Markov transition
# matrix, session-path trigrams, first/last-touch attribution
# (plans/relational.py), and the streaming Markov fold
# (streaming/sketch.py) — must sort by exactly this key, or batch and
# stream twins drift apart on ties (events sharing a timestamp).
USER_STREAM_ORDER: tuple[str, str] = ("ts", "event_id")


def user_stream_window(
    user_col: str = "user_id", ts_col: str = "ts", id_col: str = "event_id"
):
    """The shared session-assembly window: partition by user, order by the
    canonical (event time, event id) key. Column names are parameterized
    for call sites that alias (streaming/sketch.stream_markov), but the
    ORDER SEMANTICS are defined once, here."""
    return Window.partitionBy(user_col).orderBy(ts_col, id_col)


DEC = "decimal(18,4)"


# ------------------------------------------------------------- hourly rollup


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + exact value sum."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").start.alias("hour"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


def sliding_rollup(events: DataFrame) -> DataFrame:
    """SLIDING 1-hour window advancing every 15 minutes, per event_type —
    the window family tumbling (hourly_rollup) and session (session_windows)
    don't cover. Each event lands in exactly 4 overlapping windows;
    `F.window(ts, '1 hour', '15 minutes')` replicates it JVM-side (the same
    Expand shape as streaming would maintain incrementally), then one
    groupBy aggregates — the 4× row fan-out carries only (window, type,
    value), never the payload. Sums ride DECIMAL for engine-exactness.

    The DuckDB oracle derives the same 4 epoch-aligned starts per event
    (time_bucket 15 min, minus k·15 min for k in 0..3), pinning Spark's
    window assignment arithmetic cross-engine.
    """
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").start.alias("w_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("w_start", "event_type")
    )


def _event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """Parquet file-source stream of events with the same ts normalization as
    sources.loaders.load_table (TIMESTAMP_NTZ relabelled as UTC TIMESTAMP so
    watermarks/windows and the batch path agree)."""
    from ..sources.loaders import _normalize_ts

    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return _normalize_ts(stream)


def stream_hourly_rollup(
    spark: SparkSession, source_dir: str, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming variant: parquet file source → watermark → windowed agg.

    Returns a streaming DataFrame; callers pick the sink/trigger. With
    ``availableNow`` it drains the directory and stops — the incremental
    equivalent of the batch job (reference embed.py's --skip-existing
    restartability, done properly by the engine).
    """
    stream = _event_stream(spark, source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
    )


def stream_sliding_rollup(
    spark: SparkSession, source_dir: str, *, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of :func:`sliding_rollup` — watermarked overlapping
    windows; state holds only windows newer than (max event time −
    watermark − 1 h), i.e. ≤ ~12 live windows per event_type at any moment
    regardless of stream length."""
    stream = _event_stream(spark, source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").start.alias("w_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


# ------------------------------------------------------------- sessionization


def sessionize(events: DataFrame, *, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds the gap. Pure window functions — one shuffle
    on user_id; the running sum never leaves the per-user partition."""
    w = user_stream_window()
    # Gap at exact microsecond precision — the same break definition
    # _session_state_fn uses (gap_us > threshold), so a gap in (1800, 1801)
    # seconds sessionizes identically batch vs stream.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_break = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    with_session = events.withColumn(
        "session_seq", F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def _session_state_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator for stream_sessionize.

    State = (session_start_us, last_ts_us, n_events, sum_value) with epochs
    as integer microseconds (exact; float seconds would ns-jitter the Arrow
    timestamp conversion). A micro-batch's events are folded in event-time
    order; sessions closed by the gap rule are emitted with ``open=false``.
    The open session stays in state with an EVENT-TIME timeout at
    last_event + gap: when the watermark passes it, the session is flushed
    with ``open=true`` (no later event can extend it — the watermark
    guarantees nothing older arrives). Event-time, not processing-time,
    keeps eviction deterministic (wall clock never decides output) and lets
    an availableNow drain terminate — processing-time timeouts keep the
    engine scheduling timeout-evaluation batches forever.
    """
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    (user_id,) = key

    def _row(start: int, last: int, n: int, sv: float, open_: bool) -> dict:
        return {
            "user_id": user_id,
            "session_start": pd.Timestamp(start, unit="us", tz="UTC"),
            "session_end": pd.Timestamp(last, unit="us", tz="UTC"),
            "n_events": n,
            "sum_value": sv,
            "open": open_,
        }

    if state.hasTimedOut:
        if state.exists:
            start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame([_row(start, last, n, sv, True)])
        return

    rows = pd.concat(list(pdf_iter)).sort_values("ts")
    closed: list[dict] = []
    if state.exists:
        start, last, n, sv = state.get
    else:
        start = last = None  # type: ignore[assignment]
        n, sv = 0, 0.0
    for _, r in rows.iterrows():
        t = int(pd.Timestamp(r["ts"]).value // 1_000)  # ns → µs
        if last is not None and t - last > gap_us:
            closed.append(_row(start, last, n, sv, False))
            start, n, sv = t, 0, 0.0
        if start is None:
            start = t
        last = t
        n += 1
        sv += float(r["value"])
    state.update((int(start), int(last), int(n), float(sv)))
    # flush when the watermark passes last + gap (ms resolution — event-time
    # timeouts are millisecond-granular; the gap rule ITSELF stays µs-exact)
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_MIN * 60 * 1000)
    if closed:
        yield pd.DataFrame(closed)


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double, open boolean"
)


def stream_sessionize(
    spark: SparkSession, source_dir: str, *, watermark: str = "0 seconds"
) -> DataFrame:
    """Stateful streaming sessionization (applyInPandasWithState with an
    event-time timeout). Sessions closed by a mid-stream gap emit with
    ``open=false`` as data arrives; idle sessions are evicted by the
    watermark (``open=true``) rather than by wall clock, so output is a
    pure function of the input — replayable, testable, and an availableNow
    drain terminates (processing-time timeouts would keep the query alive
    evaluating timers forever)."""
    stream = _event_stream(spark, source_dir).withWatermark("ts", watermark)
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _session_state_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start bigint, last bigint, n bigint, sv double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --------------------------------------------- stream-stream interval join


def view_click_join(events: DataFrame, *, max_lag_minutes: int = 30) -> DataFrame:
    """Batch semantics for the stream-stream join: each click matched to the
    same user's views in the preceding ``max_lag_minutes`` window."""
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")),
    ).select("view_id", "click_id", "view_ts", "click_ts")


def stream_view_click_join(
    spark: SparkSession,
    source_dir: str,
    *,
    max_lag_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with a time-interval condition: views and
    clicks are two streams (here, two filters of one source; in production,
    two Kafka topics), each watermarked so the join state for views older
    than watermark + max_lag is dropped — bounded state at any input rate.

    Spark-first notes: the equality term (user_id) makes this a streaming
    symmetric hash join keyed on user; the interval term bounds how long a
    buffered view can still match, which is exactly what lets the state
    store evict. Without the time bound the state would grow forever."""
    stream = _event_stream(spark, source_dir)
    views = (
        stream.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")),
    ).select("view_id", "click_id", "view_ts", "click_ts")


# ------------------------------------------------------- streaming dedup


def stream_dedup_events(
    spark: SparkSession, source_dir: str, *, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once event feed from an at-least-once source:
    dropDuplicatesWithinWatermark on event_id. Unlike dropDuplicates (whose
    keyed state never expires on a stream), the watermark variant evicts
    state for events older than the allowed lateness — the 100 TB-safe way
    to dedup an infinite stream where retries arrive close to the original."""
    stream = _event_stream(spark, source_dir)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# ---------------------------------------- transformWithState (Spark 4 API)


def stream_user_totals_tws(spark: SparkSession, source_dir: str) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-stateful API (typed state handles + timers) that
    supersedes applyInPandasWithState; this engine carries both so either
    generation of Spark streaming job migrates cleanly.

    State: one ValueState (n_events, total scaled to int 1e4ths). The value
    accumulates as SCALED INTEGERS so the running total is exact and
    batch-order-independent — the streaming answer equals the batch
    groupBy's DECIMAL sum bit-for-bit (pinned in tests/test_streaming.py).
    Update mode emits each user's refreshed totals per micro-batch;
    availableNow drains give one final row per user.

    Requires the RocksDB state store provider (a transformWithState
    prerequisite) — callers set
    ``spark.sql.streaming.stateStore.providerClass`` before starting — and
    protobuf (the TWS driver-worker wire format; not shipped in this
    container, so the parity test is an importorskip lane that auto-runs
    when the dependency appears, same policy as the codec lane).
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n LONG, cents LONG")

        def handleInputRows(
            self, key, rows, timerValues
        ) -> Iterator[pd.DataFrame]:
            n, cents = self._state.get() or (0, 0)
            for pdf in rows:
                n += len(pdf)
                # scale-and-round PER VALUE before summing: each value maps
                # to one integer once, so the running total is genuinely
                # batch-order/batch-boundary independent (rounding a whole
                # batch's float64 sum would let the boundary placement leak
                # into the total)
                cents += int(
                    (pdf["value"].astype("float64") * 10_000)
                    .round()
                    .astype("int64")
                    .sum()
                )
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents / 10_000.0],
                }
            )

        def close(self) -> None:
            pass

    stream = _event_stream(spark, source_dir)
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )
