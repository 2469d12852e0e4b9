"""Streaming heavy hitters: incremental count-min over a file stream.

The batch sketch (operators.sketch) merges per-partition partials by cell
sum; because that merge is associative and commutative, the SAME state shape
can be maintained per micro-batch: each batch's partials fold into a tiny
persisted state (cells ≤ depth·width rows, plus the candidate value set),
and the final top-k is read off the merged state exactly as the batch path
reads its merged relation. Batch/stream parity is therefore algebraic, and
pinned in tests/test_streaming_sketch.py over a multi-batch delivery.

Scale notes: the stream's value column never leaves its micro-batch — only
fixed-size sketch partials touch the state, so state size is
O(depth·width + candidates) no matter the stream rate or cardinality. The
candidate set grows by ≤ partitions·m per batch and is the one component
that needs a trim policy on an unbounded stream: ``max_candidates`` keeps
the top ones BY CURRENT SKETCH ESTIMATE at each fold — once a value has
entered the candidate set, the trim cannot drop a true heavy hitter
(estimates only over-count). Entry itself is per-batch top-m, the standard
candidate-based-CM caveat: a value must be batch-locally heavy at least
once to be discovered, so a value that is globally heavy only by summing a
thin presence across MANY batches can be missed — if that distribution
matters, raise m (``candidates_per_partition``) or run the exact batch
top-k over the retained corpus as the periodic verifier.

Commit contract — two modes, pick by filesystem semantics:

- ``commit_mode="rename"`` (default): build the next version in a staging
  dir, then ONE atomic directory rename. Correct ONLY where directory
  rename is atomic — POSIX local filesystems and HDFS. On S3-class object
  stores "rename" is copy+delete (neither atomic nor cheap), so this mode
  is WRONG there.
- ``commit_mode="manifest"``: each fold writes a NEW immutable version
  directory (never renamed, never mutated after commit), then commits by
  rewriting one small pointer file — the lakehouse manifest-pointer
  pattern (Delta/Iceberg commit shape). Locally the pointer update is an
  ``os.replace`` of a tiny file; on an object store it is a single small
  PUT, which IS atomic there. Readers resolve the pointer first, so they
  only ever see fully-written versions; a crash mid-version-write leaves
  garbage the next fold of the same epoch overwrites, with the pointer
  still on the last committed version. The previous version is retained
  one fold (readers may hold it); older versions are garbage-collected.

foreachBatch is at-least-once, so fold_batch records the last applied
(checkpoint, epoch) inside the committed version and skips a replayed
epoch — without this, a crash after the commit but before the checkpoint
commit would double-count the batch on restart. The guard keys on
checkpoint identity, not the bare epoch number: epoch ids restart at 0
under a fresh checkpoint, so state built by a different checkpoint fails
loudly instead of silently skipping batches. The guard is mode-independent
(it rides inside whichever commit unit the mode swaps/points at).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import cm_topk, sketch_partials

CELLS = "cells"
CANDS = "cands"
CURRENT = "current"


POINTER = "_CURRENT.json"


def _current_dir(state_dir: str) -> str:
    """rename-mode: resolve the live state version, restoring the
    crash-recovery copy if a previous swap died between rename-aside and
    move-in. Assumes atomic directory rename (POSIX/HDFS — see module
    docstring; use commit_mode='manifest' on object stores)."""
    current, old = os.path.join(state_dir, CURRENT), os.path.join(state_dir, f"{CURRENT}._old")
    if not os.path.exists(current) and os.path.exists(old):
        os.replace(old, current)
    return current


def _read_pointer(state_dir: str) -> dict | None:
    p = os.path.join(state_dir, POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _resolve_current(state_dir: str, commit_mode: str) -> str:
    """Path of the live committed state version (may not exist yet)."""
    if commit_mode == "rename":
        return _current_dir(state_dir)
    if commit_mode != "manifest":
        raise ValueError(f"unknown commit_mode {commit_mode!r}")
    ptr = _read_pointer(state_dir)
    if ptr is None:
        return os.path.join(state_dir, "v-none")
    return os.path.join(state_dir, ptr["version"])


def _epoch_skip(current: str, ckpt_id: str, epoch_id: int, state_dir: str) -> bool:
    """Shared at-least-once guard (see fold_batch comment in
    :func:`stream_heavy_hitters`): True ⇒ this epoch already folded under
    this checkpoint; a state dir built by a DIFFERENT checkpoint fails
    loudly (epoch ids are not comparable across checkpoints)."""
    epoch_file = os.path.join(current, "_epoch")
    if not os.path.exists(epoch_file):
        return False
    with open(epoch_file) as fh:
        stored = json.loads(fh.read() or "{}")
    if stored.get("checkpoint") != ckpt_id:
        raise RuntimeError(
            f"state dir {state_dir!r} was built by checkpoint "
            f"{stored.get('checkpoint')!r} but this stream runs under "
            f"{ckpt_id!r}; epoch ids are not comparable across checkpoints, "
            "so folding would silently drop or double-count batches. Use "
            "the original checkpoint, or start from a fresh state_dir."
        )
    return int(stored.get("epoch", -1)) >= epoch_id


def _commit_version(
    state_dir: str,
    commit_mode: str,
    meta: dict,
    write_fn,
) -> None:
    """Shared commit tail: ``write_fn(target_dir)`` materializes the next
    state version's contents, then the version commits by the mode's
    atomic primitive — ONE directory rename (POSIX/HDFS) or ONE pointer
    rewrite (object-store-safe manifest; see module docstring)."""
    if commit_mode == "rename":
        current = os.path.join(state_dir, CURRENT)
        staging = os.path.join(state_dir, f"{CURRENT}._staging")
        if os.path.exists(staging):
            shutil.rmtree(staging)
        write_fn(staging)
        with open(os.path.join(staging, "_epoch"), "w") as fh:
            json.dump(meta, fh)
        old = os.path.join(state_dir, f"{CURRENT}._old")
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(current):
            os.replace(current, old)
        os.replace(staging, current)
        if os.path.exists(old):
            shutil.rmtree(old)
    elif commit_mode == "manifest":
        version = f"v{meta['epoch']:012d}"
        vdir = os.path.join(state_dir, version)
        write_fn(vdir)
        with open(os.path.join(vdir, "_epoch"), "w") as fh:
            json.dump(meta, fh)
        prev = _read_pointer(state_dir)
        tmp = os.path.join(state_dir, POINTER + ".tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version, **meta}, fh)
        os.replace(tmp, os.path.join(state_dir, POINTER))
        keep = {version, prev["version"] if prev else None}
        for name in os.listdir(state_dir):
            if name.startswith("v") and name not in keep:
                shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    else:
        raise ValueError(f"unknown commit_mode {commit_mode!r}")


SKETCHES = "sketches"


def stream_daily_distinct(
    spark: SparkSession,
    source_dir: str,
    ts_col: str,
    key_col: str,
    state_dir: str,
    checkpoint_path: str,
    *,
    lg_k: int = 14,
    max_files_per_trigger: int | None = None,
    commit_mode: str = "rename",
):
    """Maintain per-day Datasketches-HLL distinct-key partials over a file
    stream (availableNow); returns the query.

    The batch twin is plans.relational.sliding_distinct_users's daily
    partial relation: because HLL union is associative and commutative,
    per-micro-batch day sketches fold into the persisted per-day state by
    the same ``hll_union_agg`` that merges them at query time — stream ≡
    batch algebraically, pinned in tests/test_streaming_sketch.py. State is
    O(days · 2^lg_k) bytes no matter the stream rate or key cardinality;
    the key column never leaves its micro-batch. Late events for an old day
    fold into that day's sketch exactly like on-time ones (union is
    order-free), so no watermark is needed for correctness — only for
    bounding how many day rows stay hot.

    Same at-least-once epoch guard and rename/manifest commit contract as
    :func:`stream_heavy_hitters` (shared helpers)."""
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    os.makedirs(state_dir, exist_ok=True)
    ckpt_id = os.path.abspath(checkpoint_path)

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        current = _resolve_current(state_dir, commit_mode)
        if _epoch_skip(current, ckpt_id, epoch_id, state_dir):
            return
        sess = batch_df.sparkSession
        partial = batch_df.groupBy(F.to_date(ts_col).alias("day")).agg(
            F.expr(f"hll_sketch_agg({key_col}, {lg_k})").alias("sk")
        )
        state_path = os.path.join(current, SKETCHES)
        if os.path.exists(state_path):
            partial = partial.unionByName(sess.read.parquet(state_path))
        merged = (
            partial.groupBy("day")
            .agg(F.expr("hll_union_agg(sk, true)").alias("sk"))
            .localCheckpoint(eager=True)
        )
        meta = {"epoch": epoch_id, "checkpoint": ckpt_id}

        def write(target: str) -> None:
            merged.write.mode("overwrite").parquet(os.path.join(target, SKETCHES))

        _commit_version(state_dir, commit_mode, meta, write)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def daily_distinct_from_state(
    spark: SparkSession,
    state_dir: str,
    *,
    window_days: int = 1,
    commit_mode: str = "rename",
) -> DataFrame:
    """(day, users_est) from the maintained per-day sketches; with
    ``window_days`` > 1, each day estimates the distinct count over its
    trailing window by unioning ≤window_days sketch rows — the streaming
    serve of sliding_distinct_users, touching only the tiny state."""
    current = _resolve_current(state_dir, commit_mode)
    daily = spark.read.parquet(os.path.join(current, SKETCHES))
    if window_days == 1:
        out = daily.select(
            "day", F.expr("hll_sketch_estimate(sk)").alias("users_est")
        )
    else:
        spine = daily.select(F.col("day").alias("d"))
        out = (
            daily.join(
                F.broadcast(spine),
                (F.col("day") <= F.col("d"))
                & (F.col("day") >= F.date_sub(F.col("d"), window_days - 1)),
            )
            .groupBy("d")
            .agg(
                F.expr("hll_sketch_estimate(hll_union_agg(sk, true))").alias(
                    "users_est"
                )
            )
            .select(F.col("d").alias("day"), "users_est")
        )
    return out.orderBy("day").localCheckpoint(eager=True)


def stream_heavy_hitters(
    spark: SparkSession,
    source_dir: str,
    value_col: str,
    state_dir: str,
    checkpoint_path: str,
    *,
    depth: int = 4,
    width: int = 2048,
    k: int = 20,
    max_candidates: int = 4096,
    max_files_per_trigger: int | None = None,
    candidates_per_partition: int | None = None,
    commit_mode: str = "rename",
):
    """Start (availableNow) the sketch-maintenance stream; returns the query.

    Each micro-batch folds its count-min partials into ``state_dir``; read
    the current top-k at any time with :func:`heavy_hitters_from_state`.
    Re-invoking with the same checkpoint folds only files that appeared
    since the last run (the batch path's restartability, incremental).
    ``max_files_per_trigger`` bounds batch size (and, in tests, forces a
    genuinely multi-batch fold)."""
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    os.makedirs(state_dir, exist_ok=True)

    ckpt_id = os.path.abspath(checkpoint_path)

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        current = _resolve_current(state_dir, commit_mode)
        # at-least-once guard: a replayed epoch (crash between the state swap
        # below and Spark's checkpoint commit) must not fold twice. The epoch
        # lives INSIDE the versioned state dir and the whole version swaps as
        # ONE rename, so a crash at any point leaves either the pre-fold
        # state (epoch absent/old → replay refolds cleanly) or the post-fold
        # state (epoch current → replay is skipped) — never a half-fold.
        if _epoch_skip(current, ckpt_id, epoch_id, state_dir):
            return
        sess = batch_df.sparkSession
        mixed = sketch_partials(
            batch_df, value_col, depth=depth, width=width, k=k,
            candidates_per_partition=candidates_per_partition,
        ).persist()
        cells = (
            mixed.where(F.col("kind") == "cell")
            .groupBy("row", "col")
            .agg(F.sum("n").alias("n"))
        )
        cands = mixed.where(F.col("kind") == "cand").select("v").distinct()
        cells_path = os.path.join(current, CELLS)
        if os.path.exists(cells_path):
            prior = sess.read.parquet(cells_path)
            cells = (
                cells.unionByName(prior).groupBy("row", "col").agg(F.sum("n").alias("n"))
            )
        cands_path = os.path.join(current, CANDS)
        if os.path.exists(cands_path):
            cands = cands.unionByName(sess.read.parquet(cands_path)).distinct()
        # bound candidate state on unbounded streams: keep the strongest by
        # CURRENT estimate (over-counts only, so no entered heavy hitter drops)
        cells = cells.localCheckpoint(eager=True)
        if cands.count() > max_candidates:
            cands = (
                cm_topk(cells, cands, max_candidates, depth=depth, width=width)
                .select(F.col("value").alias("v"))
            )
        meta = {"epoch": epoch_id, "checkpoint": ckpt_id}

        def write(target: str) -> None:
            cells.write.mode("overwrite").parquet(os.path.join(target, CELLS))
            cands.write.mode("overwrite").parquet(os.path.join(target, CANDS))

        _commit_version(state_dir, commit_mode, meta, write)
        mixed.unpersist()

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def heavy_hitters_from_state(
    spark: SparkSession,
    state_dir: str,
    k: int,
    *,
    depth: int = 4,
    width: int = 2048,
    commit_mode: str = "rename",
) -> DataFrame:
    """Current top-k (value, n_est) from the maintained state — the same
    cm_topk finisher the batch path uses, over the incrementally merged
    cells. The result is materialized eagerly (localCheckpoint) against one
    state version; read contract is read-between-folds (availableNow drained
    or between triggers) — in rename mode a read racing an in-flight swap
    can still lose the version directory between listing and scan (retry);
    in manifest mode the resolved version is immutable and retained one
    fold, so the race window is the GC horizon instead."""
    current = _resolve_current(state_dir, commit_mode)
    cells = spark.read.parquet(os.path.join(current, CELLS))
    cands = spark.read.parquet(os.path.join(current, CANDS))
    return cm_topk(cells, cands, k, depth=depth, width=width).localCheckpoint(eager=True)


VIEW = "view"


def stream_ivm(
    spark: SparkSession,
    source_dir: str,
    keys: list[str],
    measure_col: str,
    state_dir: str,
    checkpoint_path: str,
    *,
    op_col: str | None = None,
    max_files_per_trigger: int | None = None,
    commit_mode: str = "rename",
):
    """Streaming materialized view: maintain an additive rollup
    (operators.ivm partials) over a file stream — each micro-batch folds
    into the persisted view as one view-sized merge, with rows marked 'D'
    in ``op_col`` folding as RETRACTIONS (negated partials). The batch twin
    is relational.ivm_revenue_apply; because decimal partials form a
    commutative monoid, stream ≡ batch algebraically however the input is
    batched — pinned in tests/test_streaming_sketch.py. Same epoch guard
    and rename/manifest commit contract as the sketch streams (shared
    helpers); state is view-sized, never input-sized."""
    from ..operators import ivm

    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    os.makedirs(state_dir, exist_ok=True)
    ckpt_id = os.path.abspath(checkpoint_path)

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        current = _resolve_current(state_dir, commit_mode)
        if _epoch_skip(current, ckpt_id, epoch_id, state_dir):
            return
        sess = batch_df.sparkSession
        if op_col is None:
            parts = [ivm.partials(batch_df, keys, measure_col)]
        else:
            parts = [
                ivm.partials(
                    batch_df.where(F.col(op_col) != "D"), keys, measure_col
                ),
                ivm.partials(
                    batch_df.where(F.col(op_col) == "D"),
                    keys,
                    measure_col,
                    negate=True,
                ),
            ]
        state_path = os.path.join(current, VIEW)
        if os.path.exists(state_path):
            parts.append(sess.read.parquet(state_path))
        merged = ivm.merge(*parts).localCheckpoint(eager=True)
        meta = {"epoch": epoch_id, "checkpoint": ckpt_id}

        def write(target: str) -> None:
            merged.write.mode("overwrite").parquet(os.path.join(target, VIEW))

        _commit_version(state_dir, commit_mode, meta, write)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def ivm_view_from_state(
    spark: SparkSession,
    state_dir: str,
    *,
    commit_mode: str = "rename",
) -> DataFrame:
    """The maintained view with read-time finishers (operators.ivm.finish)."""
    from ..operators import ivm

    current = _resolve_current(state_dir, commit_mode)
    view = spark.read.parquet(os.path.join(current, VIEW))
    return ivm.finish(view).localCheckpoint(eager=True)


def stream_markov(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_path: str,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_files_per_trigger: int | None = None,
    commit_mode: str = "rename",
):
    """Incrementally-maintained Markov transition counts over an event
    stream — the stateful streaming twin of
    relational.events_markov_transitions.

    Per micro-batch the fold computes (a) WITHIN-batch transitions via the
    same (ts, id)-ordered lag window the batch query uses, and (b) the
    BOUNDARY transition from each user's persisted last event into their
    first event of this batch — which is exactly what a naive per-batch
    recount loses. State is two relations, both bounded: the additive
    (from, to, n) counts (|event types|² rows) and the per-user
    (last ts, id, type) frontier (one row per user ever seen — the same
    O(users) state a sessionizer carries). Same epoch guard and
    rename/manifest commit contract as every sketch stream here.

    Correctness contract: per-user batch arrival is time-monotone (each
    batch's events for a user are not earlier than already-folded ones) —
    the standard append-log assumption; under it, stream ≡ batch recount
    however the input is batched (pinned in tests/test_streaming_sketch.py
    against the DuckDB-oracled batch query)."""
    from pyspark.sql import Window

    from .events import user_stream_window

    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    os.makedirs(state_dir, exist_ok=True)
    ckpt_id = os.path.abspath(checkpoint_path)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        current = _resolve_current(state_dir, commit_mode)
        if _epoch_skip(current, ckpt_id, epoch_id, state_dir):
            return
        sess = batch_df.sparkSession
        b = batch_df.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("t"),
            F.col(id_col).alias("i"),
            F.col(type_col).alias("ty"),
        ).localCheckpoint(eager=True)
        w = user_stream_window("u", "t", "i")
        within = (
            b.select(F.lag("ty").over(w).alias("from_type"),
                     F.col("ty").alias("to_type"))
            .where(F.col("from_type").isNotNull())
            .groupBy("from_type", "to_type")
            .agg(F.count("*").cast("long").alias("n"))
        )
        rn = F.row_number().over(w)
        firsts = b.withColumn("_rn", rn).where(F.col("_rn") == 1).drop("_rn")
        lasts = (
            b.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("u").orderBy(F.desc("t"), F.desc("i"))
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        count_parts = [within]
        last_path = os.path.join(current, "last")
        if os.path.exists(last_path):
            prev_last = sess.read.parquet(last_path)
            boundary = (
                firsts.join(prev_last, "u")
                .groupBy(
                    F.col("last_type").alias("from_type"),
                    F.col("ty").alias("to_type"),
                )
                .agg(F.count("*").cast("long").alias("n"))
            )
            count_parts.append(boundary)
            frontier_in = prev_last.select(
                "u",
                F.col("last_ts").alias("t"),
                F.col("last_id").alias("i"),
                F.col("last_type").alias("ty"),
            ).unionAll(lasts)
        else:
            frontier_in = lasts
        new_last = (
            frontier_in.groupBy("u")
            .agg(F.max(F.struct("t", "i", "ty")).alias("m"))
            .select(
                "u",
                F.col("m.t").alias("last_ts"),
                F.col("m.i").alias("last_id"),
                F.col("m.ty").alias("last_type"),
            )
            .localCheckpoint(eager=True)
        )
        counts_path = os.path.join(current, "counts")
        if os.path.exists(counts_path):
            count_parts.append(sess.read.parquet(counts_path))
        new_counts = (
            count_parts[0]
            if len(count_parts) == 1
            else count_parts[0].unionAll(count_parts[1])
            if len(count_parts) == 2
            else count_parts[0].unionAll(count_parts[1]).unionAll(count_parts[2])
        )
        new_counts = (
            new_counts.groupBy("from_type", "to_type")
            .agg(F.sum("n").cast("long").alias("n"))
            .localCheckpoint(eager=True)
        )
        meta = {"epoch": epoch_id, "checkpoint": ckpt_id}

        def write(target: str) -> None:
            new_counts.write.mode("overwrite").parquet(
                os.path.join(target, "counts")
            )
            new_last.write.mode("overwrite").parquet(os.path.join(target, "last"))

        _commit_version(state_dir, commit_mode, meta, write)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def markov_from_state(
    spark: SparkSession, state_dir: str, *, commit_mode: str = "rename"
) -> DataFrame:
    """The maintained transition matrix with read-time row normalization —
    the same output contract as the batch query (and its oracle)."""
    current = _resolve_current(state_dir, commit_mode)
    counts = spark.read.parquet(os.path.join(current, "counts"))
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").alias("n_transitions"),
            F.round(F.col("n") / F.col("n_from"), 6).alias("prob"),
        )
        .orderBy("from_type", "to_type")
        .localCheckpoint(eager=True)
    )


def stream_funnel(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_path: str,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_window: str = "INTERVAL 1 HOUR",
    max_files_per_trigger: int | None = None,
    commit_mode: str = "rename",
):
    """Incrementally-maintained view→click→purchase funnel — the stateful
    streaming twin of relational.events_funnel (same stage semantics: first
    view, first click within the step window OF that view, first purchase
    within the window of that click).

    State is ONE bounded relation: per user the (t_view, t_click,
    t_purchase) stage-timestamp triple (a row only once a user has reached
    stage 1) — the O(users) frontier every funnel maintainer carries. Per
    micro-batch the fold advances stages in three per-user conditional
    mins; the later stages read the JUST-advanced earlier stage, so a
    single batch carrying a user's whole journey completes all three.

    Correctness contract: per-user time-monotone batch arrival (the
    append-log assumption shared with stream_markov). Under it the
    maintained triple equals the batch window recount for any batching —
    a user's first view is in the earliest batch holding their views, so
    coalesce(state, batch-min) IS the global first; pinned against the
    DuckDB-oracled batch query in tests/test_streaming_sketch.py."""
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    os.makedirs(state_dir, exist_ok=True)
    ckpt_id = os.path.abspath(checkpoint_path)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        current = _resolve_current(state_dir, commit_mode)
        if _epoch_skip(current, ckpt_id, epoch_id, state_dir):
            return
        sess = batch_df.sparkSession
        win = F.expr(step_window)
        b = batch_df.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("t"),
            F.col(type_col).alias("ty"),
        ).localCheckpoint(eager=True)
        state_path = os.path.join(current, "funnel")
        if os.path.exists(state_path):
            prev = sess.read.parquet(state_path)
        else:
            prev = sess.createDataFrame(
                [], "u long, t_view timestamp, t_click timestamp, t_purchase timestamp"
            )
        cand_v = (
            b.where(F.col("ty") == "view").groupBy("u").agg(F.min("t").alias("cv"))
        )
        merged = (
            prev.join(cand_v, "u", "full_outer")
            .select(
                "u",
                F.coalesce(F.col("t_view"), F.col("cv")).alias("t_view"),
                "t_click",
                "t_purchase",
            )
        )
        cand_c = (
            b.where(F.col("ty") == "click")
            .join(merged.select("u", "t_view"), "u")
            .where(
                (F.col("t") >= F.col("t_view"))
                & (F.col("t") <= F.col("t_view") + win)
            )
            .groupBy("u")
            .agg(F.min("t").alias("cc"))
        )
        merged = merged.join(cand_c, "u", "left").select(
            "u",
            "t_view",
            F.coalesce(F.col("t_click"), F.col("cc")).alias("t_click"),
            "t_purchase",
        )
        cand_p = (
            b.where(F.col("ty") == "purchase")
            .join(merged.select("u", "t_click"), "u")
            .where(
                (F.col("t") >= F.col("t_click"))
                & (F.col("t") <= F.col("t_click") + win)
            )
            .groupBy("u")
            .agg(F.min("t").alias("cp"))
        )
        new_state = (
            merged.join(cand_p, "u", "left")
            .select(
                "u",
                "t_view",
                "t_click",
                F.coalesce(F.col("t_purchase"), F.col("cp")).alias("t_purchase"),
            )
            .where(F.col("t_view").isNotNull())
            .localCheckpoint(eager=True)
        )
        meta = {"epoch": epoch_id, "checkpoint": ckpt_id}

        def write(target: str) -> None:
            new_state.write.mode("overwrite").parquet(
                os.path.join(target, "funnel")
            )

        _commit_version(state_dir, commit_mode, meta, write)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def funnel_from_state(
    spark: SparkSession, state_dir: str, *, commit_mode: str = "rename"
) -> DataFrame:
    """Stage counts off the maintained frontier — the batch query's exact
    output contract (stage_idx, stage, n_users)."""
    current = _resolve_current(state_dir, commit_mode)
    st = spark.read.parquet(os.path.join(current, "funnel"))
    counts = st.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    return (
        counts.select(
            F.expr(
                "stack(3, 1, 'view', n_view, 2, 'click', n_click,"
                " 3, 'purchase', n_purchase) AS (stage_idx, stage, n_users)"
            )
        )
        .orderBy("stage_idx")
        .localCheckpoint(eager=True)
    )


def stream_ohlc(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_path: str,
    *,
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    max_files_per_trigger: int | None = None,
    commit_mode: str = "rename",
):
    """Incrementally-maintained hourly OHLC candles over the purchase
    stream — the stateful twin of relational.events_value_ohlc_hourly.
    Candles are a textbook MERGEABLE aggregate: open/close carry their
    (ts, id) witness keys so the merge picks the earlier/later witness
    exactly (never first() on arrival order), high/low/count are plain
    extremes, volume is the same 6-dp-quantized DECIMAL sum as the batch
    query. State is O(hours) — one candle row per bucket — and each batch
    folds in as one candle-sized merge, so stream ≡ batch recount for ANY
    batching with no arrival-order assumption at all (unlike the frontier
    states, order-insensitivity is free here: min/max witnesses commute)."""
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    os.makedirs(state_dir, exist_ok=True)
    ckpt_id = os.path.abspath(checkpoint_path)

    def _candles(rows: DataFrame) -> DataFrame:
        hr = rows.select(
            F.date_trunc("hour", F.col(ts_col)).alias("h"),
            F.col(ts_col).alias("t"),
            F.col(id_col).alias("i"),
            F.col(value_col).alias("v"),
        )
        return hr.groupBy("h").agg(
            F.min(F.struct("t", "i", "v")).alias("o"),
            F.max(F.struct("t", "i", "v")).alias("c"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.count("*").cast("long").alias("n_trades"),
            F.sum(F.round(F.col("v"), 6).cast("decimal(18,6)")).alias("vol_dec"),
        )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        current = _resolve_current(state_dir, commit_mode)
        if _epoch_skip(current, ckpt_id, epoch_id, state_dir):
            return
        sess = batch_df.sparkSession
        b = _candles(
            batch_df.where(F.col(type_col) == "purchase").localCheckpoint(eager=True)
        )
        state_path = os.path.join(current, "candles")
        parts = [b]
        if os.path.exists(state_path):
            parts.append(sess.read.parquet(state_path))
        merged = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        new_state = merged.groupBy("h").agg(
            F.min("o").alias("o"),
            F.max("c").alias("c"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.sum("n_trades").cast("long").alias("n_trades"),
            F.sum("vol_dec").alias("vol_dec"),
        ).localCheckpoint(eager=True)
        meta = {"epoch": epoch_id, "checkpoint": ckpt_id}

        def write(target: str) -> None:
            new_state.write.mode("overwrite").parquet(
                os.path.join(target, "candles")
            )

        _commit_version(state_dir, commit_mode, meta, write)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def ohlc_from_state(
    spark: SparkSession, state_dir: str, *, commit_mode: str = "rename"
) -> DataFrame:
    """The maintained candles in the batch query's exact output contract."""
    current = _resolve_current(state_dir, commit_mode)
    st = spark.read.parquet(os.path.join(current, "candles"))
    return (
        st.select(
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            F.col("o")["v"].alias("open"),
            "high",
            "low",
            F.col("c")["v"].alias("close"),
            "n_trades",
            F.col("vol_dec").cast("double").alias("volume"),
        )
        .orderBy("hour")
        .localCheckpoint(eager=True)
    )


VALUES = "values"


def stream_histogram(
    spark: SparkSession,
    source_dir: str,
    value_col: str,
    state_dir: str,
    checkpoint_path: str,
    *,
    key_dp: int = 2,
    max_files_per_trigger: int | None = None,
    commit_mode: str = "rename",
):
    """Maintain a mergeable exact value-frequency state over a file stream
    (availableNow); returns the query. The batch twin is
    plans.relational.value_histogram: the stream cannot know the global
    [min, max] bounds up front (they move as data arrives), so the state
    is NOT the 20 final buckets — it is the (value, count) relation keyed
    by the value quantized to ``key_dp`` decimals (exact for 2-dp money
    values: the DECIMAL cast round-trips the double bit-for-bit). Counts
    merge by sum (associative + commutative), and min/max are derivable
    from the keys themselves, so ANY batching yields the same state and
    :func:`histogram_from_state` rebinds the final data-derived buckets at
    read time — stream ≡ batch exactly, not approximately.

    State is O(|distinct quantized values|) — bounded by the value domain
    (price-like 2-dp columns: domain_width × 10^key_dp keys), independent
    of stream length. For genuinely unbounded domains at 100 TB, lower
    ``key_dp`` (coarser keys, still mergeable) — the histogram then bins
    coarsened values, the standard streaming-histogram trade
    (Ben-Haim & Tom-Tov 2010); with key_dp high enough to separate the
    batch bucket boundaries the result stays exact.

    Same at-least-once epoch guard and rename/manifest commit contract as
    :func:`stream_heavy_hitters` (shared helpers)."""
    dec = f"decimal(18,{key_dp})"
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    os.makedirs(state_dir, exist_ok=True)
    ckpt_id = os.path.abspath(checkpoint_path)

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        current = _resolve_current(state_dir, commit_mode)
        if _epoch_skip(current, ckpt_id, epoch_id, state_dir):
            return
        sess = batch_df.sparkSession
        partial = batch_df.groupBy(
            F.col(value_col).cast(dec).alias("v")
        ).agg(F.count("*").alias("n"))
        state_path = os.path.join(current, VALUES)
        if os.path.exists(state_path):
            partial = partial.unionByName(sess.read.parquet(state_path))
        merged = (
            partial.groupBy("v")
            .agg(F.sum("n").alias("n"))
            .localCheckpoint(eager=True)
        )
        meta = {"epoch": epoch_id, "checkpoint": ckpt_id}

        def write(target: str) -> None:
            merged.write.mode("overwrite").parquet(os.path.join(target, VALUES))

        _commit_version(state_dir, commit_mode, meta, write)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def histogram_from_state(
    spark: SparkSession,
    state_dir: str,
    *,
    buckets: int = 20,
    commit_mode: str = "rename",
) -> DataFrame:
    """(bucket, n) — the batch value_histogram read off the maintained
    state: bounds = exact min/max of the state keys (equal to the raw
    stream's min/max when key_dp preserves the values), then width_bucket
    over the state's (value, count) rows weighted by count. Touches only
    the tiny state relation; the final histogram is identical to running
    the batch query over the full replayed stream."""
    current = _resolve_current(state_dir, commit_mode)
    st = spark.read.parquet(os.path.join(current, VALUES))
    bounds = st.agg(
        F.min(F.col("v").cast("double")).alias("lo"),
        F.max(F.col("v").cast("double")).alias("hi"),
    )
    return (
        st.join(F.broadcast(bounds))
        .select(
            F.width_bucket(
                F.col("v").cast("double"), F.col("lo"), F.col("hi"), F.lit(buckets)
            ).alias("bucket"),
            "n",
        )
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
        .orderBy("bucket")
        .localCheckpoint(eager=True)
    )


TYPE_COUNTS = "type_counts"


def stream_type_mix(
    spark: SparkSession,
    source_dir: str,
    ts_col: str,
    type_col: str,
    state_dir: str,
    checkpoint_path: str,
    *,
    max_files_per_trigger: int | None = None,
    commit_mode: str = "rename",
):
    """Maintain the per-(day, type) count relation over a file stream
    (availableNow); returns the query. The batch twin is
    plans.relational.event_type_entropy_daily: entropy is NOT mergeable,
    but its sufficient statistics — the (day, type, n) counts — merge by
    sum, so the state folds exactly under any batching and
    :func:`type_mix_entropy_from_state` computes the entropy ladder over
    the tiny days×types state at read time. Stream ≡ batch exactly (the
    stream_histogram principle: persist the mergeable sufficient
    statistics, defer the non-mergeable final expression to serve time).

    State is O(days × |type alphabet|) rows — the alphabet is small by
    construction and late events fold into their (day, type) cell without
    a watermark (sum is order-free). Same at-least-once epoch guard and
    rename/manifest commit contract as the other folds here."""
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    os.makedirs(state_dir, exist_ok=True)
    ckpt_id = os.path.abspath(checkpoint_path)

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        current = _resolve_current(state_dir, commit_mode)
        if _epoch_skip(current, ckpt_id, epoch_id, state_dir):
            return
        sess = batch_df.sparkSession
        partial = batch_df.groupBy(
            F.date_format(ts_col, "yyyy-MM-dd").alias("day"),
            F.col(type_col).alias("etype"),
        ).agg(F.count("*").alias("n"))
        state_path = os.path.join(current, TYPE_COUNTS)
        if os.path.exists(state_path):
            partial = partial.unionByName(sess.read.parquet(state_path))
        merged = (
            partial.groupBy("day", "etype")
            .agg(F.sum("n").alias("n"))
            .localCheckpoint(eager=True)
        )
        meta = {"epoch": epoch_id, "checkpoint": ckpt_id}

        def write(target: str) -> None:
            merged.write.mode("overwrite").parquet(
                os.path.join(target, TYPE_COUNTS)
            )

        _commit_version(state_dir, commit_mode, meta, write)

    return (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def type_mix_entropy_from_state(
    spark: SparkSession,
    state_dir: str,
    *,
    commit_mode: str = "rename",
) -> DataFrame:
    """(day, n_events, n_types, entropy_bits) — the batch
    event_type_entropy_daily expression evaluated over the maintained
    (day, type, n) state: same −p·log2 p 9-dp quantize → DECIMAL-sum
    ladder, so the serve equals the batch query bit-for-bit."""
    from pyspark.sql import Window

    current = _resolve_current(state_dir, commit_mode)
    per = spark.read.parquet(os.path.join(current, TYPE_COUNTS))
    tot = F.sum("n").over(Window.partitionBy("day"))
    p = F.col("n").cast("double") / F.col("n_day").cast("double")
    term = -p * F.log2(p)
    return (
        per.withColumn("n_day", tot)
        .groupBy("day")
        .agg(
            F.max("n_day").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.round(term, 9).cast("decimal(28,12)"))
            .cast("double")
            .alias("entropy_raw"),
        )
        .select(
            "day",
            "n_events",
            "n_types",
            F.round("entropy_raw", 6).alias("entropy_bits"),
        )
        .orderBy("day")
        .localCheckpoint(eager=True)
    )
