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
the top ones BY CURRENT SKETCH ESTIMATE at each fold, which preserves every
true heavy hitter (estimates only over-count) while bounding state.

State swap uses the same crash-safe staging/rename pattern as
ingest.stream_merge_into; the checkpoint makes redelivered batches
idempotent at the file level.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import cm_topk, sketch_partials

CELLS = "cells"
CANDS = "cands"


def _swap_in(df: DataFrame, path: str) -> None:
    """Crash-safe overwrite: write staging, rename old aside, move staging
    in, drop old (ingest.stream_merge_into's pattern on a tiny table)."""
    old, staging = f"{path}._old", f"{path}._staging"
    if not os.path.exists(path) and os.path.exists(old):
        os.replace(old, path)
    df.write.mode("overwrite").parquet(staging)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(staging, path)
    if os.path.exists(old):
        shutil.rmtree(old)


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
    cells_path = os.path.join(state_dir, CELLS)
    cands_path = os.path.join(state_dir, CANDS)
    os.makedirs(state_dir, exist_ok=True)

    def fold_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        mixed = sketch_partials(
            batch_df, value_col, depth=depth, width=width, k=k
        ).persist()
        cells = (
            mixed.where(F.col("kind") == "cell")
            .groupBy("row", "col")
            .agg(F.sum("n").alias("n"))
        )
        cands = mixed.where(F.col("kind") == "cand").select("v").distinct()
        if os.path.exists(cells_path):
            prior = sess.read.parquet(cells_path)
            cells = (
                cells.unionByName(prior).groupBy("row", "col").agg(F.sum("n").alias("n"))
            )
        if os.path.exists(cands_path):
            cands = cands.unionByName(sess.read.parquet(cands_path)).distinct()
        # bound candidate state on unbounded streams: keep the strongest by
        # CURRENT estimate (over-counts only, so no true heavy hitter drops)
        cells = cells.localCheckpoint(eager=True)
        n_cands = cands.count()
        if n_cands > max_candidates:
            cands = (
                cm_topk(cells, cands, max_candidates, depth=depth, width=width)
                .select(F.col("value").alias("v"))
            )
        _swap_in(cells, cells_path)
        _swap_in(cands, cands_path)
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
) -> DataFrame:
    """Current top-k (value, n_est) from the maintained state — the same
    cm_topk finisher the batch path uses, over the incrementally merged
    cells."""
    cells = spark.read.parquet(os.path.join(state_dir, CELLS))
    cands = spark.read.parquet(os.path.join(state_dir, CANDS))
    return cm_topk(cells, cands, k, depth=depth, width=width)
