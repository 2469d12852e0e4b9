"""Streaming embed-and-ingest: the reference's offline embedding backfill
(embed.py: find → batch-embed → update, restartable via --skip-existing) as
an incremental Structured Streaming pipeline with exactly-once semantics.

- Source: parquet file stream (new document files appear → picked up once).
- Transform: the SAME iterator-Pandas-UDF embedder the batch path uses
  (operators.embed) — embedding is a narrow map, so it streams trivially.
- Sink: append-mode parquet + checkpoint. The checkpoint IS the skip-existing
  ledger: a restart resumes from the last committed file offset and never
  re-embeds or duplicates (tested), where the reference re-scans the whole
  collection and filters client-side (embed.py:95-96).

Scale: each micro-batch embeds only new files; with trigger(availableNow)
this is an idempotent catch-up job safe to run from cron — state lives in
the checkpoint, not in the data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.embed import HashingEmbedder, embed_texts


def stream_embed_ingest(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_path: str,
    *,
    text_col: str = "text",
    emb_col: str = "embedding",
    embedder=None,
):
    """Start (availableNow) the embed-and-append stream; returns the query.

    Callers await termination; re-invoking with the same checkpoint embeds
    only files that appeared since the last run."""
    embedder = embedder or HashingEmbedder()
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    embedded = stream.withColumn(emb_col, embed_texts(embedder, F.col(text_col)))
    return (
        embedded.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def load_ingested(spark: SparkSession, target_path: str) -> DataFrame:
    return spark.read.parquet(target_path)


def stream_merge_into(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_path: str,
    keys: list[str],
):
    """Streaming MERGE (foreachBatch upsert): each micro-batch is upserted
    into the target table by key — source rows win on match, unmatched
    target rows persist. The checkpoint makes redelivered batches
    idempotent; within-batch duplicates collapse via dropDuplicates(keys)
    before the merge.

    Parquet has no transactional MERGE, so the batch hook materializes the
    merged result to a staging dir and swaps it in — the pattern a Delta /
    Iceberg sink replaces with a real MERGE INTO while this plan shape
    (anti-join + union, from sinks.merge_upsert) stays identical. Returns
    the started query (availableNow)."""
    import os
    import shutil

    from ..sources.sinks import merge_upsert

    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        _restore_target(target_path)
        batch = batch_df.dropDuplicates(keys)
        if os.path.exists(target_path):
            target = batch.sparkSession.read.parquet(target_path)
            merged = merge_upsert(target, batch, keys)
        else:
            merged = batch
        _swap_in(merged, target_path)

    return (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _restore_target(target_path: str) -> None:
    """Crash recovery FIRST: a crash between "rename target aside" and
    "move staging in" leaves no target but a surviving ._old — restore it
    before merging, or the batch would silently rebuild the table from
    itself alone and the cleanup below would destroy the only copy."""
    import os

    old = f"{target_path}._old"
    if not os.path.exists(target_path) and os.path.exists(old):
        os.replace(old, target_path)


def _swap_in(merged: DataFrame, target_path: str) -> None:
    """Crash-safe swap: write to staging, keep the old target recoverable
    at every step — rename it aside, move staging in, and only rmtree the
    old copy AFTER the swap has fully succeeded. (rmtree-then-replace had a
    window where a crash left NO target; _restore_target covers the
    remaining rename-aside → move-in window.)"""
    import os
    import shutil

    old = f"{target_path}._old"
    staging = f"{target_path}._staging"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target_path):
        os.replace(target_path, old)
    os.replace(staging, target_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def stream_scd2_apply(
    spark: SparkSession,
    source_dir: str,
    history_path: str,
    checkpoint_path: str,
    *,
    key_col: str,
    content_col: str,
    op_col: str = "op",
):
    """Streaming SCD2 maintenance: each CDC micro-batch (key, content, op)
    is applied to the on-disk history table via operators.snapshots.
    scd2_apply, with valid_from/valid_to versions = batch epoch + 1. The
    two-snapshot batch build (scd2_merge) is the special case "batch 1 =
    snapshot 1 as upserts, batch 2 = the snapshot diff" — pinned equal in
    tests/test_snapshots.py.

    Exactly-once story: the checkpoint dedupes source files
    (at-least-once batch redelivery remains possible on crash); scd2_apply
    is IDEMPOTENT per batch (re-applying closes/opens nothing — the
    fingerprints are already current), so replays converge instead of
    double-closing rows. The history swap is the same crash-safe
    staging+rename dance as stream_merge_into. Returns the started
    availableNow query."""
    import os

    schema = spark.read.parquet(source_dir).schema
    # one source file per micro-batch: each CDC file IS one version
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    from ..operators.snapshots import scd2_apply

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        _restore_target(history_path)
        sess = batch_df.sparkSession
        history = (
            sess.read.parquet(history_path)
            if os.path.exists(history_path)
            else None
        )
        new_hist = scd2_apply(
            history, batch_df, int(epoch_id) + 1, key_col, content_col,
            op_col=op_col,
        )
        _swap_in(new_hist, history_path)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
