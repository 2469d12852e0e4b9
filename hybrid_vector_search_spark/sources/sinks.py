"""Write paths (the reference's sinks, SURVEY.md §2.1 S3-S5).

Reference sinks are MongoDB writes:
- S3 bulk insert: ``insert_many`` in batches of 500 (transform-seed.py:127-142)
- S4 point update: per-doc ``$set`` of one field (embed.py:149-153)
- S5 drop/replace: collection/index drop before rebuild (seed.py:211-212)

Parquet equivalents:
- bulk_write: append/overwrite parquet; "batching" is task-level file writes
  and row groups — Spark's write path batches natively (O7), the knob is
  maxRecordsPerFile, not a client-side loop.
- column_add_rewrite: parquet has no point updates; adding/refreshing a
  column is a full (or partition-scoped) rewrite (SURVEY.md §7.5.6).
- incremental_update: the scalable S4 analog — an anti-join keeps rows that
  already have the column, computes it only for the rest, and rewrites.
  At 100 TB with partitioned layouts this becomes dynamic partition
  overwrite (spark.sql.sources.partitionOverwriteMode=dynamic) touching only
  affected partitions.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bulk_write(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
) -> None:
    """S3/S5: batched bulk write; mode="overwrite" is the drop-and-replace."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def column_add_rewrite(
    spark: SparkSession,
    path: str,
    out_path: str,
    compute: Callable[[DataFrame], Column],
    col_name: str,
) -> DataFrame:
    """S4 full-rewrite form: read → add column → write. Returns the new scan."""
    df = spark.read.parquet(path)
    df.withColumn(col_name, compute(df)).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    *,
    target_rows_per_file: int,
) -> int:
    """Small-files compaction: rewrite a directory into ~target-sized files.

    Streaming appends and fine-grained incremental jobs accumulate small
    files; at 100 TB the scan's task-scheduling overhead becomes file-count
    bound. One read → repartition → write fixes it without touching values.
    Returns the number of output partitions chosen.
    """
    df = spark.read.parquet(path)
    n = df.count()
    parts = max(1, -(-n // target_rows_per_file))  # ceil
    df.repartition(parts).write.mode("overwrite").parquet(out_path)
    return parts


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Delta-style MERGE (upsert) as a plan: source rows win on key match,
    unmatched target rows pass through, unmatched source rows are inserts.

    Implemented as left_anti + unionByName — one shuffle on the key columns
    and no per-column coalesce (a full-outer formulation would touch every
    column). At 100 TB the write side of this becomes dynamic partition
    overwrite (partitionOverwriteMode=dynamic): only partitions present in
    the change set are rewritten, the union never materializes whole."""
    return source.unionByName(target.join(source, keys, "left_anti"))


def incremental_update(
    spark: SparkSession,
    path: str,
    out_path: str,
    compute: Callable[[DataFrame], Column],
    col_name: str,
) -> DataFrame:
    """S4 + skip-existing (reference embed.py:95-96): recompute ``col_name``
    only where it is NULL; rows that already have it pass through unchanged.
    One scan, one narrow transform, one write — no shuffle."""
    df = spark.read.parquet(path)
    if col_name in df.columns:
        out = df.withColumn(
            col_name, F.when(F.col(col_name).isNull(), compute(df)).otherwise(F.col(col_name))
        )
    else:
        out = df.withColumn(col_name, compute(df))
    out.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def sorted_export(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    *,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Globally-sorted parquet export without a single-partition sort.

    repartitionByRange assigns disjoint key ranges to partitions (driver
    samples the key distribution), sortWithinPartitions orders each range
    locally — together the files form a total order while every executor
    sorts only its own slice. This is how a 100 TB corpus ships sorted
    (readers get range-pruning for free); `.orderBy().coalesce(1)` — the
    naive spelling — would funnel the world through one task."""
    cols = [F.col(c) for c in order_cols]
    out = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
