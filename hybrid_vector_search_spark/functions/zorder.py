"""Z-order (Morton) clustering key — multi-column data skipping.

A single-column sorted export (sinks.sorted_export) gives range pruning on
one predicate column. When scans filter on TWO columns, interleaving their
bits into one Morton key and range-partitioning on THAT gives every file a
small rectangle of the 2-D key space — parquet min/max row-group stats then
prune on either column. This is the lakehouse Z-ORDER feature (Delta/Iceberg
expose it as a table service) expressed as plain Catalyst expressions: pure
bit arithmetic inside whole-stage codegen, no UDF, no shuffle beyond the
final range partitioning.

The key builder assumes non-negative integer inputs; ``bucketize`` maps an
arbitrary numeric column into [0, 2^bits) with driver-collected min/max (one
tiny agg job — at 100 TB the min/max come from table statistics instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(c1: Column, c2: Column, *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns
    (c1 → even bit positions, c2 → odd)."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        b1 = F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1))
        b2 = F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(b1, 2 * i)).bitwiseOR(
            F.shiftleft(b2, 2 * i + 1)
        )
    return key


def bucketize(c: Column, lo: float, hi: float, *, bits: int = 16) -> Column:
    """Scale a numeric column into [0, 2^bits) integer buckets."""
    n = (1 << bits) - 1
    span = max(hi - lo, 1e-12)
    return F.least(
        F.lit(n).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            ((c.cast("double") - F.lit(float(lo))) / F.lit(span) * n).cast("long"),
        ),
    )


def zorder_export(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    num_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Morton key of (col_a, col_b): files
    cover small 2-D rectangles, so min/max stats prune on either column."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    key = zorder_key(
        bucketize(F.col(col_a), lo_a, hi_a, bits=bits),
        bucketize(F.col(col_b), lo_b, hi_b, bits=bits),
        bits=bits,
    )
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
