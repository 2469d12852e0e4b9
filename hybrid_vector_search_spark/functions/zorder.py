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
arbitrary numeric column into [0, 2^bits) given bounds that are either
caller-supplied (table statistics / catalog metadata — the 100 TB path) or
derived lazily as a broadcast 1-row stats relation inside the write plan
(never an eager driver job).
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


def bucketize(
    c: Column, lo: float | Column, hi: float | Column, *, bits: int = 16
) -> Column:
    """Scale a numeric column into [0, 2^bits) integer buckets (clamped).

    ``lo``/``hi`` may be Python numbers OR Columns — the Column form lets a
    caller feed bounds from a broadcast statistics row, keeping the whole
    keying expression lazy."""
    n = (1 << bits) - 1
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    span = F.greatest(hi_c.cast("double") - lo_c.cast("double"), F.lit(1e-12))
    return F.least(
        F.lit(n).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            ((c.cast("double") - lo_c.cast("double")) / span * n).cast("long"),
        ),
    )


def zorder_keyed(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    bits: int = 16,
    bounds: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """``df`` plus a ``_zkey`` Morton-key column, fully lazy.

    With ``bounds`` the key is pure projection (literal bounds). Without,
    the min/max come from a broadcast 1-row aggregate joined into the plan —
    still no eager action; the stats read materializes only when the caller
    executes the plan."""
    if bounds is not None:
        lo_a, hi_a, lo_b, hi_b = bounds
        key = zorder_key(
            bucketize(F.col(col_a), lo_a, hi_a, bits=bits),
            bucketize(F.col(col_b), lo_b, hi_b, bits=bits),
            bits=bits,
        )
        return df.withColumn("_zkey", key)
    stats = df.agg(
        F.min(col_a).alias("_zlo_a"),
        F.max(col_a).alias("_zhi_a"),
        F.min(col_b).alias("_zlo_b"),
        F.max(col_b).alias("_zhi_b"),
    )
    key = zorder_key(
        bucketize(F.col(col_a), F.col("_zlo_a"), F.col("_zhi_a"), bits=bits),
        bucketize(F.col(col_b), F.col("_zlo_b"), F.col("_zhi_b"), bits=bits),
        bits=bits,
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_zkey", key)
        .drop("_zlo_a", "_zhi_a", "_zlo_b", "_zhi_b")
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
    bounds: tuple[float, float, float, float] | None = None,
) -> None:
    """Write parquet clustered by the Morton key of (col_a, col_b): files
    cover small 2-D rectangles, so min/max stats prune on either column.

    ``bounds`` = (lo_a, hi_a, lo_b, hi_b) makes the export strictly
    single-scan: at 100 TB the caller already has these from table
    statistics / catalog metadata (or an approx-quantile sample), and any
    extra pass over the fact table just to learn them doubles the write
    cost. Out-of-range rows under caller-supplied bounds are safe —
    ``bucketize`` clamps into [0, 2^bits), so they cluster into the edge
    buckets instead of corrupting the key.

    Without ``bounds`` there is NO eager driver job either: the min/max are
    computed as a broadcast 1-row statistics relation INSIDE the write plan
    (a lazy scalar-subquery shape), so the export stays one Spark action
    and composes lazily — the stats branch is the only extra read, and on
    parquet sources it scans just the two key columns. (Range partitioning
    itself samples the keyed relation for split points — inherent to any
    sorted export, identical on both paths.)"""
    (
        zorder_keyed(df, col_a, col_b, bits=bits, bounds=bounds)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
