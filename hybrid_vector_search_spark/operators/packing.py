"""Training-sequence packing and per-group document caps.

Two pipeline-layout operators a large-scale training-data build needs that
the reference (a per-query search engine, backend/api.py) never had —
first-class here because they shape what actually gets fed to a trainer:

- ``pack_sequences``: pack variable-length documents into fixed-capacity
  context windows (bins) — the "sequence packing" step that turns a corpus
  of token counts into dense training batches. Deterministic grouped
  NEXT-FIT: documents are hash-assigned to independent packer groups
  (md5-stable, engine-portable), ordered by id within a group, and folded
  sequentially — an item goes into the current bin iff it fits, else it
  opens the next bin. An oversize item (len > capacity) naturally occupies
  a bin alone (downstream truncation's problem, never silently dropped).

  Scale: the sequential fold is per-GROUP, groups are hash-balanced and
  independent, so parallelism = n_groups — size it to the cluster
  (tokens-per-task ≈ total_tokens / n_groups). The shuffle moves only
  (id, len) pairs, never text. Bin quality: next-fit wastes at most one
  item's worth of slack per bin boundary; over random-ordered corpora its
  fill factor is within a few % of first-fit-decreasing while needing no
  global sort.

- ``cap_per_group``: keep at most ``n`` documents per group (the
  per-domain / per-source cap every crawl pipeline applies so one giant
  host can't dominate the corpus). Selection is a deterministic hash order,
  NOT "first n seen" — stable under reruns and repartitioning, like
  operators.sampling. One shuffle on the group key; AQE skew-join handles
  a monster domain.

Both are exactly reproducible in the DuckDB oracle (plans/oracles.py:
PACK_SEQUENCES replays the next-fit fold as a recursive CTE; CAP_PER_GROUP
is the same hash-ordered window).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import BUCKETS, hash_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    capacity: int,
    n_groups: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign each row a (pack_group, bin_idx, bin_offset) packing position.

    Output columns: id_col, len_col, pack_group, bin_idx, bin_offset —
    one row per input row; (pack_group, bin_idx) is the training sequence
    the document lands in, bin_offset its token start within it.

    Next-fit within a group, items ordered by id ascending: a bin's fill
    grows while the next item still fits (fill + len <= capacity); the
    first item that doesn't fit opens bin_idx + 1 at offset 0.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_groups <= 0:
        raise ValueError("n_groups must be positive")

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(len_col).cast("long").alias("len"),
        hash_bucket(F.col(id_col), buckets=n_groups, salt=salt)
        .cast("int")
        .alias("pack_group"),
    )

    schema = (
        f"id {src.schema['id'].dataType.simpleString()}, len long, "
        "pack_group int, bin_idx long, bin_offset long"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        bins: list[int] = []
        offs: list[int] = []
        bin_idx, fill = 0, 0
        for ln in pdf["len"]:
            ln = int(ln)
            if bins and fill + ln > capacity:  # doesn't fit → open next bin
                bin_idx += 1
                fill = 0
            bins.append(bin_idx)
            offs.append(fill)
            fill += ln
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        pdf["bin_offset"] = pd.Series(offs, dtype="int64")
        return pdf

    return src.groupBy("pack_group").applyInPandas(fold, schema).select(
        F.col("id").alias(id_col),
        F.col("len").alias(len_col),
        "pack_group",
        "bin_idx",
        "bin_offset",
    )


def pack_stats(packed: DataFrame, len_col: str, *, capacity: int) -> DataFrame:
    """Per-(pack_group, bin_idx) fill summary of a pack_sequences result:
    n_items, fill, and the slack left in the window — the packing-efficiency
    report a batch-building pipeline watches."""
    return (
        packed.groupBy("pack_group", "bin_idx")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(len_col).alias("fill"),
        )
        .withColumn("slack", F.greatest(F.lit(0), F.lit(capacity) - F.col("fill")))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    *,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``n`` rows per group, selected by deterministic hash
    order (md5 bucket of the key, ties by key) — the per-domain cap.
    Stable: a kept row stays kept when the corpus grows only if its hash
    rank within the group stays <= n; selection never depends on scan or
    partition order."""
    if n <= 0:
        raise ValueError("n must be positive")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), buckets=BUCKETS, salt=salt).asc(),
        F.col(key_col).asc(),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n)
        .drop("__rk")
    )
