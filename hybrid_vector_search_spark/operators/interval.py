"""Interval (range) join — equi-key + time-range condition, bucketized.

Find all (left, right) pairs with the same key where ``right.ts`` falls in
``[left.ts + lower, left.ts + upper]``. Spark's built-in planning for this
shape degenerates to a nested-loop per key; the scalable formulation buckets
time into windows of width (upper − lower):

- each LEFT row's target interval spans at most TWO buckets → explode left
  into ≤ 2 (key, bucket) rows;
- each RIGHT row lands in exactly ONE bucket;
- equi-join on (key, bucket), then apply the exact range predicate.

Cost: an equi-join whose fan-out is the true match count plus near-misses in
adjacent buckets — never |L|·|R| per key. The same trick underlies
Databricks' range-join optimization and kdb's window joins; here it is a
pure DataFrame composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: int,
    upper_sec: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """Pairs where right_ts ∈ [left_ts + lower_sec, left_ts + upper_sec]."""
    if upper_sec <= lower_sec:
        raise ValueError("upper_sec must exceed lower_sec")
    # exact integer-microsecond arithmetic: timestamps carry sub-second
    # precision, and second-truncating casts round differently across engines
    lower_us, upper_us = lower_sec * 1_000_000, upper_sec * 1_000_000
    width = upper_us - lower_us

    l_ts = F.unix_micros(F.col(left_ts))
    lo, hi = l_ts + lower_us, l_ts + upper_us
    l_buckets = F.array_distinct(F.array(F.floor(lo / width), F.floor(hi / width)))
    l_tagged = left.withColumn("__bucket", F.explode(l_buckets))

    r_cols = [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != on]
    r_tagged = right.select(
        F.col(on),
        F.floor(F.unix_micros(F.col(right_ts)) / width).alias("__bucket"),
        *r_cols,
    )
    r_ts_out = F.unix_micros(F.col(f"{right_prefix}{right_ts}"))
    return (
        l_tagged.join(r_tagged, [on, "__bucket"])
        .where((r_ts_out >= lo) & (r_ts_out <= hi))
        .drop("__bucket")
    )
