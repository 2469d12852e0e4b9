"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

At 100 TB, hot keys (one language dominating documents, one user dominating
events) make a single reducer the job's critical path. AQE's skew-join
splitting handles joins; for AGGREGATIONS over skewed keys the standard fix
is salting:

- phase 1: group by (key, salt) where salt = hash(row) % factor — the hot
  key's rows spread over ``factor`` reducers and are partially aggregated;
- phase 2: group by key over the ≤ factor partial rows per key.

Only works for algebraic aggregates (sum/count/min/max — anything with a
merge step); the helpers here expose exactly those. Results are identical
to the unsalted aggregation (pinned by tests/test_skew.py) because the
aggregates are associative — the same reason Spark's own partial aggregation
is sound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    *,
    factor: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (merge_fn_name, phase-1 column expression),
    where merge_fn_name ∈ {"sum", "min", "max"} merges partials in phase 2
    (a count is a sum of partial counts).
    """
    salted = df.withColumn("__salt", (F.rand(seed=0) * factor).cast("int"))
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(out) for out, (_, expr) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    phase2 = phase1.groupBy(*key_cols).agg(
        *[merge[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )
    return phase2


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side ×factor
    so every salted partition finds its match. The small side must be
    broadcast-sized × factor. (With AQE skew-join this is rarely needed
    manually; kept for layouts AQE can't split, e.g. pre-bucketed inputs.)
    """
    salted_big = skewed.withColumn("__salt", (F.rand(seed=0) * factor).cast("int"))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    out = salted_big.join(F.broadcast(exploded_small), [on, "__salt"], how)
    return out.drop("__salt")
