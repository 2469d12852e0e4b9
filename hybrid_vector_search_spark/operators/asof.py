"""As-of (most-recent-prior) join — an operator Spark's API lacks.

For each left row, attach the latest right row with the same key whose
timestamp is ≤ the left timestamp (the standard time-series enrichment join;
DuckDB/Pandas call it ASOF JOIN).

Implementation is the scalable union-window technique, NOT a range join:

1. tag right rows and union them with left rows,
2. one window per key ordered by (ts, right-first-on-ties) computes
   ``last(right_value, ignoreNulls=True)`` over the preceding frame,
3. keep the left rows, now carrying the most recent right value.

Cost: ONE shuffle of |L|+|R| rows keyed by the join key — no range-condition
fan-out (a naive ``l.ts >= r.ts`` join explodes to O(|L|·|R|) per key before
aggregation, which a range-join strategy only partially contains). Skewed
keys behave like any window skew (AQE handles moderate cases; salt the key
for extreme ones). Ties (equal ts) match, per ASOF convention — the
right-before-left sort on the tie column guarantees it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``prefix``-ed columns of the most recent right match.

    ``value_cols`` are the right columns to carry (right_ts is always
    carried as ``{prefix}{right_ts}``). Unmatched left rows keep NULLs
    (LEFT ASOF semantics).
    """
    carried = [right_ts, *value_cols]
    l_tagged = left.withColumn("__is_left", F.lit(1)).withColumn("__ts", F.col(left_ts))
    for c in carried:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = right.select(
        F.col(on),
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    # right rows sort BEFORE left rows at equal ts → ties match (ASOF
    # convention: l.ts >= r.ts includes equality)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for c in carried:
        out = out.withColumn(f"{prefix}{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    return (
        out.where(F.col("__is_left") == 1)
        .drop("__is_left", "__ts", *[f"__r_{c}" for c in carried])
    )
