"""Pareto frontier (skyline): the non-dominated rows under (minimize one
column, maximize another) — "the best short high-quality documents" shape
that single-metric top-k cannot express (any weighted blend of length and
quality picks ONE point; the skyline returns the whole efficient frontier
for a curator to walk).

Dominance here is STRICT on both dimensions: row a dominates row b iff
``a.min_col < b.min_col AND a.max_col > b.max_col`` — ties on either axis
never dominate, so the result is a total function of the value set
(order-independent, exactly replayable by a NOT EXISTS oracle).

The 2-D skyline reduces to one window pass: sort by ``min_col``, take the
running max of ``max_col`` over STRICTLY-smaller keys (a range frame ending
at -1), and keep rows the running max does not exceed. The scale shape
exploits distributivity — skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))
and domination is transitive, so phase 1 runs the window per hash bucket
(parallel, bounded partitions) and only the per-bucket survivors (the
frontier is tiny relative to any real corpus) meet in the exact phase-2
window; the corpus itself never passes through a single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    *,
    min_col: str,
    max_col: str,
    buckets: int = 32,
) -> DataFrame:
    """Rows not strictly dominated (smaller ``min_col`` AND larger
    ``max_col`` by some other row). ``min_col`` must be numeric (the
    strict-predecessor range frame needs arithmetic ordering)."""

    def keep(frame: DataFrame, part_cols: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col(min_col).asc())
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        mx = F.max(max_col).over(w)
        return (
            frame.withColumn("_mx", mx)
            .where(F.col("_mx").isNull() | (F.col("_mx") <= F.col(max_col)))
            .drop("_mx")
        )

    bucketed = df.withColumn(
        "_b", F.pmod(F.hash(F.col(min_col), F.col(max_col)), F.lit(buckets))
    )
    local = keep(bucketed, ["_b"]).drop("_b")
    # phase 2: exact window over the tiny survivor union only
    return keep(local, [])
