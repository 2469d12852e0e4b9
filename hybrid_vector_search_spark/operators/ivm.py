"""Incremental view maintenance (IVM) for additive rollups.

A 100 TB warehouse does not recompute its rollup views per ingest batch —
it maintains them: because SUM and COUNT are commutative monoids, the view
stores PARTIALS (sum, count per group) and each batch folds in as
``merge(view, partials(batch))`` — one tiny union+groupBy over view-sized
relations, never a rescan of the base table. Deletes fold in the same way
as NEGATED partials (the retraction semantics of differential dataflow /
materialized-view deltas): sum carries −x, count carries −1, and groups
whose count reaches 0 vanish. Non-additive finishers (AVG here; any
ratio-of-sums) are DERIVED from the maintained partials at read time —
the classic reason a view must store (sum, count), not avg.

Exactness discipline: measures accumulate as DECIMAL (the engine-wide
policy), so maintenance is associative and order-independent —
``merge(partials(A), partials(B)) ≡ partials(A ∪ B)`` bit-for-bit, which is
what lets the driver oracle check an add+retract maintenance chain against
a from-scratch recompute by hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(28,2)"


def partials(
    df: DataFrame,
    keys: list[str],
    measure_col: str,
    *,
    negate: bool = False,
) -> DataFrame:
    """(keys…, m_sum DECIMAL, m_count LONG) partials for one batch; with
    ``negate=True`` the batch is a RETRACTION (deleted rows)."""
    sign = -1 if negate else 1
    return df.groupBy(*keys).agg(
        (F.sum(F.col(measure_col).cast(DEC)) * sign).cast(DEC).alias("m_sum"),
        (F.count("*") * sign).alias("m_count"),
    )


def merge(*relations: DataFrame) -> DataFrame:
    """Fold any number of partial relations (view state, inserts,
    retractions) into the new view state: union + one groupBy over
    view-sized inputs. Groups whose maintained count reaches 0 drop out
    (fully retracted)."""
    keys = [c for c in relations[0].columns if c not in ("m_sum", "m_count")]
    out = relations[0]
    for r in relations[1:]:
        out = out.unionByName(r)
    return (
        out.groupBy(*keys)
        .agg(
            F.sum("m_sum").cast(DEC).alias("m_sum"),
            F.sum("m_count").alias("m_count"),
        )
        .where(F.col("m_count") != 0)
    )


def finish(view: DataFrame) -> DataFrame:
    """Read-time finishers over the maintained partials: the additive
    facts plus the derived (non-additive) average."""
    return view.select(
        *[c for c in view.columns if c not in ("m_sum", "m_count")],
        F.col("m_sum").cast("double").alias("total"),
        F.col("m_count").alias("n_rows"),
        F.round(F.col("m_sum").cast("double") / F.col("m_count"), 6).alias("avg_value"),
    )
