"""One-pass table profiling — the ingest-time column summary report.

The first thing anyone does with a new data drop is profile it: per column,
how many rows, how many nulls, how many distinct values, what range. This
module is that report (the Deequ/dbt-profiler shape) as TWO single-row
Spark aggregations over the table — counts + count-distincts (one Expand,
hash-aggregated) and an Expand-free min/max pass — crossJoined (1 × 1 row)
and unpivoted to a ``(column, n_rows, n_null, n_distinct, min_value,
max_value)`` relation via an array-of-structs explode (the same shape as
``constraints.validate``; report size = number of columns, never rows).
The split is deliberate: string-typed min/max buffers disqualify hash
aggregation, and one combined aggregate drags the whole count-distinct
Expand through a SortAggregate cascade. Never per-column jobs.

Cross-engine canonicalization: min/max are stringified through a fixed
DECIMAL(30,6) for fractional numerics (plain CAST of a double renders
scientific notation differently per engine), ISO CAST for dates and
timestamps, and plain CAST otherwise — so the DuckDB oracle matches the
report byte-for-byte.

At 100 TB: exact count-distinct is the one statistic whose Expand fan-out
costs k× the scan rows in partial-aggregate input; pass
``approx_distinct=True`` to swap in HyperLogLog++ (single non-expanded
pass, fixed-size sketches) when exactness isn't required — same report
schema, estimates in ``n_distinct``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon(col: F.Column, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        return col.cast("decimal(30,6)").cast("string")
    return col.cast("string")


def profile_aggregates(
    df: DataFrame,
    columns: list[str],
    *,
    approx_distinct: bool = False,
) -> DataFrame:
    """The ONE-ROW exact statistics relation under the profile report:
    counts + count-distincts (one Expand, hash-aggregated) crossJoined
    (1 × 1 row) with an Expand-free min/max pass. Exposed separately so
    consumers that need the exact facts twice — the plain report AND the
    self-attesting HLL twin — can compute them ONCE, persist the single
    row, and build both reports from it (the ANN-trio shared-exact-pass
    recipe): at any scale the expensive thing here is the Expand scan,
    and it should never run once per downstream report."""
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = [F.count(F.lit(1)).alias("_n")]
    minmax = []
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"_null{i}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(col).alias(f"_dist{i}"))
        else:
            aggs.append(F.countDistinct(col).alias(f"_dist{i}"))
        # aggregate on the NATIVE type (numeric/date ordering), canonicalize
        # the single resulting value afterwards
        minmax.append(_canon(F.min(col), dtypes[c]).alias(f"_min{i}"))
        minmax.append(_canon(F.max(col), dtypes[c]).alias(f"_max{i}"))
    # min/max run as their OWN single-row aggregate, crossJoined (1 × 1 row)
    # with the counts: a string-typed min/max buffer disqualifies hash
    # aggregation for the WHOLE aggregate, which would drag the k-way
    # count-distinct Expand through a SortAggregate + Sort cascade (measured
    # 2.6s → 2.0s on sf0.1 orders); split, the Expand stays in a pure
    # HashAggregate and the min/max pass is a plain Expand-free scan.
    return df.agg(*aggs).crossJoin(df.agg(*minmax))


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx_distinct: bool = False,
    attest_rsd: float | None = None,
    attest_tolerance: float = 0.05,
    exact_agg: DataFrame | None = None,
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_value, max_value) per column.

    ``attest_rsd`` turns the report self-attesting (the approx_distinct_users
    recipe): the HLL++ estimate at that relative standard deviation runs
    alongside the exact count-distinct, and an extra
    ``approx_within_tol`` boolean per column claims the estimate landed
    within ``attest_tolerance`` of the exact value. The exact counts stay
    oracle-checkable value-for-value; the boolean is the stated contract, so
    an estimator regression hash-fails the driver gate. At 100 TB the
    production report runs HLL alone (``approx_distinct=True``); the
    attesting mode is the verifier that earns trust in that default.

    ``exact_agg`` supplies a precomputed ``profile_aggregates`` row (e.g. a
    persisted one shared with the plain report) so the attesting twin costs
    only the HLL scan — the exact Expand never runs twice per table.
    """
    if columns is None:
        columns = df.columns
    agg = (
        profile_aggregates(df, columns, approx_distinct=approx_distinct)
        if exact_agg is None
        else exact_agg
    )
    if attest_rsd is not None:
        # The HLL attestations run as their OWN single-row aggregate,
        # crossJoined (1 row × 1 row) with the profile: mixing the HLL
        # buffers into the multi-countDistinct aggregate forces the whole
        # Expand through a SortAggregate cascade (measured 23s vs 2.9s on
        # sf0.1 orders) because the imperative HLL buffer disqualifies hash
        # aggregation; two separate scans each keep their natural plan.
        hll = df.agg(
            *[
                F.approx_count_distinct(F.col(c), rsd=attest_rsd).alias(f"_hll{i}")
                for i, c in enumerate(columns)
            ]
        )
        agg = agg.crossJoin(hll)
    structs = []
    for i, c in enumerate(columns):
        fields = [
            F.lit(c).alias("column"),
            F.col("_n").cast("long").alias("n_rows"),
            F.coalesce(F.col(f"_null{i}"), F.lit(0)).cast("long").alias("n_null"),
            F.col(f"_dist{i}").cast("long").alias("n_distinct"),
            F.col(f"_min{i}").alias("min_value"),
            F.col(f"_max{i}").alias("max_value"),
        ]
        if attest_rsd is not None:
            fields.append(
                (
                    F.abs(F.col(f"_hll{i}") - F.col(f"_dist{i}"))
                    <= F.lit(attest_tolerance) * F.col(f"_dist{i}")
                ).alias("approx_within_tol")
            )
        structs.append(F.struct(*fields))
    return agg.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
