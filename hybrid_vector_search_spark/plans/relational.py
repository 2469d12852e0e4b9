"""General relational query plans (the Spark-built-in operator surface).

The reference composes $match/$project/$group/$sort/$limit (SURVEY.md §2);
Spark's DataFrame API provides all of them natively. These builders exist to
(a) exercise that surface against the DuckDB oracle over the TPC-H-ish
testdata, and (b) document the scale-relevant plan choices:

- aggregations are partial (map-side combine) automatically — groupBy never
  ships raw rows, only per-partition partial aggregates;
- dimension joins are broadcast (nation/region/customer are tiny; Catalyst
  picks broadcast-hash under the autoBroadcastJoinThreshold, asserted in
  tests/test_plans.py);
- per-group top-k uses a window over partitionBy(group) — the shuffle carries
  only the projected columns, and AQE coalesces post-shuffle partitions.

Determinism note: money/quantity columns are k-decimal values stored as
doubles. Floating sums are order-dependent, and Spark's partial aggregation
order differs from DuckDB's sequential order — so every SUM here casts the
per-row term to DECIMAL first (exact, associative), and casts the final
aggregate back to double. That makes results bit-identical across engines at
any parallelism, which is also the right call on a 1000-executor cluster
(no run-to-run jitter in financial aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

DEC = "decimal(18,2)"


def _dsum(c: Column) -> Column:
    """Order-independent exact sum of a k≤2-decimal double column."""
    return F.sum(c.cast(DEC)).cast("double")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate over lineitem (sum/avg/count per flag)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*")).alias(
                "avg_qty"
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join: lineitem ⋈ orders ⋈ customer ⋈ nation, revenue per nation.

    customer/nation are broadcast; the only corpus-sized shuffle is the
    final groupBy on n_name (25 groups → trivially small)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("n_name")
    )


def top_orders_per_segment(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-group top-k (window row_number) — top orders by price per market
    segment, deterministic tie-break on o_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("c_mktsegment", "rank", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rank")
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregate (returnflag → returnflag×linestatus →
    grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(_dsum(F.col("l_extendedprice")).alias("sum_base_price"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS) + count per priority — left_semi keeps the probe
    side unduplicated, no fan-out shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single aggregate — the query whose whole
    cost is the scan; pushdown decides everything."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n"))
    )


def avg_qty_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated subquery → join against per-key aggregate):
    lineitems with quantity below 20% of their part's average. The inner
    aggregate is tiny (one row per part) and broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(per_part), li.l_partkey == per_part.pk)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small"),
            _dsum(F.col("l_extendedprice")).alias("small_revenue"),
        )
        .orderBy("l_partkey")
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS) + outer-join HAVING shape: customers with zero
    orders, counted per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: nations having BUILDING-segment customers INTERSECT
    nations having open orders, EXCEPT nations with a low-balance supplier."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    with_open = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    low_supp = supp.where(F.col("s_acctbal") < 0).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return building.intersect(with_open).subtract(low_supp).orderBy("nationkey")


def flatten_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-shaped nest→flatten round-trip (transform-seed semantics):
    nest lineitems per order into array<struct>, then flatten back with
    parent-field copy + catalogId promotion. Oracle: the plain join the
    round-trip must reproduce."""
    from ..operators.flatten import flatten, nest

    # subset of orders: the round-trip semantics are fully exercised while
    # the result stays result-transfer-light (the full-table variant is the
    # same plan; only the pushed-down filter differs)
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").alias("_id"),
        "l_partkey",
        "l_quantity",
    ).where(F.col("l_orderkey") % 10 == 0)
    nested = nest(li, ["l_orderkey"], ["_id", "l_partkey", "l_quantity"], array_col="items")
    nested = nested.join(orders, nested.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderkey").alias("_id"), "o_orderstatus", "o_totalprice", "items"
    )
    flat = flatten(
        nested,
        "items",
        parent_id_col="_id",
        parent_id_out="catalogId",
        child_alias="item",
        child_id_field=None,
    )
    return flat.select(
        "catalogId",
        "o_orderstatus",
        "o_totalprice",
        F.col("item._id").alias("line_id"),
        F.col("item.l_partkey").alias("l_partkey"),
        F.col("item.l_quantity").alias("l_quantity"),
    )
