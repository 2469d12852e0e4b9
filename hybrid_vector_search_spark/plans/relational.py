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

from ..sources import fan_out, load_table
from ..streaming.events import user_stream_window

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
        .join(cust, orders.o_custkey == cust.c_custkey)
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
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
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
    grand total). Two-phase since r13 (the cube_revenue design): plain
    groupBy first, ROLLUP over the ~6-row DECIMAL aggregate — Expand no
    longer triples the fact stream before the first aggregation; the
    associative decimal re-aggregation keeps it exact, double cast last."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_dec")
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("sum_dec").cast("double").alias("sum_base_price"))
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
        li.join(per_part, li.l_partkey == per_part.pk)
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


def _rev() -> Column:
    """Exact revenue term: extendedprice × (1 − discount), DECIMAL-exact."""
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


def shipping_priority(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: top-k revenue over a high-cardinality groupBy
    (one group per order). The two fact filters are pushed to the scans;
    customer is broadcast; the top-k runs on the aggregated (small) side."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joined in two roles —
    supplier nation and customer nation — with a symmetric pair predicate,
    grouped by both roles and ship year. Both nation copies broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional-aggregate ratio — NATION_3's share of
    PROMO-part revenue among EUROPE-region customers, per order year. The
    share is a ratio of two exact DECIMAL sums, so the double result is
    engine-independent (rounded to 6dp for the cross-engine hash)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    rev = _rev()
    nation_rev = F.sum(F.when(F.col("supp_nation") == "NATION_3", rev)).cast("double")
    total_rev = F.sum(rev).cast("double")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(F.coalesce(nation_rev, F.lit(0.0)) / total_rev, 6).alias(
                "mkt_share"
            ),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_year")
    )


def returned_items(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns in one
    quarter — mid-cardinality groupBy (per customer) with dimension
    attributes carried through the aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-WHEN conditional counts inside one aggregate —
    high- vs low-priority order lines per returnflag for one ship year
    (testdata has no l_shipmode/l_commitdate; returnflag plays the mode)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1999-01-01"))
        & (F.col("l_shipdate") < F.lit("2000-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage-of-total conditional aggregate over one
    ship month (PROMO parts' share of revenue). Single-row result; the
    part dimension is broadcast so the month of lineitem never shuffles."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-02-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _rev()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.coalesce(promo, F.lit(0.0)) / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def large_orders(spark: SparkSession, sf_dir: str, min_qty: float = 350.0) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a per-order aggregate, then join the
    qualifying (small) key set back to orders⋈customer. The aggregate side
    shrinks to a handful of keys and broadcasts into the second join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("bk"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions predicate spanning both join
    sides (brand × size × quantity bands). Catalyst extracts the common
    part-side disjuncts below the join; the result is a single-row sum."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cases = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(11, 20)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(21, 40)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cases)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE semantics (S4 incrementality at table grain):
    a simulated change set — status update for every 7th order, brand-new
    rows (negated keys) for every 13th — upserted into orders via
    sinks.merge_upsert (anti-join + union, one shuffle), then verified by
    an exact per-status rollup."""
    from ..sources.sinks import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    updates = orders.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_orderstatus", F.lit("X")
    )
    inserts = orders.where(F.col("o_orderkey") % 13 == 0).withColumn(
        "o_orderkey", -F.col("o_orderkey")
    ).withColumn("o_orderstatus", F.lit("N"))
    merged = merge_upsert(orders, updates.unionByName(inserts), ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


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


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery — for each mid-size part, the
    supplier(s) whose average unit price on that part is the part's minimum.
    Expressed as a window MIN over the per-(part,supplier) aggregate: one
    shuffle on l_partkey serves both the aggregate and the window, and the
    equality probe never leaves the partition (no join-back materialization).

    Determinism: unit cost = DECIMAL-exact sums divided once in double, so
    the MIN and the equality against it are bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size").between(10, 20))
    supp = load_table(spark, sf_dir, "supplier")
    per_ps = (
        li.join(part, li.l_partkey == part.p_partkey)
        # hash(p_partkey) satisfies ClusteredDistribution for BOTH the
        # (p_partkey, l_suppkey) aggregate and the window below — this single
        # explicit shuffle replaces the two Catalyst would otherwise insert
        .repartition(F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        per_ps.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose share of the global total exceeds a
    threshold (scalar subquery). The global total is DERIVED from the
    per-group aggregate (kept DECIMAL-exact, so re-summing is lossless)
    rather than re-scanning lineitem — AQE's ReuseExchange executes the
    per-part shuffle once and feeds both the HAVING probe and the one-row
    broadcast threshold. One fact-table scan total."""
    li = load_table(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice").cast(DEC)
    per_part = li.groupBy("l_partkey").agg(F.sum(value).alias("value_dec"))
    total = per_part.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.0001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts including
    zero — left outer join then two stacked aggregations. The second groupBy
    keys on the count itself (tiny domain), so the heavy shuffle happens
    once, on c_custkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the global maximum quarterly
    revenue — derived aggregate compared against its own one-row MAX
    (broadcast cross-join, no second scan of lineitem)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    # explicit isNotNull: the supplier join would push it into only the
    # probe branch, which breaks canonical equality of the two aggregate
    # subtrees and with it AQE's ReuseExchange
    li = li.where(F.col("l_suppkey").isNotNull())
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    # derived from rev, not a second lineitem scan: AQE ReuseExchange runs
    # the per-supplier shuffle once for both the probe and the MAX
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.round("total_revenue", 6).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute group,
    with a NOT-IN supplier exclusion (negative-balance suppliers stand in
    for the complaints list). The exclusion is a broadcast anti-join; the
    distinct count expands to a two-level aggregate on (group, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#5")
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == F.col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def lone_late_suppliers(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS against the same fact table —
    suppliers who were the ONLY late shipper on a multi-supplier finished
    order ("late" = shipped >90 days after the order date; the testdata has
    no commit/receipt dates). Instead of two correlated self-joins (three
    scans of lineitem), one pass aggregates per (order, supplier), a window
    over l_orderkey derives total vs late supplier counts, and the
    EXISTS/NOT-EXISTS become predicates on those counts — the oracle states
    the textbook formulation, proving the rewrite."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    is_late = (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).cast("int")
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # hash(l_orderkey) serves both the (order, supplier) aggregate and
        # the per-order window: one shuffle instead of two (same trick as
        # min_cost_supplier; subset partitioning satisfies the groupBy)
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(is_late).alias("late"),
            F.sum(is_late).alias("late_lines"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        per_os.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .where((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(k)
    )


def high_balance_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and no
    RECENT orders (scalar-subquery threshold + NOT EXISTS), rolled up per
    nation (nationkey stands in for the phone country code; every testdata
    customer has some order, so "inactive" = none since 1999-06-01). The
    average is a one-row broadcast; the NOT EXISTS is a left_anti join on
    o_custkey with the date filter pushed below it."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-06-01")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series window frame: 7-row trailing moving average over daily
    revenue for one ship year. Daily revenue stays DECIMAL-exact through the
    frame sum and divides once in double, so the moving average is
    bit-identical across engines. The global-ordered window runs on the
    ~365-row aggregate, never on the fact table."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("ship_day")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev_dec")
    )
    w = Window.orderBy("ship_day").rowsBetween(-6, 0)
    return (
        daily.select(
            # string key: Spark dates and DuckDB dates round-trip differently
            # through pandas; ISO text is canonical in both
            F.date_format("ship_day", "yyyy-MM-dd").alias("ship_day"),
            F.col("rev_dec").cast("double").alias("daily_revenue"),
            F.round(
                F.sum("rev_dec").over(w).cast("double") / F.count("*").over(w), 6
            ).alias("moving_avg_7d"),
        )
        .orderBy("ship_day")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-attesting HyperLogLog++ distinct count (r6 — the ANN recall
    pattern): per event type, the EXACT distinct count (oracle-verified
    value-for-value) plus the in-plan claim that the HLL estimate
    (rsd=0.02) lands within 5%. Sketch values are engine-specific, but the
    error CONTRACT is checkable — the oracle states hll_within_5pct=TRUE,
    so an estimator regression hash-fails the gate.

    At 100 TB the production path is the sketch alone (fixed-size mergeable
    state, no (type, user) shuffle); the exact side here is the verifier,
    exactly as the exact scorer verifies the ANN probes."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.lit(0.05) * F.col("exact_users")
            ).alias("hll_within_5pct"),
        )
        .orderBy("event_type")
    )


def hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch lifecycle (Datasketches HLL, `hll_sketch_agg` /
    `hll_union_agg`): per-event-type user sketches are built in one pass,
    then MERGED — never re-scanning raw rows — to answer the corpus-wide
    distinct-user question. This is the canonical 100 TB pre-aggregation
    shape: persist fixed-size sketch partials per partition/day at ingest,
    union at query time over the tiny sketch relation; the raw table is
    scanned once ever. The exact sides here are the verifiers (same
    self-attesting recipe as approx_distinct_users): exact totals are
    oracle-value-checked, and the in-plan claims pin BOTH estimators —
    each per-type sketch and the union-of-partials — within 5%, so a
    sketch or merge regression hash-fails the driver gate.

    The reference has no sketch surface at all (Atlas `$group` exact
    counts only, reference backend/api.py:187-204); this family is
    brief-driven scale engineering."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("_sk"),
        F.countDistinct("user_id").alias("_exact_t"),
    )
    merged = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(_sk, true))").alias("_union_est"),
        F.count("*").alias("n_types"),
        F.sum(
            (
                F.abs(F.expr("hll_sketch_estimate(_sk)") - F.col("_exact_t"))
                <= F.lit(0.05) * F.col("_exact_t")
            ).cast("int")
        ).alias("n_types_within_5pct"),
    )
    exact_total = events.agg(F.countDistinct("user_id").alias("exact_total_users"))
    return (
        merged.crossJoin(F.broadcast(exact_total))
        .select(
            "n_types",
            "n_types_within_5pct",
            "exact_total_users",
            (
                F.abs(F.col("_union_est") - F.col("exact_total_users"))
                <= F.lit(0.05) * F.col("exact_total_users")
            ).alias("union_within_5pct"),
        )
    )


def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from DAILY HLL PARTIALS: the
    raw table aggregates once into one fixed-size sketch per day, and every
    window answer is a union over ≤7 sketch rows — COUNT(DISTINCT) OVER a
    range window without re-scanning raw data per window (which no engine
    can do exactly without quadratic re-reads; sketch partials are the
    standard substitute at warehouse scale). The windowing self-join runs on
    the days×days spine (30 rows here, ~years of rows in production — always
    broadcastable), never on events.

    Self-attesting: exact per-window distincts (oracle value-checked) come
    from a raw range join — the VERIFIER, not the scale path — and the
    in-plan claim pins every window's union estimate within 5%."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("pday")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("_sk")
    )
    days = daily.select(F.col("pday").alias("day"))
    est = (
        days.join(
            F.broadcast(daily),
            (F.col("pday") <= F.col("day"))
            & (F.col("pday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(_sk, true))").alias("_est"),
            F.count("*").alias("n_days_in_window"),
        )
    )
    ev_days = events.select(F.to_date("ts").alias("pday"), "user_id")
    exact = (
        ev_days.join(
            F.broadcast(days),
            (F.col("pday") <= F.col("day"))
            & (F.col("pday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_users_7d"))
    )
    return (
        est.join(exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_days_in_window",
            "exact_users_7d",
            (
                F.abs(F.col("_est") - F.col("exact_users_7d"))
                <= F.lit(0.05) * F.col("exact_users_7d")
            ).alias("hll_within_5pct"),
        )
        .orderBy("day")
    )


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts on the co-purchase graph (parts sharing an
    order), via operators.graph.triangle_count's degree-ordered orientation
    — wedges enumerate only at each triangle's lowest-(degree, id) vertex,
    the skew cap that makes triangle counting survive power-law graphs at
    100 TB (Suri & Vassilvitskii, WWW 2011). Scoped to one ship-date
    quarter — the filter reaches the parquet scan, and a 100 TB deployment
    would run per time slice the same way. Edge build is one distinct
    self-join on the order key; everything downstream joins on part keys
    with the tiny degree relation broadcast by AQE."""
    from ..operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-04-01")
    )
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    o2 = op.select(F.col("o"), F.col("p").alias("p2"))
    edges = (
        op.join(o2, "o")
        .where(F.col("p") < F.col("p2"))
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )
    return triangle_count(edges).orderBy("node")


def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend (slope + intercept) of daily order revenue over
    the order-date axis, from DECIMAL-EXACT sufficient statistics.

    The one-liner is ``regr_slope(y, x)`` (Spark and DuckDB both ship it),
    but its double-precision running sums accumulate in partition order —
    run-to-run nondeterministic on a cluster, and never bit-comparable
    across engines. The scale-correct form aggregates the five sufficient
    statistics exactly — n, Σx, Σx² (integers: x is a day index), Σy, Σxy
    (DECIMAL: y is money) — in ONE associative pass, then evaluates
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) in float AT THE END: identical
    exact inputs + one identical expression ⇒ bit-stable at any
    partitioning, any engine. Same discipline as every money aggregate in
    this repo (SCALE.md, Determinism)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "o_orderdate")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("y"))
        .select(
            "n_name",
            F.datediff("o_orderdate", F.lit("1992-01-01")).cast("long").alias("x"),
            "y",
        )
    )
    stats = daily.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(10,0)") * F.col("y")).alias("sxy"),
    )
    n, sx, sxx = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, sxy = F.col("sy").cast("double"), F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return stats.select(
        "n_name",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    ).orderBy("n_name")


def hll_event_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: |A∩B| for two cohorts (clicked on Jan 5 ∩
    purchased on Jan 20 — single-day cohorts so the overlap is a real
    fraction, not the whole user base) estimated by inclusion-exclusion
    over three HLL sketches — est(A) + est(B) − est(A∪B) — where A, B and
    their union all come from ONE pass with FILTER-clause sketch
    aggregates, and the union sketch is the scalar `hll_union` of the two
    partials (never a re-scan). This is the audience-overlap question at
    100 TB: cohort sketches are precomputed per segment/day, and any
    pairwise overlap is answered from the sketch store alone.

    Self-attesting like every sketch row here: the exact cohort sizes and
    exact overlap (one distinct-user flag pass) are oracle value-checked;
    the in-plan claim pins the I-E estimate within 5% of the exact overlap
    (I-E inherits ~3 sketches' error — the bound still holds with margin
    at calibrated lgK=14)."""
    events = load_table(spark, sf_dir, "events")
    in_a = (F.col("event_type") == "click") & (F.to_date("ts") == F.lit("2024-01-05"))
    in_b = (F.col("event_type") == "purchase") & (F.to_date("ts") == F.lit("2024-01-20"))
    flags = events.groupBy("user_id").agg(
        F.max(in_a.cast("int")).alias("a"), F.max(in_b.cast("int")).alias("b")
    )
    exact = flags.agg(
        F.sum("a").alias("exact_a"),
        F.sum("b").alias("exact_b"),
        F.sum((F.col("a") * F.col("b"))).alias("exact_overlap"),
    )
    sk = events.agg(
        F.expr(
            "hll_sketch_agg(user_id, 14) FILTER "
            "(WHERE event_type = 'click' AND to_date(ts) = DATE'2024-01-05')"
        ).alias("ska"),
        F.expr(
            "hll_sketch_agg(user_id, 14) FILTER "
            "(WHERE event_type = 'purchase' AND to_date(ts) = DATE'2024-01-20')"
        ).alias("skb"),
    ).select(
        F.expr("hll_sketch_estimate(ska)").alias("_ea"),
        F.expr("hll_sketch_estimate(skb)").alias("_eb"),
        F.expr("hll_sketch_estimate(hll_union(ska, skb, true))").alias("_eu"),
    )
    return exact.crossJoin(F.broadcast(sk)).select(
        "exact_a",
        "exact_b",
        "exact_overlap",
        (
            F.abs((F.col("_ea") + F.col("_eb") - F.col("_eu")) - F.col("exact_overlap"))
            <= F.lit(0.05) * F.col("exact_overlap")
        ).alias("ie_within_5pct"),
    )


def approx_topk_users(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Datasketches frequent-items (`approx_top_k`) attested against the
    exact heavy hitters — the third sketch family (count-min: operators/
    sketch.py; HLL: the distinct suite; frequent-items: here). Sized so the
    attestation is deterministic: maxItemsTracked ≥ the distinct-user count
    makes every sketch count EXACT, and the sketch list is requested with
    +200 slack so boundary TIES (the sketch breaks them arbitrarily; the
    exact side by (count DESC, user ASC)) cannot evict a tied item. Each
    exact top-k row then claims: my user appears in the sketch list with
    exactly my count. At 100 TB the sketch is the only side that runs —
    fixed-size, mergeable, one pass — and the exact side is the verifier,
    as everywhere in this suite."""
    events = load_table(spark, sf_dir, "events")
    exact = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(k)
    )
    # maxItemsTracked is DERIVED from the actual distinct-user count (one
    # cheap column-pruned pre-pass), not hard-coded: the oracle's
    # sketch_count_exact=TRUE is only valid while tracked ≥ distinct users,
    # and a fixed 100k would turn a larger SF into a guaranteed hash-fail
    # (flake by data volume, not regression). 2× headroom keeps the
    # exactness precondition safe under growth within a run; the exact side
    # already does a full groupBy, so this pre-pass never dominates.
    n_users = events.select("user_id").distinct().count()
    # Spark caps approx_top_k's maxItemsTracked at 1,000,000 — an uncapped
    # 2*n_users THROWS once distinct users pass ~500k, the very
    # data-volume flake the derivation avoids. Clamp to the engine cap and
    # warn when the exactness precondition (tracked >= n_users) is gone:
    # past that scale the sketch degrades gracefully (approximate counts)
    # instead of erroring, and the attestation column reports it honestly.
    _SPARK_TRACKED_CAP = 1_000_000
    tracked = min(_SPARK_TRACKED_CAP, max(100_000, 2 * n_users))
    if tracked < n_users:
        import warnings

        warnings.warn(
            f"approx_topk_users: {n_users} distinct users exceed "
            f"maxItemsTracked={tracked} (engine cap {_SPARK_TRACKED_CAP}); "
            f"sketch counts are now approximate and sketch_count_exact may "
            f"be false for tied/boundary items.",
            stacklevel=2,
        )
    sketch = events.agg(
        F.expr(f"approx_top_k(user_id, {k} + 200, {tracked})").alias("tk")
    ).select(
        F.map_from_arrays(
            F.expr("transform(tk, x -> x.item)"),
            F.expr("transform(tk, x -> x.count)"),
        ).alias("_m")
    )
    return (
        exact.crossJoin(F.broadcast(sketch))
        .select(
            "user_id",
            "n_events",
            (F.col("_m")[F.col("user_id")] == F.col("n_events")).alias(
                "sketch_count_exact"
            ),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
    )


def user_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval union: each event opens a span of
    ceil(value)·10 seconds; overlapping spans per user MERGE into islands
    (coverage dedup — the watch-time / session-coverage question, where
    summing raw durations double-counts overlap). One window pass per
    step, all sharing a single hashpartitioning(user_id) exchange: a span
    starts a new island iff it begins after the running max of prior ends
    (island id = running sum of those flags), then islands aggregate to
    per-user coverage. Integer-second arithmetic end to end, so both
    engines agree exactly."""
    events = load_table(spark, sf_dir, "events")
    spans = events.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + F.ceil(F.col("value")).cast("long") * 10).alias("e"),
    )
    w_order = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "_new",
        F.when(prev_max_end.isNull() | (F.col("s") > prev_max_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("_new").over(w_order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        F.min("s").alias("i_start"), F.max("e").alias("i_end")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(F.col("i_end") - F.col("i_start")).alias("covered_seconds"),
        )
        .orderBy("user_id")
    )


def approx_sum_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BlinkDB-style sampling estimator: total order revenue from a
    deterministic 10% hash sample, inverse-probability scaled
    (Horvitz–Thompson — sample_sum / p is unbiased for the population
    sum). The sample membership is the engine's md5-bucket contract, so
    the estimate is a pure function of the data — the attestation cannot
    flake — and at 100 TB the sample IS the query (read 10% of the rows
    for a bounded-error answer; relative error shrinks as 1/√n: measured
    6.2% → 2.1% → 0.8% across the three SFs, floor set at 10%). Exact
    total and counts are the oracle-checked verifiers, as everywhere."""
    orders = load_table(spark, sf_dir, "orders")
    in_sample = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ht#"), F.col("o_orderkey").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 10000
        < 1000
    )
    agg = orders.agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("_exact"),
        F.sum(F.when(in_sample, F.col("o_totalprice").cast(DEC))).alias("_ssum"),
        F.sum(in_sample.cast("long")).alias("n_sampled"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        F.round(F.col("_exact").cast("double"), 2).alias("exact_total"),
        "n_orders",
        "n_sampled",
        (
            F.abs(F.col("_ssum").cast("double") / 0.1 - F.col("_exact").cast("double"))
            <= F.lit(0.10) * F.col("_exact").cast("double")
        ).alias("ht_within_10pct"),
    )


def ivm_revenue_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators.ivm) driven through a full
    add + retract chain: the (priority, month) revenue view is built from
    the base 80% of orders, a 20% insert batch folds in, then a 4%-of-base
    slice retracts as negated partials — three view-sized merges, zero
    base-table rescans. The oracle recomputes (base − retracted) ∪ inserts
    from scratch: decimal partials make maintenance associative, so the
    maintained view hash-equals the recompute, including the derived
    (non-additive) average read off the (sum, count) pair."""
    from ..operators import ivm

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_totalprice",
    )
    keys = ["o_orderpriority", "month"]
    base = orders.where(F.col("o_orderkey") % 5 != 0)
    inserts = orders.where(F.col("o_orderkey") % 5 == 0)
    retracted = base.where(F.col("o_orderkey") % 25 == 1)
    view = ivm.partials(base, keys, "o_totalprice")
    view = ivm.merge(view, ivm.partials(inserts, keys, "o_totalprice"))
    view = ivm.merge(view, ivm.partials(retracted, keys, "o_totalprice", negate=True))
    return ivm.finish(view).orderBy(*keys)


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: revenue over all 2^2 combinations of
    (returnflag, linestatus) with grouping_id distinguishing the subtotal
    level.

    Two-phase plan: a plain groupBy on the FULL key first (map-side
    partial, fact rows cross the wire once), then CUBE over the ~6-row
    aggregate — Expand otherwise multiplies every fact row by the number
    of grouping sets (4×) before the shuffle, which at 100 TB turns one
    scan's worth of shuffle into four. Associative DECIMAL sums make the
    re-aggregation exact, so the rewrite is semantics-preserving
    (measured 2.7s → ~0.6s at sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), F.sum(_rev()).alias("rev_dec")
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            # empty-input parity with the single-phase shape (see
            # revenue_rollup): count(*) over nothing is 0, sum('cnt') NULL
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_lines"),
            F.sum("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) decile stats over event values. The tile assignment needs a
    TOTAL order — (value, event_id) — otherwise ties straddle tile borders
    nondeterministically across engines and runs. Global-sort window over
    the fact table; at 100 TB the same stats come from approx quantile cuts
    (value_percentiles query) without the total sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    tiled = ev.select(
        "value", F.ntile(10).over(w).alias("decile")
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .orderBy("decile")
    )


def value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-attesting Greenwald-Khanna quantile sketch (r6 — the ANN recall
    pattern): the EXACT interpolated percentiles (oracle-verified — Spark's
    `percentile` matches DuckDB's quantile_cont bit-for-bit, proven by the
    value_percentiles query) plus in-plan booleans asserting each
    percentile_approx cut point sits within 0.02% RANK error of its target
    (accuracy=10000 ⇒ eps=1e-4; bound doubled for tie slack). Sketch cut
    values are engine-specific, but the GK error contract is checkable —
    the oracle states the booleans TRUE.

    At 100 TB the sketch is the production path (fixed-size mergeable
    summaries, no global sort); the second pass computing ranks-of-cuts is
    the verifier."""
    ev = load_table(spark, sf_dir, "events").select("value")
    sk = (
        ev.agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("ap")
        )
        .select(
            F.col("ap")[0].alias("_a50"),
            F.col("ap")[1].alias("_a90"),
            F.col("ap")[2].alias("_a99"),
        )
    )
    joined = ev.crossJoin(F.broadcast(sk))
    eps = 2.0 / 10000

    def rank_ok(cut_col: str, q: float):
        n = F.count("*")
        n_le = F.sum((F.col("value") <= F.col(cut_col)).cast("long"))
        n_lt = F.sum((F.col("value") < F.col(cut_col)).cast("long"))
        return (n_le >= (F.lit(q) - F.lit(eps)) * n) & (
            n_lt <= (F.lit(q) + F.lit(eps)) * n
        )

    return joined.agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count("*").alias("n"),
        rank_ok("_a50", 0.5).alias("p50_ok"),
        rank_ok("_a90", 0.9).alias("p90_ok"),
        rank_ok("_a99", 0.99).alias("p99_ok"),
    )


def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint sweep over orders (operators.constraints):
    null / domain / regex / range row checks folded into ONE aggregate
    pass, key-uniqueness as one groupBy, and referential integrity against
    the active-customer relation (positive balance) as a broadcast anti
    join — the report is (constraint, n_violations), one row per check.
    The range and FK checks are chosen to have NONZERO natural violations
    so the sweep's counting is actually exercised."""
    from ..operators import constraints as C

    orders = load_table(spark, sf_dir, "orders")
    active = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    report = C.validate(
        orders,
        [
            C.not_null("o_custkey"),
            C.in_range("o_totalprice", 0, 300_000),
            C.accepted_values("o_orderstatus", ["O", "F", "P"]),
            C.matches("o_orderpriority", "^[1-5]-"),
            C.unique("o_orderkey"),
            C.foreign_key("o_custkey", active, "c_custkey", "active_customer"),
        ],
    )
    return report.orderBy("constraint")


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type event-value stats: clip (winsorize) each value into
    its type's [P5, P95] band, then aggregate — the standard
    outlier-resistant mean for telemetry/reward columns whose tails are
    garbage. The raw mean is emitted next to the winsorized one so the
    outlier impact is the visible delta.

    ONE exchange: the exact percentiles are window aggregates over
    partitionBy(event_type), and the subsequent groupBy(event_type) reuses
    that hash partitioning (no second Exchange — pinned in test_plans).
    Means are exact decimal sums of 6-dp-rounded clipped values divided as
    double — bit-identical across engines and executor counts. Exact
    percentile is the bench-scale choice; at 100 TB swap the window for
    percentile_approx bounds (value_percentiles_approx is that twin).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    bounded = ev.select(
        "event_type",
        "value",
        F.expr("percentile(value, 0.05)").over(w).alias("p05"),
        F.expr("percentile(value, 0.95)").over(w).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    dec = lambda c: F.round(c, 6).cast("decimal(18,6)")  # noqa: E731
    return (
        bounded.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("p05"), 6).alias("p05"),
            F.round(F.any_value("p95"), 6).alias("p95"),
            F.sum(dec(clipped)).alias("_sw"),
            F.sum(dec(F.col("value"))).alias("_sr"),
        )
        .select(
            "event_type",
            "n",
            "p05",
            "p95",
            F.round(F.col("_sw").cast("double") / F.col("n"), 6).alias("mean_winsorized"),
            F.round(F.col("_sr").cast("double") / F.col("n"), 6).alias("mean_raw"),
        )
        .orderBy("event_type")
    )


def revenue_calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily revenue: a generated date spine (sequence + explode —
    no driver-side loop, the spine is one row exploded JVM-side) left-joined
    to the daily aggregate so zero-revenue days appear explicitly. The spine
    side is trivially small; the aggregate is the only fact-table work."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-03-01"))
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-02-28").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    )
    return (
        spine.join(daily, "d", "left_outer")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("ship_day"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        )
        .orderBy("ship_day")
    )


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report) window: each nation's share of
    global revenue — an unpartitioned window SUM over the 25-row aggregate,
    never over the fact table. DECIMAL totals keep the ratio bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).alias("rev_dec"))
    )
    w = Window.partitionBy()
    return per_nation.select(
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.round(
            F.col("rev_dec").cast("double") / F.sum("rev_dec").over(w).cast("double"),
            6,
        ).alias("share"),
    ).orderBy("n_name")


def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style compaction: keep each user's latest event (row_number over
    ts DESC with event_id tie-break). The shuffle carries only the projected
    columns; at table scale this is the standard changelog → snapshot step."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


def value_histogram(spark: SparkSession, sf_dir: str, buckets: int = 20) -> DataFrame:
    """Fixed-width histogram via width_bucket over data-derived bounds. The
    1-row min/max aggregate joins back BROADCAST instead of a driver-side
    .first() — everything stays one lazy, composable plan (no eager job at
    build time; the bounds pass is map-side partials + a 1-row exchange).
    Bucket counts are a plain groupBy — the histogram never sorts."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return (
        ev.join(F.broadcast(bounds))
        .select(
            F.width_bucket("value", F.col("lo"), F.col("hi"), F.lit(buckets)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def union_evolved_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution union: merge corpora whose schemas drifted —
    documents plus a derived feed carrying an extra column — via
    unionByName(allowMissingColumns=True); missing columns null-fill. The
    post-union rollup proves both sides landed (the everyday operation when
    consolidating crawl generations)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    evolved = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "lang",
            F.lit("recrawl").alias("source"),
            "n_chars",
            F.lit(2).cast("int").alias("crawl_gen"),
        )
    )
    merged = docs.unionByName(evolved, allowMissingColumns=True)
    return (
        merged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("crawl_gen", F.lit(1)).cast("long")).alias("gen_sum"),
        )
        .orderBy("source")
    )


def purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead/lag gap analysis: time between consecutive purchases per user,
    aggregated to per-user gap stats. The lag runs inside the per-user
    window partition (one shuffle on user_id); epoch arithmetic keeps the
    gaps integral and engine-exact."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = user_stream_window()
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_sec"),
    ).where(F.col("gap_sec").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_sec").alias("min_gap"),
            F.max("gap_sec").alias("max_gap"),
            F.sum("gap_sec").alias("total_gap"),
        )
        .orderBy("user_id")
    )


def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): wide per-flag revenue columns back to long
    (measure, value) rows — the inverse of pivot, constant-folded JVM-side
    (each input row emits k rows, no shuffle until the final rollup)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        _dsum(F.col("l_extendedprice")).alias("base_price"),
        _dsum(F.col("l_quantity")).alias("quantity"),
        F.sum(F.col("l_tax").cast("decimal(18,2)")).cast("double").alias("tax"),
    )
    return (
        wide.select(
            "l_returnflag",
            F.expr(
                "stack(3, 'base_price', base_price, 'quantity', quantity, 'tax', tax)"
            ).alias("measure", "value"),
        )
        .orderBy("l_returnflag", "measure")
    )


def order_price_ranks(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """The rank-function family in one window: rank (gaps), dense_rank
    (no gaps), percent_rank ((rank-1)/(n-1), exact double both engines) over
    order price per market segment, top-k per segment. One shuffle on the
    segment key; the limit applies per group via the row-number filter."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        joined.select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        )
        .where(F.col("rn") <= k)
        .orderBy("c_mktsegment", "rn")
    )


def segment_conditional_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregation: several differently-filtered
    aggregates in ONE pass over orders (no self-joins, no re-scans) — the
    idiom that replaces N separate filtered queries at warehouse scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    open_ = F.col("o_orderstatus") == "O"
    big = F.col("o_totalprice") > 200000.0
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_if(urgent).alias("n_urgent"),
            F.count_if(open_).alias("n_open"),
            F.sum(F.when(big, F.col("o_totalprice").cast(DEC))).cast("double").alias(
                "big_order_value"
            ),
        )
        .orderBy("c_mktsegment")
    )


def events_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part rollup (day-of-week × hour heatmap input): purchase counts
    and exact value sums per (dow, hour) — 168 groups, map-side partial."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow"),  # 1=Sunday..7 (Spark convention)
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .orderBy("dow", "hour")
    )


def segment_nation_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: per market segment, the sorted list
    of customer nations. collect_set alone is partition-order-dependent —
    sort_array makes the nested value canonical (the rule for ANY
    array-valued aggregate that must be reproducible across runs and
    engines); joined to CSV here so both engines compare as scalars."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
            F.count_distinct("n_name").alias("n_nations"),
        )
        .orderBy("c_mktsegment")
    )


def daily_revenue_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) totals: per-day revenue and its running sum over
    one ship year. The cumulative frame runs on the ~365-row daily aggregate
    (kept DECIMAL-exact through the frame), never on the fact table."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev_dec")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("ship_day"),
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("running_total"),
    ).orderBy("ship_day")


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (flag → flag×status → grand total)
    in ONE aggregate: Spark expands the grouping sets inside a single
    Expand + HashAggregate over one pass of the fact table — three
    groupBy+union jobs collapsed to one scan and one exchange.
    grouping_id() (``lvl``) disambiguates subtotal rows from real groups so
    NULL never overloads two meanings.

    Two-phase since r13 (the cube_revenue design): a plain groupBy on the
    full key first (map-side partial; fact rows cross the wire once), then
    ROLLUP over the ~6-row aggregate — Expand otherwise multiplies every
    fact row by the number of grouping sets (3×) BEFORE the first
    aggregation, tripling the heaviest stage's input. Associative DECIMAL
    re-aggregation keeps the rewrite exact (measured 2.1 s → ~0.9 s at
    sf0.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), F.sum(disc_price).alias("rev_dec")
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("lvl"),
            # coalesce: over EMPTY input the grand-total row's sum('cnt') is
            # NULL where the single-phase rollup's count(*) was 0 (r13
            # advice); unreachable with real data, 0-cost to restore parity
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_items"),
            # round to cents IN THE DECIMAL DOMAIN and narrow to an
            # int64-backed decimal before the double cast: the grand-total
            # row needs >16 significant digits at full scale, where
            # decimal->double conversion is allowed to differ by 1 ulp
            # across engines; a DECIMAL(18,2) converts with one rounding
            F.round(F.sum("rev_dec"), 2)
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue"),
        )
        .select(
            # subtotal rows label their rolled-up column 'ALL' instead of
            # NULL (lvl already disambiguates; the label keeps the output
            # null-free so no engine's NULL representation leaks into it)
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "lvl",
            "n_items",
            "revenue",
        )
        .orderBy("lvl", "l_returnflag", "l_linestatus")
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel view → click → purchase with a 1-hour step window:
    for each user, the first view, the first click within an hour OF THAT
    VIEW, and the first purchase within an hour of that click; output is
    users-reaching-stage counts.

    Plan shape: ONE exchange on user_id serves all three stages — the three
    window passes share the same partitioning (Catalyst reuses the
    exchange), each stage's timestamp is a conditional min over the user
    partition referencing the previous stage's column. No per-stage
    self-joins, no fact-table re-shuffles; the funnel depth extends by
    adding window columns, not joins — the 100 TB-friendly funnel shape.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    hour = F.expr("INTERVAL 1 HOUR")
    x = ev.select("user_id", "event_type", "ts").withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    x = x.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t_view"))
                & (F.col("ts") <= F.col("t_view") + hour),
                F.col("ts"),
            )
        ).over(w),
    )
    x = x.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_click"))
                & (F.col("ts") <= F.col("t_click") + hour),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = x.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    return counts.select(
        F.expr(
            "stack(3, 1, 'view', n_view, 2, 'click', n_click,"
            " 3, 'purchase', n_purchase) AS (stage_idx, stage, n_users)"
        )
    ).orderBy("stage_idx")


def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-baseline rate anomaly detection: per (event_type, hour),
    compare the hourly event count against the average of the previous 24
    observed hours of that type, and flag ratio >= 2 as a spike — the
    simplest production traffic-anomaly radar, expressed entirely in window
    functions (no state, no Python).

    Ratio arithmetic is exact-count division (integers in double), so the
    DuckDB oracle matches bit-for-bit; a stddev-based z-score would hinge on
    cross-engine variance accumulation order instead. Scale: one groupBy
    (type, hour) shuffle over narrow columns, then a per-type window —
    cardinality = types x hours, tiny regardless of event volume. Returns
    only hours with a full 24-hour trailing baseline.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    out = hourly.select(
        "event_type",
        "hour",
        "n",
        F.count("n").over(w).alias("_n_base"),
        F.round(F.avg("n").over(w), 4).alias("trailing_avg"),
    )
    return (
        out.where(F.col("_n_base") == 24)
        .withColumn("ratio", F.round(F.col("n") / F.col("trailing_avg"), 4))
        .withColumn("is_spike", F.col("ratio") >= 2.0)
        .drop("_n_base")
        .orderBy("event_type", "hour")
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def orders_profile_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row exact statistics relation both profile reports unpivot
    from (``profiling.profile_aggregates``) — computed once and persisted
    by the entry-file cache so the count-distinct Expand scan is shared
    between ``orders_profile`` and ``orders_profile_approx`` (the ANN-trio
    shared-exact-pass recipe)."""
    from ..operators.profiling import profile_aggregates

    orders = load_table(spark, sf_dir, "orders")
    # single-split local fixture -> fan the Expand/count-distinct work
    # across cores (cluster inputs arrive pre-split; same note as
    # pipeline.doc_chunks)
    orders = orders.repartition(spark.sparkContext.defaultParallelism)
    return profile_aggregates(orders, _PROFILE_COLS)


def orders_profile(
    spark: SparkSession, sf_dir: str, *, exact_agg: DataFrame | None = None
) -> DataFrame:
    """One-pass column profile of the orders table (operators/profiling.py):
    per column, rows/nulls/distincts/min/max — the ingest-time report every
    new drop gets before processing. All statistics live in ONE aggregate
    (count-distinct Expand), unpivoted to a columns-sized relation; the
    DuckDB oracle reproduces the canonical stringification byte-for-byte."""
    from ..operators.profiling import profile_table

    orders = load_table(spark, sf_dir, "orders")
    orders = orders.repartition(spark.sparkContext.defaultParallelism)
    return profile_table(orders, _PROFILE_COLS, exact_agg=exact_agg).orderBy(
        "column"
    )


def orders_profile_approx(
    spark: SparkSession, sf_dir: str, *, exact_agg: DataFrame | None = None
) -> DataFrame:
    """Self-attesting HLL profile of the orders table — the SCALE default
    made driver-visible (r6 verdict ask #4). At 100 TB the exact
    count-distinct's Expand fan-out costs k× the scan rows in
    partial-aggregate input, so the production report runs HLL++ alone;
    this row earns trust in that default the approx_distinct_users way:
    exact counts value-checked by the oracle, plus a per-column in-plan
    claim that the rsd=0.02 estimate lands within 5% — the oracle states
    approx_within_tol=TRUE, so an estimator regression hash-fails the
    gate instead of hiding in pytest. With ``exact_agg`` (the persisted
    shared pass) this query costs only the HLL scan."""
    from ..operators.profiling import profile_table

    orders = load_table(spark, sf_dir, "orders")
    orders = orders.repartition(spark.sparkContext.defaultParallelism)
    return profile_table(
        orders, _PROFILE_COLS, attest_rsd=0.02, exact_agg=exact_agg
    ).orderBy("column")


def events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier radar per event type: the modified
    z-score 0.6745·(v − median)/MAD with the standard |z| > 3.5 outlier
    cut (Iglewicz & Hoaglin) — the winsorized query's sibling for when the
    tail should be COUNTED, not clipped. Two same-key windows share one
    event_type exchange; z is a fixed chain of IEEE double ops both
    engines evaluate identically, so even the boundary comparison is
    engine-exact. Exact percentiles are the bench-scale choice; at 100 TB
    swap in approx_percentile bounds (the value_percentiles_approx twin)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    base = ev.select(
        "event_type",
        "value",
        F.expr("percentile(value, 0.5)").over(w).alias("med"),
    )
    scored = base.select(
        "event_type",
        "value",
        "med",
        F.expr("percentile(abs(value - med), 0.5)").over(w).alias("mad"),
    )
    az = F.when(
        F.col("mad") > 0,
        F.abs(F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")),
    ).otherwise(F.lit(0.0))
    return (
        scored.withColumn("az", az)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.expr("any_value(med)"), 6).alias("median_value"),
            F.round(F.expr("any_value(mad)"), 6).alias("mad"),
            F.sum((F.col("az") > 3.5).cast("long")).alias("n_outliers"),
            F.round(F.max("az"), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit measure), adapted to the
    testdata's columns: the testdata has no partsupp/ps_supplycost, so cost
    is proxied as 60% of p_retailprice per unit. Profit per (supplier
    nation, order year) over parts whose name contains 'gear':
    sum(extendedprice·(1-discount) − 0.6·retailprice·quantity), DECIMAL-
    exact so the double result is engine- and order-independent.

    Plan shape: part filter pushed to its scan, part/supplier/nation
    broadcast, lineitem-orders is the one fact shuffle, two-level partial
    aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("gear"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = _rev() - (
        F.lit("0.6").cast(DEC)
        * F.col("p_retailprice").cast(DEC)
        * F.col("l_quantity").cast(DEC)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(F.sum(amount).cast("double"), 2).alias("profit"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


def excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion), adapted: suppliers who
    shipped MORE THAN 30% of the total 1996 shipped quantity of at least
    one 'small'-named part — the nested IN/semi-join pattern (per-(part,
    supplier) aggregate compared against a per-part threshold, then a
    semi-join up to supplier names).

    Plan shape: one (partkey, suppkey) aggregate; the per-part total
    derives FROM that aggregate (window over partkey — no second lineitem
    pass); qualifying suppkeys semi-join into the broadcast supplier
    relation."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("small"))
    supp = load_table(spark, sf_dir, "supplier")
    per_ps = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    qualifying = (
        per_ps.withColumn("part_total", F.sum("qty").over(w))
        .where(F.col("qty") > F.lit("0.3").cast(DEC) * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for part pairs
    co-occurring in >= 3 orders, support / confidence / lift. The classic
    co-purchase recommender primitive (and the lift-weighted cousin of
    copurchase_triangles' structural view).

    Scale: the only self-join is WITHIN an order key — shuffle partitions
    by l_orderkey and the pair fan-out per order is C(basket, 2) with
    basket ~ a few lineitems, so work is linear in orders, never all-pairs
    across parts. Part marginals broadcast onto the pair relation (a few
    thousand rows). Counts are exact integers; the three ratios are the
    only floats, rounded to 6 dp with N carried as an exact BIGINT literal
    via crossJoin of the 1-row total."""
    li = load_table(spark, sf_dir, "lineitem")
    # the distinct basket relation feeds four consumers (order count, part
    # marginals, both self-join sides); localCheckpoint computes the
    # lineitem distinct once instead of per consumer subtree (r13).
    # eager=False (r14): materializes at the first action, keeping the
    # distinct job inside the timed exec window (same one-time compute).
    baskets = (
        li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(eager=False)
    )
    n_orders = baskets.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    part_orders = baskets.groupBy("l_partkey").agg(F.count("*").alias("n_ord"))
    a = baskets.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_both"))
        .where(F.col("n_both") >= 3)
    )
    enriched = (
        pairs.join(
            part_orders.select(F.col("l_partkey").alias("part_a"),
                               F.col("n_ord").alias("n_a")),
            "part_a",
        )
        .join(
            part_orders.select(F.col("l_partkey").alias("part_b"),
                               F.col("n_ord").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    return (
        enriched.select(
            "part_a",
            "part_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.round(F.col("n_both") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_both") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                (F.col("n_both") * F.col("n_orders"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(25)
    )


def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: for every purchase event, the
    user's FIRST and MOST RECENT preceding non-purchase event types, then
    purchase counts per (first_touch, last_touch) pair — the standard
    marketing-attribution rollup.

    Formulated with integer window maxima so both engines agree without
    IGNORE NULLS support: events get a per-user row_number rn ordered by
    (ts, event_id); running min/max over rn of non-purchase rows strictly
    before the current row identify the touch rows; two (user_id, rn)
    self-equi-joins fetch their types. One shuffle by user_id for the
    window, then two co-partitioned joins on the same key — no extra
    exchange shape at scale; purchases with no prior touch roll up as
    'none'."""
    ev = load_table(spark, sf_dir, "events")
    w = user_stream_window()
    prior = Window.partitionBy("user_id").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, -1
    )
    npr = F.when(F.col("event_type") != "purchase", F.col("rn"))
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    marked = ranked.select(
        "user_id",
        "event_type",
        "rn",
        F.min(npr).over(prior).alias("first_rn"),
        F.max(npr).over(prior).alias("last_rn"),
    )
    purchases = marked.where(F.col("event_type") == "purchase").select(
        "user_id", "first_rn", "last_rn"
    )
    first_types = ranked.select(
        F.col("user_id").alias("f_uid"),
        F.col("rn").alias("f_rn"),
        F.col("event_type").alias("first_type"),
    )
    last_types = ranked.select(
        F.col("user_id").alias("l_uid"),
        F.col("rn").alias("l_rn"),
        F.col("event_type").alias("last_type"),
    )
    attributed = (
        purchases.join(
            first_types,
            (purchases.user_id == first_types.f_uid)
            & (purchases.first_rn == first_types.f_rn),
            "left",
        )
        .join(
            last_types,
            (purchases.user_id == last_types.l_uid)
            & (purchases.last_rn == last_types.l_rn),
            "left",
        )
        .select(
            F.coalesce(F.col("first_type"), F.lit("none")).alias("first_touch"),
            F.coalesce(F.col("last_type"), F.lit("none")).alias("last_touch"),
        )
    )
    return (
        attributed.groupBy("first_touch", "last_touch")
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("first_touch", "last_touch")
    )


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by their FIRST signup week,
    activity bucketed into whole weeks since that signup, retention =
    distinct active users / cohort size — the standard growth-analytics
    triangle, weeks 0..8.

    Scale: the cohort relation is one row per signed-up user — it grows
    with the corpus, so the join onto the event stream carries no broadcast
    hint (AQE broadcasts while it measures small, shuffles on user_id at
    scale); the activity aggregate shuffles (cohort_week,
    week_k, user) once for the distinct, then a tiny rollup. Day
    arithmetic is integer end-to-end (datediff // 7), so bucket boundaries
    are engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
        .withColumn(
            "cohort_week",
            F.date_format(F.date_trunc("week", F.col("cohort_day")), "yyyy-MM-dd"),
        )
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    activity = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_day")) / 7
            ).cast("int").alias("week_k"),
        )
        .where((F.col("week_k") >= 0) & (F.col("week_k") <= 8))
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_k")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_k",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_k")
    )


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for each
    consecutive event pair within a user's (ts, event_id)-ordered stream,
    count from_type → to_type transitions and row-normalize into
    probabilities — the sequence-analytics primitive behind journey
    modeling and next-event prediction.

    One exchange by user_id for the lag window; the 5×5 transition counts
    and row totals are a tiny aggregate joined broadcast-side. Counts are
    exact integers; each probability is one double division rounded 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    w = user_stream_window()
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("n_from"), 6).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent 3-event journey paths (event-type trigrams over
    each user's (ts, event_id)-ordered stream) — the n-gram view of the
    Markov matrix, the 'what do users actually do' report.

    Same single exchange by user_id as the transition matrix (two lags in
    one window pass), then a tiny count + top-k. Ties break on the path
    string for a deterministic LIMIT boundary."""
    ev = load_table(spark, sf_dir, "events")
    w = user_stream_window()
    paths = (
        ev.select(
            F.lag("event_type", 2).over(w).alias("e1"),
            F.lag("event_type", 1).over(w).alias("e2"),
            F.col("event_type").alias("e3"),
        )
        .where(F.col("e1").isNotNull())
        .select(
            F.concat_ws(">", F.col("e1"), F.col("e2"), F.col("e3")).alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )
    return paths.orderBy(F.desc("n"), F.asc("path")).limit(20)


def nation_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per nation: how many customers cover 80% of the
    nation's revenue, and what fraction of its customers that is — the
    80/20 report, partitioned so the running-share window never needs a
    global sort (each nation's customers sort within their partition;
    at 100 TB the exchange key is the nation, the classic
    bounded-cardinality window).

    Revenue sums through DECIMAL (exact, associative); the threshold
    compare uses exact decimal arithmetic (cum * 5 >= total * 4 avoids
    float share entirely), so the customer count at the 80% boundary is
    engine-exact. Ties on equal revenue break by customer key."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("rev"), F.asc("c_custkey")
    )
    ranked = rev.select(
        "c_nationkey",
        "rev",
        F.row_number().over(w).alias("rk"),
        F.sum("rev").over(
            Window.partitionBy("c_nationkey")
            .orderBy(F.desc("rev"), F.asc("c_custkey"))
            .rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("rev").over(Window.partitionBy("c_nationkey")).alias("total"),
        F.count("*").over(Window.partitionBy("c_nationkey")).alias("n_cust"),
    )
    hit = ranked.where(F.col("cum") * 5 >= F.col("total") * 4)
    boundary = hit.groupBy("c_nationkey").agg(
        F.min("rk").cast("long").alias("k_customers"),
        F.min("n_cust").alias("n_cust"),  # constant per nation; min = the value
    )
    return (
        boundary.join(F.broadcast(nation), boundary.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "k_customers",
            "n_cust",
            F.round(F.col("k_customers") / F.col("n_cust"), 6).alias("pareto_frac"),
        )
        .orderBy("nation")
    )


def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem's numeric measures via
    DECIMAL-exact sufficient statistics — the same discipline as the OLS
    trends: built-in ``corr`` accumulates doubles in partition order
    (run-to-run nondeterministic on a real cluster), while (n, Σx, Σy,
    Σxy, Σx², Σy²) in decimal are associative and exact, so the one final
    double expression per pair is bit-identical across engines and any
    partitioning. ONE map-only aggregate produces every pair's statistics
    (no per-pair passes); the 6-row result is driver-sized.

    The projected measures fan out to session parallelism before the
    aggregate (r13, guide §2.5): the single-row-group input otherwise
    pins all 11 decimal sums over the whole table on one task. The
    shuffle carries 4 narrow columns; a pre-split deployment input makes
    fan_out a no-op."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = fan_out(li.select(*cols))
    d = {c: F.col(c).cast("decimal(18,2)") for c in cols}
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(d[c]).alias(f"s_{c}"))
        aggs.append(F.sum(d[c] * d[c]).alias(f"ss_{c}"))
    for i, x in enumerate(cols):
        for y in cols[i + 1:]:
            aggs.append(F.sum(d[x] * d[y]).alias(f"sp_{x}_{y}"))
    stats = li.agg(*aggs)
    pairs = []
    for i, x in enumerate(cols):
        for y in cols[i + 1:]:
            n = F.col("n").cast("double")
            sx, sy = F.col(f"s_{x}").cast("double"), F.col(f"s_{y}").cast("double")
            sxx, syy = F.col(f"ss_{x}").cast("double"), F.col(f"ss_{y}").cast("double")
            sxy = F.col(f"sp_{x}_{y}").cast("double")
            r = (n * sxy - sx * sy) / F.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
            lx, ly = sorted([x, y])  # canonical (alphabetical) pair label
            pairs.append(
                F.struct(
                    F.lit(lx).alias("col_x"),
                    F.lit(ly).alias("col_y"),
                    F.round(r, 6).alias("corr"),
                )
            )
    return (
        stats.select(F.explode(F.array(*pairs)).alias("p"), F.col("n"))
        .select("p.col_x", "p.col_y", F.col("n").cast("long").alias("n_rows"), "p.corr")
        .orderBy("col_x", "col_y")
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    purchase events: per user, days since last purchase (vs the stream's
    max event day), purchase count, and exact DECIMAL spend; each metric
    quintile-scored with ntile(5) over a TOTAL order (metric, user_id) so
    both engines bucket ties identically (score 5 = most recent / most
    frequent / highest spend), then rolled up per (r,f,m) segment.

    Scale: the scored relation is ONE ROW PER PURCHASING USER — the events
    table reduces by orders of magnitude in the first groupBy, and only
    that user-level relation passes through the three global ntile sorts
    (the same single-exchange-of-the-reduced-relation shape as the
    profile/deciles queries). At true 100 TB user counts, swap ntile for
    approx-quantile boundary CASE buckets — the approx-twin pattern
    (value_percentiles_approx) — trading exact equal-size buckets for a
    map-only assignment."""
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(F.max(F.to_date("ts")).alias("anchor"))
    per_user = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count("*").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("monetary_dec"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("anchor", "last_day").alias("recency_days"),
            "frequency",
            "monetary_dec",
        )
    )
    w_r = Window.orderBy(F.desc("recency_days"), F.asc("user_id"))
    w_f = Window.orderBy(F.asc("frequency"), F.asc("user_id"))
    w_m = Window.orderBy(F.asc("monetary_dec"), F.asc("user_id"))
    scored = per_user.select(
        "monetary_dec",
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_users"),
            F.round(
                F.sum("monetary_dec").cast("double") / F.count("*"), 6
            ).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-latency distribution: per user, the FIRST
    signup and the first purchase at-or-after it; latency bucketed into
    whole hours (integer microsecond arithmetic — engine-exact), with each
    bucket's user count and share of all converters.

    Scale: one groupBy(user_id) for first signups, a co-partitioned join
    against purchases on the same key (no extra exchange shape), then a
    tiny hour-bucket rollup; the share divides by a broadcast 1-row total.
    No global window over user rows."""
    events = load_table(spark, sf_dir, "events")
    first_signup = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    first_purchase = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .join(first_signup, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    bucketed = first_purchase.select(
        F.floor(
            (F.unix_micros("purchase_ts") - F.unix_micros("signup_ts"))
            / 3_600_000_000
        ).alias("latency_hours")
    ).groupBy("latency_hours").agg(F.count("*").alias("n_users"))
    total = bucketed.agg(F.sum("n_users").alias("n_total"))
    return (
        bucketed.crossJoin(F.broadcast(total))
        .select(
            "latency_hours",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("latency_hours")
    )


def wau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stickiness (WAU / trailing-4-week MAU) — the standard growth
    engagement ratio. Weeks are Monday-truncated dates (both engines
    truncate to Monday); MAU(w) counts distinct users active in weeks
    w-3..w via a range join of the distinct user-week relation against the
    tiny week dimension.

    Scale: (user_id, week) distinct is ONE shuffle of the reduced
    relation; the 4-week range join broadcasts the week dimension
    (|weeks| rows), so the fan-out is ≤4× the user-week relation, followed
    by one distinct per (week, user). No per-event work after the first
    projection."""
    events = load_table(spark, sf_dir, "events")
    user_weeks = events.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"), "user_id"
    ).distinct()
    weeks = user_weeks.select("week").distinct()
    wau = user_weeks.groupBy("week").agg(F.count("*").alias("wau"))
    uw, w = user_weeks.alias("uw"), weeks.alias("w")
    mau = (
        uw.join(
            F.broadcast(w),
            (F.col("uw.week") <= F.col("w.week"))
            & (F.col("uw.week") >= F.date_sub(F.col("w.week"), 21)),
        )
        .select(F.col("w.week").alias("week"), "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count("*").alias("mau"))
    )
    return (
        wau.join(mau, "week")
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week_start"),
            "wau",
            "mau",
            F.round(
                F.col("wau").cast("double") / F.col("mau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("week_start")
    )


def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B comparison of purchase values (arm = user_id parity —
    the planted random split): per-arm count / mean / sample variance from
    EXACT DECIMAL sufficient statistics (Σx as DECIMAL(38,4), Σx² as
    DECIMAL(38,8) — partition-order-independent, the
    lineitem_correlations recipe), then the Welch t statistic and
    Welch–Satterthwaite degrees of freedom as single double expressions
    over those exact sums — both engines evaluate the identical formula on
    identical inputs, so the 6-dp rounding is stable.

    Scale: ONE map-side-combinable aggregate over the purchase stream —
    no shuffle wider than 2 groups, no second pass."""
    events = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,4)")
    arms = (
        events.where(F.col("event_type") == "purchase")
        .groupBy((F.col("user_id") % 2).cast("int").alias("arm"))
        .agg(
            F.count("*").alias("n"),
            F.sum(v).alias("s"),
            F.sum(v * v).alias("ss"),
        )
    )
    a = arms.where(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("ss").alias("ss_a")
    )
    b = arms.where(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("ss").alias("ss_b")
    )
    j = a.crossJoin(F.broadcast(b))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    ssa, ssb = F.col("ss_a").cast("double"), F.col("ss_b").cast("double")
    mean_a, mean_b = sa / na, sb / nb
    var_a = (ssa - sa * sa / na) / (na - 1)
    var_b = (ssb - sb * sb / nb) / (nb - 1)
    se2 = var_a / na + var_b / nb
    welch_t = (mean_b - mean_a) / F.sqrt(se2)
    df = (se2 * se2) / (
        (var_a / na) * (var_a / na) / (na - 1)
        + (var_b / nb) * (var_b / nb) / (nb - 1)
    )
    return j.select(
        F.col("n_a"),
        F.col("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(mean_b - mean_a, 6).alias("lift"),
        F.round(welch_t, 6).alias("welch_t"),
        F.round(df, 6).alias("welch_df"),
    )


def ks_test_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the same A/B arms'
    purchase-value distributions: per distinct value, running per-arm
    counts (one ordered window over the MERGED DISTINCT SUPPORT — a
    relation of unique values, orders of magnitude smaller than the event
    stream) give both empirical CDFs; the statistic is the max |F_a − F_b|
    with the smallest attaining value as the deterministic argmax.

    The window is a global sort of the distinct-value relation (the same
    accepted reduced-relation shape as the deciles/profile queries); at
    true 100 TB support sizes, bucket values first and bound the KS error
    by the bucket width."""
    events = load_table(spark, sf_dir, "events")
    per_value = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(F.col("value").cast("decimal(18,4)").alias("v"))
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    totals = per_value.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = per_value.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    ).crossJoin(F.broadcast(totals))
    d = F.abs(
        F.col("cum_a").cast("double") / F.col("n_a").cast("double")
        - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
    )
    return (
        cdf.select(
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(d, 6).alias("ks_stat"),
            F.col("v").cast("double").alias("at_value"),
        )
        .orderBy(F.desc("ks_stat"), F.asc("at_value"))
        .limit(1)
    )


def bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions (30-min-gap, the engine's ONE
    session definition — streaming.events.sessionize over the shared
    user_stream_window ordering) containing exactly one event, keyed by
    session start date.

    Scale: sessionize is one user_id exchange; the rollup is a tiny
    per-day aggregate. Reuses the canonical session builder, so a gap-rule
    change propagates here, to the streaming sessionizer, and to the
    journey operators in one place."""
    from ..streaming.events import sessionize

    events = load_table(spark, sf_dir, "events")
    sessions = sessionize(events)
    per_day = sessions.groupBy(
        F.to_date("session_start").alias("day")
    ).agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("n_bounces"),
    )
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_sessions",
        F.col("n_bounces").cast("long").alias("n_bounces"),
        F.round(
            F.col("n_bounces").cast("double") / F.col("n_sessions").cast("double"), 6
        ).alias("bounce_rate"),
    ).orderBy("day")


def revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over one ship-year of daily revenue: the
    cumulative sum of mean-centered daily revenue peaks (in absolute value)
    at the most likely level-shift day — the classic offline CUSUM
    statistic behind pipeline drift monitors and revenue anomaly triage.

    Determinism: daily revenue and its running total stay DECIMAL through
    every frame (associative, partition-order-proof); the mean enters once
    as one double division, so `cusum` is the same three IEEE ops in both
    engines, and the changepoint rank orders by the 6-dp-rounded statistic
    with the day as tiebreak — never raw-double comparisons.

    Scale: the fact scan reduces to a ~365-row daily aggregate in one
    map-side-combined pass; every window (running sum, grand total, rank)
    runs on that driver-sized spine, so 100 TB of lineitem costs one
    aggregate exchange and the windows cost nothing."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev_dec")
    )
    run = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.partitionBy()
    spine = daily.select(
        "d",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(run).alias("run_dec"),
        F.row_number().over(Window.orderBy("d")).alias("rn"),
        F.sum("rev_dec").over(whole).alias("tot_dec"),
        F.count("*").over(whole).alias("n_days"),
    ).select(
        "d",
        "revenue",
        F.round(
            F.col("run_dec").cast("double")
            - F.col("rn").cast("double")
            * (F.col("tot_dec").cast("double") / F.col("n_days").cast("double")),
            6,
        ).alias("cusum"),
    )
    ranked = spine.select(
        "d",
        "revenue",
        "cusum",
        F.row_number()
        .over(Window.orderBy(F.desc(F.abs(F.col("cusum"))), F.asc("d")))
        .alias("_rk"),
    )
    return ranked.select(
        F.date_format("d", "yyyy-MM-dd").alias("ship_day"),
        "revenue",
        "cusum",
        (F.col("_rk") == 1).alias("is_changepoint"),
    ).orderBy("ship_day")


def journey_reach_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-step absorbing reachability of 'purchase' from every journey state:
    relational matrix power over the first-order transition matrix (the
    events_markov_transitions estimator — shared user_stream_window session
    ordering), with purchase absorbing. r_0(s) = [s = purchase];
    r_{t+1}(s) = Σ_next P(s → next) · r_t(next) for non-absorbing s, unrolled
    a fixed K=4 steps — "probability a user purchases within 4 events given
    they just did X", the funnel-free conversion-propensity estimate.

    Exactness: transition counts are integers, and each step's vector entry
    is quantized to 6 dp and carried as DECIMAL(18,6) — so the step's dot
    product Σ(n_transitions · r) is an exact decimal sum (associative,
    partition-order-proof), followed by ONE double division re-rounded to
    6 dp. Both engines run the identical quantize→exact-sum→divide ladder,
    so the unrolled probabilities match bit-for-bit at any parallelism.

    Scale: the fact table reduces to the (from,to) count matrix in one lag
    window + one aggregate (|states|² ≤ 25 rows), localCheckpointed ONCE —
    without the checkpoint the K unroll steps each re-derive the matrix and
    the plan re-scans the fact table per step (observed: 34 exchanges /
    12 joins at K=4; with it, one scan). The unroll then joins that tiny
    relation with a |states|-row vector — broadcast-sized forever,
    independent of event volume."""
    ev = load_table(spark, sf_dir, "events")
    w = user_stream_window()
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from")).localCheckpoint()
    states = totals.select(F.col("from_type").alias("state"))
    # r_0: 1.0 at the absorbing state
    r = states.select(
        "state",
        F.when(F.col("state") == "purchase", F.lit(1.0)).otherwise(F.lit(0.0)).alias("p"),
    )
    for _ in range(4):
        step = (
            pairs.join(r.withColumnRenamed("state", "to_type"), "to_type")
            .groupBy("from_type")
            .agg(
                F.sum(
                    F.col("n").cast("decimal(18,0)") * F.col("p").cast("decimal(18,6)")
                ).alias("num_dec")
            )
            .join(totals, "from_type")
            .select(
                F.col("from_type").alias("state"),
                F.round(
                    F.col("num_dec").cast("double") / F.col("n_from").cast("double"), 6
                ).alias("p_step"),
            )
        )
        r = (
            states.join(step, "state", "left")
            .select(
                "state",
                F.when(F.col("state") == "purchase", F.lit(1.0))
                .otherwise(F.coalesce(F.col("p_step"), F.lit(0.0)))
                .alias("p"),
            )
        )
    return r.select(
        F.col("state").alias("from_state"), F.round("p", 6).alias("p_reach_4")
    ).orderBy("from_state")


def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (top-25) — the
    gaps-and-islands idiom: distinct active days, island key = day minus
    row_number-as-days (constant within a run of consecutive dates), one
    count per island, longest island per user. Engagement analytics'
    "current/longest streak" feature, in pure window algebra.

    Scale: the fact table reduces to distinct (user, day) in one exchange;
    BOTH windows and the island aggregate ride that same user_id hash
    partitioning (no second fact shuffle), and the final top-25 is a
    TakeOrdered heap. Everything after the distinct is integer-exact."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id", "d", F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp")
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count("*").alias("streak_days"), F.min("d").alias("start_d")
    )
    best = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("start_d")
    )
    longest = (
        streaks.select(
            "user_id",
            "streak_days",
            "start_d",
            F.row_number().over(best).alias("_rk"),
        )
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )
    return (
        longest.orderBy(F.desc("streak_days"), F.asc("user_id"))
        .limit(25)
        .select(
            "user_id",
            "streak_days",
            F.date_format("start_d", "yyyy-MM-dd").alias("streak_start"),
        )
    )


def customer_balance_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer account balances — the
    inequality-of-value metric next to nation_revenue_pareto's
    concentration boundary. Uses the rank-sum identity
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending-sorted balances;
    Σ i·xᵢ is invariant to tie order, so the custkey tiebreak only fixes
    the row_number, never the statistic.

    Exactness: balances are DECIMAL(18,2); both Σx and Σ i·x accumulate as
    exact decimals (i is an integer), so the Gini is one double expression
    over exact sums. Scale: one exchange by nation for the rank window,
    then a per-nation aggregate on the same partitioning; the 25-row
    result joins the nation dimension broadcast-side."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = cust.select(
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        F.row_number().over(w).alias("i"),
    )
    agg = ranked.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum("bal").alias("sx"),
        F.sum(F.col("i").cast("decimal(18,0)") * F.col("bal")).alias("swx"),
    )
    return (
        agg.join(F.broadcast(nation), agg.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").cast("long").alias("n_customers"),
            F.col("sx").cast("double").alias("total_balance"),
            F.round(
                F.lit(2.0) * F.col("swx").cast("double")
                / (F.col("n").cast("double") * F.col("sx").cast("double"))
                - (F.col("n").cast("double") + F.lit(1.0)) / F.col("n").cast("double"),
                6,
            ).alias("gini"),
        )
        .orderBy("nation")
    )


def entity_resolution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record linkage (operators/er.py) over the customer
    table with deterministically PLANTED dirty re-ingests — every 10th
    customer re-inserted under a shifted key with a typo'd name (last char
    substituted) and a drifted balance (+0.37), the same fixture-planting
    policy as pii_redact/dedup_exact. Three compared fields (name
    edit-distance ≤ 2, balance within 1.00 exact-decimal, segment equality)
    with assumed (m, u) parameters, link threshold 6.0 — planted dupes
    score ≈ 8.83, partial-agreement candidates ≈ 4.50, so the threshold
    separates them; any candidate pair that GENUINELY agrees on all three
    fields links too, which is the model working, not noise.

    Blocking is corpus-PROPORTIONAL — block count grows with the corpus,
    block size stays bounded, so Σ n² (the pair fan-out) stays linear:
    1. name prefix-16 — the typo-tolerant identity key (the name's suffix
       region absorbs edits); blocks hold the ≤100 customers sharing a key
       prefix plus their re-ingests, at ANY corpus size.
    2. two STAGGERED sorted-neighborhood bands (width 64, offset 32) over
       a row_number ranked by balance within (nation, balance-century):
       every pair within 32 ranks of each other shares at least one band,
       so balance-close candidates survive while a block can never exceed
       64 rows — unlike a raw (nation, century) key, whose blocks grow
       linearly with the corpus (the r9 quadratic-blocking flag). The rank
       window partitions on (nation, century), so no single-task sort; its
       order (balance, custkey) is total, hence engine-deterministic.

    A fixed-cardinality key like (nation, segment) is the classic ER
    blocking mistake at scale: 125 blocks whose sizes grow linearly make
    the candidate join quadratic. fellegi_sunter_pairs' max_block_size
    guard exists for callers that can't restructure their keys."""
    from ..operators.er import fellegi_sunter_pairs

    cust = load_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    base = cust.select(*cols)
    dup = cust.where(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 100_000).alias("c_custkey"),
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 1)"), F.lit("X")
        ).alias("c_name"),
        "c_nationkey",
        (F.col("c_acctbal") + 0.37).alias("c_acctbal"),
        "c_mktsegment",
    )
    recs = base.unionAll(dup)
    dec = "decimal(18,2)"
    bal_rank = (
        F.row_number().over(
            Window.partitionBy(
                F.col("c_nationkey"), F.floor(F.col("c_acctbal") / 100.0)
            ).orderBy("c_acctbal", "c_custkey")
        )
        - 1
    )
    # r13: the three passes run STACKED through one self-join (explode to
    # (id, pass, key) — one exchange serves every pass, and the rank window
    # above is evaluated once instead of once per band pass; was 3 joins +
    # 2 window execs). Keys are encoded injectively as strings: the name
    # prefix raw, the band structs as '|'-joined integers; the pass index
    # rides separately, so cross-pass collisions are impossible. The
    # encoding is NULL-PRESERVING (F.concat, r14 advice): a NULL component
    # nulls the whole key, and fellegi_sunter_pairs drops null keys — the
    # same no-participation semantics the old struct keys gave a
    # null-field row, where concat_ws would silently skip the component
    # and let (1, NULL, 3) collide with (1, 3, NULL). Unreachable on this
    # data (all components non-null integers) — candidates, and therefore
    # the linkage, are unchanged (equivalence pinned in tests/test_er.py).
    cent = F.floor(F.col("c_acctbal") / 100.0)
    _sep = F.lit("|")
    band_key = lambda rank_expr: F.concat(  # noqa: E731
        F.col("c_nationkey").cast("string"),
        _sep,
        cent.cast("string"),
        _sep,
        rank_expr.cast("string"),
    )
    return fellegi_sunter_pairs(
        recs,
        "c_custkey",
        block_keys=[
            F.substring("c_name", 1, 16),
            band_key(F.floor(bal_rank / 64)),
            band_key(F.floor((bal_rank + 32) / 64)),
        ],
        stacked=True,
        comparators=[
            (
                "name",
                lambda a, b: F.levenshtein(a["c_name"], b["c_name"]) <= 2,
                0.9,
                0.01,
            ),
            (
                "bal",
                lambda a, b: F.abs(
                    a["c_acctbal"].cast(dec) - b["c_acctbal"].cast(dec)
                )
                <= F.lit("1.00").cast(dec),
                0.8,
                0.05,
            ),
            (
                "seg",
                lambda a, b: a["c_mktsegment"] == b["c_mktsegment"],
                0.95,
                0.2,
            ),
        ],
        threshold=6.0,
    )


def revenue_dow_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonally-adjusted revenue anomalies over one ship
    year: each day's revenue divided by its weekday's mean — the STL-lite
    decomposition that catches a weak Tuesday even when Tuesdays are
    always weak (the trailing-window and CUSUM monitors both miss that).
    Flags ratio outside [0.6, 1.4].

    Weekday index is pure integer date arithmetic (days-since-a-known-
    Monday mod 7 — no locale, no engine dayofweek convention). Daily and
    per-weekday sums stay DECIMAL; each ratio is one double division over
    exact sums, rounded 6. All windows run on the ~365-row daily spine
    after ONE fact aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev_dec")
    )
    spine = daily.select(
        "d",
        "rev_dec",
        (F.datediff(F.col("d"), F.lit("1970-01-05")) % 7).alias("dow"),
    )
    w = Window.partitionBy("dow")
    scored = spine.select(
        "d",
        "dow",
        F.col("rev_dec").cast("double").alias("revenue"),
        (
            F.col("rev_dec").cast("double")
            / (
                F.sum("rev_dec").over(w).cast("double")
                / F.count("*").over(w).cast("double")
            )
        ).alias("_ratio"),
    )
    return scored.select(
        F.date_format("d", "yyyy-MM-dd").alias("ship_day"),
        "dow",
        "revenue",
        F.round("_ratio", 6).alias("dow_ratio"),
        ((F.col("_ratio") < 0.6) | (F.col("_ratio") > 1.4)).alias("is_anomaly"),
    ).orderBy("ship_day")


def revenue_autocorr7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly periodicity check: lag-7 Pearson autocorrelation of the daily
    revenue spine (row lag over the date-ordered spine). Near +1 means a
    strong weekly cycle — the signal that decides whether the dow-seasonal
    monitor (revenue_dow_anomaly) applies to a series at all.

    Same DECIMAL discipline as lineitem_correlations: the (y_t, y_{t−7})
    pairs keep money exact, all five sufficient statistics accumulate as
    exact decimals in one aggregate, and the correlation is one double
    expression. One fact exchange; the lag rides the tiny spine."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("y")
    )
    w = Window.orderBy("d")
    pairs = daily.select("d", "y", F.lag("y", 7).over(w).alias("x")).where(
        F.col("x").isNotNull()
    )
    s = pairs.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(r, 6).alias("autocorr7"),
    )


def events_value_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles over the purchase-value stream: open/close are
    the first/last values by the canonical (ts, event_id) order, high/low
    the extremes, plus count and a DECIMAL-exact volume — the time-series
    downsampling primitive behind every candlestick/monitoring rollup.

    Both rank windows and the aggregate ride ONE hour-keyed exchange
    (row_number needs the full hour partition; the aggregate reuses it).
    Open/close are picked by rank-1 filters — never first()/last() on an
    unordered aggregate, which is partition-order nondeterministic."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    hr = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("h"), "ts", "event_id", "value"
    )
    wf = Window.partitionBy("h").orderBy(F.asc("ts"), F.asc("event_id"))
    wl = Window.partitionBy("h").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = hr.select(
        "h",
        "value",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    out = ranked.groupBy("h").agg(
        F.max(F.when(F.col("rf") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rl") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_trades"),
        F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("volume"),
    )
    return out.select(
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        "open",
        "high",
        "low",
        "close",
        "n_trades",
        "volume",
    ).orderBy("hour")


def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified draw: 100 documents allocated across
    languages ∝ N_h·σ_h (stratum size × length standard deviation — the
    variance-minimizing allocation for estimating mean length; Neyman
    1934), integerized by largest-remainder, drawn per stratum by the
    md5 hash rank the whole sampling family uses.

    σ_h comes from exact integer sufficient statistics (n_chars is a
    BIGINT), the allocation arithmetic runs on the ≤|languages| census
    rows, and the draw is one stratum-keyed rank window — so the sample
    is a pure deterministic function of the corpus, replayed row-for-row
    by the oracle."""
    total_k = 100
    docs = load_table(spark, sf_dir, "documents")
    census = docs.groupBy("lang").agg(
        F.count("*").alias("n_h"),
        F.sum(F.col("n_chars").cast("decimal(28,0)")).alias("s"),
        F.sum(
            F.col("n_chars").cast("decimal(28,0)")
            * F.col("n_chars").cast("decimal(28,0)")
        ).alias("ss"),
    )
    w = census.select(
        "lang",
        "n_h",
        (
            F.col("n_h").cast("double")
            * F.sqrt(
                (
                    F.col("ss").cast("double")
                    - F.col("s").cast("double")
                    * F.col("s").cast("double")
                    / F.col("n_h").cast("double")
                )
                / F.col("n_h").cast("double")
            )
        ).alias("wt"),
    )
    whole = Window.partitionBy()
    alloc = w.select(
        "lang",
        "n_h",
        (F.lit(float(total_k)) * F.col("wt") / F.sum("wt").over(whole)).alias(
            "target"
        ),
    ).select(
        "lang",
        "n_h",
        F.floor(F.col("target")).cast("long").alias("base"),
        (F.col("target") - F.floor(F.col("target"))).alias("frac"),
    )
    alloc = alloc.select(
        "lang",
        "n_h",
        "base",
        F.row_number()
        .over(Window.orderBy(F.desc("frac"), F.asc("lang")))
        .alias("frac_rank"),
        (F.lit(total_k) - F.sum("base").over(whole)).alias("n_extra"),
    ).select(
        "lang",
        (
            F.col("base")
            + F.when(F.col("frac_rank") <= F.col("n_extra"), 1).otherwise(0)
        ).alias("quota"),
    )
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(
                F.md5(F.concat(F.lit("ney#"), F.col("doc_id").cast("string"))),
                F.asc("doc_id"),
            )
        )
        .alias("rk"),
    )
    return (
        ranked.join(F.broadcast(alloc), "lang")
        .where(F.col("rk") <= F.col("quota"))
        .select("doc_id", "lang", "quota")
        .orderBy("lang", "doc_id")
    )


def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of conversion latency (days from a
    user's first event to first purchase) with right-censoring — the
    product-limit estimator (Kaplan & Meier 1958) that a naive latency
    histogram gets wrong the moment some users haven't converted YET.
    The synthetic corpus converts everyone, so censoring is PLANTED
    deterministically (every 5th user is "lost to follow-up" at half
    their observed span — the same fixture policy as the PII/dupe
    plants); the estimator's censoring semantics are what's under test.
    A user with NO purchase at all is censored at their observed span
    (t = last event − first event) — never counted as a conversion — so
    the plan stays correct on corpora where the everyone-converts fixture
    property does not hold.

    Determinism: the curve is a cumulative product computed as
    exp(running-sum of ln factors), each ln(1 − d/n) quantized to 12 dp
    and summed as exact DECIMAL over the ordered risk table; a time where
    d = n_at_risk drives survival to EXACTLY 0 via an explicit flag
    (never ln(0)). Scale: one exchange reduces events to a per-user row;
    every window runs on the ≤|distinct latencies| risk spine."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("tl"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    spans = per_user.select(
        F.when(
            F.col("user_id") % 5 == 0,
            F.floor(
                F.datediff(F.to_date("tl"), F.to_date("t0")) / F.lit(2)
            ).cast("int"),
        )
        .when(
            F.col("tp").isNull(),
            F.datediff(F.to_date("tl"), F.to_date("t0")),
        )
        .otherwise(F.datediff(F.to_date("tp"), F.to_date("t0")))
        .alias("t"),
        ((F.col("user_id") % 5 == 0) | F.col("tp").isNull()).alias("censored"),
    )
    risk = spans.groupBy("t").agg(
        F.count("*").alias("n_t"),
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).alias("d"),
    )
    w_after = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_run = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = risk.select(
        "t",
        F.col("d").cast("long").alias("n_events"),
        F.sum("n_t").over(w_after).cast("long").alias("n_at_risk"),
    ).select(
        "t",
        "n_at_risk",
        "n_events",
        F.when(
            F.col("n_events") < F.col("n_at_risk"),
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("n_events").cast("double")
                    / F.col("n_at_risk").cast("double")
                ),
                12,
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(38,12)")
        .alias("lnf"),
        (F.col("n_events") >= F.col("n_at_risk")).cast("int").alias("dead"),
    )
    return (
        curve.where(F.col("n_events") > 0)
        .select(
            "t",
            "n_at_risk",
            "n_events",
            F.when(F.max("dead").over(w_run) == 1, F.lit(0.0))
            .otherwise(
                F.round(F.exp(F.sum("lnf").over(w_run).cast("double")), 6)
            )
            .alias("survival"),
        )
        .orderBy("t")
    )


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the co-purchase part graph
    (parts co-occurring in an order, distinct undirected edges): Pearson
    correlation of (deg(u), deg(v)) over both orientations of every edge —
    positive = popular parts co-sell with popular parts; ≈0 on this
    corpus's random baskets, which IS the verified null. Subjects
    rejected as degenerate: the synthetic link fixture is 2-regular (both
    hash maps are bijections mod N — zero degree variance) and the
    near-dup graph's components are cliques (r ≡ 1 exactly).

    Scale: the only self-join is within an order key (fan-out bounded by
    basket size, the copurchase_lift shape). Degrees attach as TWO count
    windows over the oriented edge relation (r13) — count(*) over
    partition(u) IS deg(u) when the relation holds one row per directed
    edge — so the edge list is computed once and never joined back to a
    degree table (the old deg-join shape re-executed the whole self-join
    + distinct for every reference: 34 static Exchange nodes → 5). Both
    orientations come from one explode, not a union of two subtree
    copies. The five sufficient statistics are exact integer sums in one
    pass, the coefficient one double expression — the correlation ladder."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs_c = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    und = pairs_c.select(
        F.explode(
            F.array(
                F.struct(F.col("pa").alias("u"), F.col("pb").alias("v")),
                F.struct(F.col("pb").alias("u"), F.col("pa").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    pairs = und.withColumn(
        "x", F.count("*").over(Window.partitionBy("u"))
    ).withColumn("y", F.count("*").over(Window.partitionBy("v")))
    s = pairs.agg(
        F.count("*").cast("double").alias("m"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    r = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("m").cast("long").alias("n_edge_ends"),
        F.round(r, 6).alias("assortativity"),
    )


def conversion_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase-rate with Wilson 95% score intervals (Wilson 1927) —
    the uncertainty-aware rate a dashboard should show instead of raw k/n
    (which ranks a 1/1 day above a 99/100 day). Lower bound is the
    standard ranking key for small-sample rates.

    Counts are integers from one day-keyed aggregate; center/half-width
    are fixed-shape double expressions over them (z = 1.96), identical in
    both engines, rounded once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "k"
        ),
    )
    z = F.lit(1.96)
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    denom = F.lit(1.0) + z * z / n
    center = (p + z * z / (F.lit(2.0) * n)) / denom
    half = (
        z
        * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
        / denom
    )
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_events"),
        F.col("k").cast("long").alias("n_purchases"),
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    ).orderBy("day")


def ucb1_arm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit scores per arm (Auer et al. 2002), arms = event types,
    reward = event value: mean + sqrt(2·ln N / n) — the
    optimism-under-uncertainty index that decides which variant an
    adaptive allocator pulls next. `chosen` flags the argmax.

    Means come from 6-dp-quantized DECIMAL value sums (order-proof); N is
    a broadcast 1-row total; the index is one fixed double expression;
    the argmax ranks on the ROUNDED score with the arm name as tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    arms = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).alias("s"),
    )
    tot = arms.agg(F.sum("n").alias("n_total"))
    j = arms.crossJoin(F.broadcast(tot))
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    ucb = mean + F.sqrt(
        F.lit(2.0) * F.log(F.col("n_total").cast("double")) / F.col("n").cast("double")
    )
    scored = j.select(
        F.col("event_type").alias("arm"),
        F.col("n").cast("long").alias("n_pulls"),
        F.round(mean, 6).alias("mean_reward"),
        F.round(ucb, 6).alias("ucb1"),
    )
    w = Window.orderBy(F.desc("ucb1"), F.asc("arm"))
    return scored.select(
        "arm",
        "n_pulls",
        "mean_reward",
        "ucb1",
        (F.row_number().over(w) == 1).alias("chosen"),
    ).orderBy("arm")


def ab_test_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test on purchase values, variant = user
    parity — the NONPARAMETRIC A/B companion to ab_test_lift (t-style
    means) and ks_test_ab (full-distribution distance): U ranks medians
    without normality assumptions, which is what heavy-tailed revenue
    values actually violate. One row: group sizes, U for variant A, the
    tie-corrected normal-approximation z, and the 95% decision.

    Determinism ladder: ranks never materialize per row — the VALUE SPINE
    (distinct value, per-variant counts) carries cumulative counts, so the
    average rank of a tie group is exact rational arithmetic
    (cum + (n+1)/2), R_A = Σ n_A·avg_rank is exact in double (halves), and
    the tie correction Σ(t³−t) is an exact integer sum. z is one fixed
    double expression over those exacts, rounded 6.

    Scale: one aggregate reduces the fact table to the distinct-value
    spine; the rank window runs on the spine, not the corpus. The window
    is unpartitioned BY CONSTRUCTION (a global rank is the statistic) —
    at 100 TB the spine is still |distinct values| ≪ corpus, and a
    range-partitioned sort with offset merge replaces the single-task
    window before the spine itself is executor-sized."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    spine = ev.groupBy("value").agg(
        F.count("*").alias("n"),
        F.sum((F.col("user_id") % 2 == 0).cast("long")).alias("n_a"),
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = spine.select(
        "value",
        "n",
        "n_a",
        (
            (F.sum("n").over(w) - F.col("n")).cast("double")
            + (F.col("n") + 1).cast("double") / F.lit(2.0)
        ).alias("avg_rank"),
    )
    agg = ranked.agg(
        F.sum("n").alias("n_total"),
        F.sum("n_a").alias("na"),
        F.sum(F.col("n_a").cast("double") * F.col("avg_rank")).alias("r_a"),
        F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n")).alias("tie3"),
    )
    na = F.col("na").cast("double")
    nb = (F.col("n_total") - F.col("na")).cast("double")
    n = F.col("n_total").cast("double")
    u_a = F.col("r_a") - na * (na + F.lit(1.0)) / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    sigma = F.sqrt(
        na * nb / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("tie3").cast("double") / (n * (n - F.lit(1.0))))
    )
    z = (u_a - mu) / sigma
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        (F.col("n_total") - F.col("na")).cast("long").alias("n_b"),
        F.round(u_a, 6).alias("u_a"),
        F.round(z, 6).alias("z_score"),
        (F.abs(F.round(z, 6)) > F.lit(1.96)).alias("reject_95"),
    )


def revenue_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue over 1998 H1: the median of
    all pairwise day-to-day slopes — the estimator that shrugs off the
    outlier days that wreck the OLS trend line (forecast_revenue's
    machinery), with a 29.3% breakdown point (Sen 1968). One row:
    n_days, n_pairs, the slope (revenue units per day, 6 dp).

    Exactness: daily revenue is an exact DECIMAL sum cast once to double;
    each pairwise slope is one double subtraction/division — identical in
    any engine — and the MEDIAN of an even/odd multiset is the average of
    the middle order statistics, which is tie-order-free by construction
    (equal slopes are interchangeable at the middle positions).

    Scale: the pair fan-out is over the DAILY SPINE (≤183 rows → ≤17k
    pairs), never the fact table: one fact-table aggregate, then a spine
    self-join whose quadratic cost is calendar-bounded, not
    corpus-bounded. The median window runs on the pair relation."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-07-01"))
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev_dec")
    )
    spine = daily.select(
        F.datediff(F.col("d"), F.lit("1998-01-01")).alias("t"),
        F.col("rev_dec").cast("double").alias("rev"),
    )
    a = spine.select(F.col("t").alias("ti"), F.col("rev").alias("ri"))
    b = spine.select(F.col("t").alias("tj"), F.col("rev").alias("rj"))
    slopes = (
        a.join(b, F.col("ti") < F.col("tj"))
        .select(
            (
                (F.col("rj") - F.col("ri"))
                / (F.col("tj") - F.col("ti")).cast("double")
            ).alias("slope")
        )
    )
    wn = Window.orderBy("slope")
    ranked = slopes.select(
        "slope",
        F.row_number().over(wn).alias("rn"),
        F.count("*").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n_pairs"),
    )
    mid = ranked.where(
        (F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("n_pairs") / 2) + 1)
    )
    n_days = spine.count()
    return mid.agg(
        F.lit(n_days).cast("long").alias("n_days"),
        F.any_value("n_pairs").cast("long").alias("n_pairs"),
        F.round(F.avg("slope"), 6).alias("ts_slope"),
    )


def segment_nation_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test + Cramér's V for the customer
    (mktsegment × nation) contingency table — "is segment mix uniform
    across geographies?", the categorical-association audit a skew-aware
    partitioner or a stratified sampler consults first. One row:
    n, dof, chi2, cramers_v (≈0 on this corpus's independent draws, which
    is the verified null).

    Determinism ladder: observed/marginal counts are exact integers;
    each cell's (o−e)²/e is one double expression quantized to 9 dp and
    summed as exact DECIMAL over the ≤125-cell relation (order-proof),
    then chi2 and V are single double expressions rounded 6.

    Scale: one fact aggregate to the (segment, nation) cell relation;
    marginals derive from the cells (grouping-sized); everything after the
    first aggregate is dimension-sized."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("o")
    )
    row_t = cells.groupBy("c_mktsegment").agg(F.sum("o").alias("rt"))
    col_t = cells.groupBy("c_nationkey").agg(F.sum("o").alias("ct"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("c_mktsegment").alias("r"),
        F.countDistinct("c_nationkey").alias("c"),
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast("double")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    chi2_dec = (
        cells.join(row_t, "c_mktsegment")
        .join(col_t, "c_nationkey")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.round(term, 9).cast("decimal(28,12)")).alias("chi2_dec"),
            F.any_value("n").alias("n"),
            F.any_value("r").alias("r"),
            F.any_value("c").alias("c"),
        )
    )
    chi2 = F.col("chi2_dec").cast("double")
    mindim = F.least(F.col("r"), F.col("c")) - 1
    return chi2_dec.select(
        F.col("n").cast("long").alias("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (F.col("n").cast("double") * mindim.cast("double"))), 6
        ).alias("cramers_v"),
    )


_BENFORD_EXPECTED = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}


def lineitem_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of l_extendedprice — the classic
    fabricated-numbers screen (Benford 1938; auditors' digit test): count
    leading digits 1..9, compare to log10(1+1/d), report per-digit
    observed/expected shares and the corpus-level chi-square. TPC-H prices
    are qty × part price, a product of near-uniforms, so they lean toward
    Benford without matching exactly — the chi2 magnitude IS the
    fingerprint the oracle pins.

    Leading digit is a CASE ladder of exact integer floors over the
    price's known [1, 10^6) range — no log10-of-double boundary risk, no
    string formatting. Expected shares are Python-computed double literals
    embedded IDENTICALLY in both engines. Per-digit chi2 terms are
    quantized to 9 dp and DECIMAL-summed (order-proof), the correlation
    ladder."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    digit = (
        F.when(p >= 100000, F.floor(p / 100000))
        .when(p >= 10000, F.floor(p / 10000))
        .when(p >= 1000, F.floor(p / 1000))
        .when(p >= 100, F.floor(p / 100))
        .when(p >= 10, F.floor(p / 10))
        .otherwise(F.floor(p))
    )
    obs = li.select(digit.cast("int").alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    exp_col = F.create_map(
        *[x for d, v in sorted(_BENFORD_EXPECTED.items()) for x in (F.lit(d), F.lit(v))]
    )[F.col("digit")]
    tot = obs.agg(F.sum("n").alias("n_total"))
    filled = (
        spine.join(obs, "digit", "left")
        .select("digit", F.coalesce("n", F.lit(0)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            "n_total",
            exp_col.alias("exp_frac_raw"),
        )
    )
    e = F.col("exp_frac_raw") * F.col("n_total").cast("double")
    term = (F.col("n").cast("double") - e) * (F.col("n").cast("double") - e) / e
    chi2 = filled.agg(
        F.sum(F.round(term, 9).cast("decimal(28,12)")).cast("double").alias("chi2")
    )
    return (
        filled.crossJoin(F.broadcast(chi2))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("n_total").cast("double"), 6).alias(
                "obs_frac"
            ),
            F.round(F.col("exp_frac_raw"), 6).alias("exp_frac"),
            F.round(F.col("chi2"), 6).alias("chi2"),
        )
        .orderBy("digit")
    )


def event_type_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of the event-type mix per day — the drift
    monitor a training-data pipeline runs over its ingest streams: a day
    whose type distribution collapses (entropy drop) or flattens (entropy
    spike) signals an upstream collector change long before any per-type
    count threshold fires.

    Plan: one (day, event_type) aggregate (map-side partial combine), then
    the per-day total via a day-partitioned window over the tiny
    days×types relation — no second pass over events. Each type's
    −p·log2(p) term is quantized to 9 dp and DECIMAL-summed per day
    (order-proof, the lineitem_correlations ladder), so the oracle replays
    the entropy bit-for-bit regardless of partitioning."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("event_type")
    ).agg(F.count("*").alias("n"))
    tot = F.sum("n").over(Window.partitionBy("day"))
    p = F.col("n").cast("double") / F.col("n_day").cast("double")
    term = -p * F.log2(p)
    return (
        per.withColumn("n_day", tot)
        .groupBy("day")
        .agg(
            F.max("n_day").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.round(term, 9).cast("decimal(28,12)"))
            .cast("double")
            .alias("entropy_raw"),
        )
        .select(
            "day",
            "n_events",
            "n_types",
            F.round("entropy_raw", 6).alias("entropy_bits"),
        )
        .orderBy("day")
    )


def spearman_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_discount —
    the monotone-association screen (Spearman 1904) that catches
    relationships Pearson's linear r misses (and is immune to the heavy
    price tails that dominate lineitem_correlations).

    Scale shape: NO global sort and NO corpus-wide window. Both columns
    have bounded distinct-value spines (quantity: ≤50 integers, discount:
    ≤11 ticks — domain facts that hold at any corpus size), so average
    ranks are computed on the spine (groupBy(value) → counts → cumulative
    window over the tiny spine) and broadcast-joined back; midrank for a
    tie group of size n starting after c rows is c + (n+1)/2, exact in
    DECIMAL(28,1). Pearson over the midranks then uses the DECIMAL
    sufficient-statistics ladder (n, Σx, Σy, Σxy, Σx², Σy²) — one map-only
    aggregate, one final double expression, bit-identical across engines
    and partitionings."""
    li = load_table(spark, sf_dir, "lineitem")

    def midranks(col: str) -> DataFrame:
        counts = li.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("cnt"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        return counts.select(
            "v",
            (
                F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("decimal(12,1)")
                + (F.col("cnt").cast("decimal(12,1)") + F.lit(1).cast("decimal(12,1)"))
                / F.lit(2).cast("decimal(12,1)")
            ).cast("decimal(12,1)").alias("r"),
        )

    rx = midranks("l_quantity").withColumnRenamed("r", "rx")
    ry = midranks("l_discount").withColumnRenamed("r", "ry")
    ranked = (
        li.select("l_quantity", "l_discount")
        .join(F.broadcast(rx), li.l_quantity == rx.v)
        .drop("v")
        .join(F.broadcast(ry), li.l_discount == ry.v)
        .drop("v")
    )
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    rho = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return stats.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(rho, 6).alias("spearman_rho"),
    )


def ab_test_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Welch z-test of order value vs the rest of the corpus,
    with Benjamini-Hochberg step-up adjustment (Benjamini & Hochberg 1995)
    across the 25 simultaneous tests — the multiple-comparisons control an
    experimentation platform owes any per-segment screen (ab_test_lift's
    single-test z is anticonservative the moment you run it per segment).

    One fact pass: per-nation (n, Σx, Σx²) in DECIMAL (exact, map-side
    combined); the complement group's statistics come from the global
    totals by subtraction, so "nation vs rest" needs no second scan. All
    downstream arithmetic (Welch z from the sufficient stats, the
    Abramowitz-Stegun 26.2.17 normal-tail polynomial for the p-value, the
    BH reverse running-min) runs on the 25-row nation spine — window
    functions over a dimension-sized relation, broadcast-sized forever.
    p-values are quantized to 9 dp BEFORE ranking so both engines rank the
    identical keys; ties break by nation name."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("sx"),
            F.sum(
                F.col("o_totalprice").cast(DEC) * F.col("o_totalprice").cast(DEC)
            ).alias("sxx"),
        )
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("sx").alias("tsx"), F.sum("sxx").alias("tsxx")
    )
    m_tests = per.agg(F.count("*").alias("m"))
    na, nb = F.col("n").cast("double"), (F.col("tn") - F.col("n")).cast("double")
    sxa, sxb = F.col("sx").cast("double"), (F.col("tsx") - F.col("sx")).cast("double")
    sxxa = F.col("sxx").cast("double")
    sxxb = (F.col("tsxx") - F.col("sxx")).cast("double")
    ma, mb = sxa / na, sxb / nb
    va = (sxxa - sxa * sxa / na) / (na - F.lit(1.0))
    vb = (sxxb - sxb * sxb / nb) / (nb - F.lit(1.0))
    z = (ma - mb) / F.sqrt(va / na + vb / nb)
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    pdf = F.exp(-az * az / F.lit(2.0)) / F.lit(2.5066282746310002)
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t
            * (F.lit(1.781477937) + t * (F.lit(-1.821255978) + t * F.lit(1.330274429)))
        )
    )
    p = F.least(F.lit(2.0) * pdf * poly, F.lit(1.0))
    scored = (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(m_tests))
        .join(F.broadcast(nation), per.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").cast("long").alias("n_orders"),
            F.round(z, 6).alias("z"),
            F.round(p, 9).alias("p9"),
            F.col("m"),
        )
    )
    w_rank = Window.orderBy(F.asc("p9"), F.asc("nation"))
    w_revmin = Window.orderBy(F.desc("p9"), F.desc("nation")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = scored.select(
        "nation",
        "n_orders",
        "z",
        "p9",
        (
            F.col("p9") * F.col("m").cast("double")
            / F.row_number().over(w_rank).cast("double")
        ).alias("adj_raw"),
    )
    return (
        ranked.withColumn("p_bh", F.least(F.min("adj_raw").over(w_revmin), F.lit(1.0)))
        .select(
            "nation",
            "n_orders",
            "z",
            F.round("p9", 6).alias("p_value"),
            F.round("p_bh", 6).alias("p_bh"),
            (F.col("p_bh") <= F.lit(0.05)).alias("significant"),
        )
        .orderBy("nation")
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous GROUPING SETS — ((returnflag, linestatus),
    (ship_year), ()) — the member of the multi-aggregation family CUBE
    and ROLLUP can't express: the sets share no hierarchy (a flag×status
    breakdown, an orthogonal yearly trend, and the grand total) yet land
    in ONE pass instead of three unioned scans.

    Same two-phase shape as cube_revenue: a plain groupBy on the union of
    all grouping columns first (map-side partial combine; fact rows cross
    the wire once, to a flag×status×year ≈ 50-row relation), then
    groupingSets over that tiny aggregate — Expand multiplies rows by the
    number of sets AFTER the reduction, not before. DECIMAL re-aggregation
    keeps the rewrite exact. The set id derives from the null pattern (the
    real columns are never null in this data), not grouping_id(), so both
    engines label levels without relying on matching bitmask conventions."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    base = li.groupBy(
        "l_returnflag", "l_linestatus", F.year("l_shipdate").alias("ship_year")
    ).agg(F.count("*").alias("cnt"), F.sum(disc_price).alias("rev_dec"))
    gs = base.groupingSets(
        [
            [F.col("l_returnflag"), F.col("l_linestatus")],
            [F.col("ship_year")],
            [],
        ],
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.col("ship_year"),
    ).agg(
        # empty-input parity with a single-phase shape (see revenue_rollup)
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_lines"),
        F.round(F.sum("rev_dec"), 2)
        .cast("decimal(18,2)")
        .cast("double")
        .alias("revenue"),
    )
    set_id = (
        F.when(
            F.col("l_returnflag").isNull() & F.col("ship_year").isNull(), F.lit(2)
        )
        .when(F.col("l_returnflag").isNotNull(), F.lit(0))
        .otherwise(F.lit(1))
    )
    return gs.select(
        set_id.alias("set_id"),
        F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
        F.coalesce(F.col("ship_year"), F.lit(-1)).cast("int").alias("ship_year"),
        "n_lines",
        "revenue",
    ).orderBy("set_id", "l_returnflag", "l_linestatus", "ship_year")


def revenue_range_frame_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-aware RANGE window frame: trailing-7-CALENDAR-DAY revenue
    over a SPARSE daily series (high-quantity lineitems only) — the frame
    family revenue_moving_avg's ROWS BETWEEN cannot express: with gaps in
    the series, "last 7 rows" silently reaches weeks back while "last 7
    days" holds its window, which is why every time-series rollup over
    irregular data needs RANGE frames. days_in_frame < 7 rows make the
    distinction visible (and oracle-pinned) wherever the series has gaps.

    The range key is an integer day number (datediff from a fixed epoch) —
    identical arithmetic in both engines, no timestamp-unit ambiguity. The
    global-ordered window runs on the ≤365-row daily aggregate, never the
    fact table; daily revenue is DECIMAL-exact through the frame sum with
    one final double division."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_quantity") >= 48)
    )
    daily = li.groupBy(F.to_date("l_shipdate").alias("ship_day")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev_dec")
    )
    keyed = daily.withColumn(
        "day_num", F.datediff(F.col("ship_day"), F.lit("1995-01-01"))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return (
        keyed.select(
            F.date_format("ship_day", "yyyy-MM-dd").alias("ship_day"),
            F.col("rev_dec").cast("double").alias("daily_revenue"),
            F.round(
                F.sum("rev_dec").over(w).cast("double") / F.count("*").over(w), 6
            ).alias("range_avg_7d"),
            F.count("*").over(w).cast("long").alias("days_in_frame"),
        )
        .orderBy("ship_day")
    )


def kmeans_price_segments(
    spark: SparkSession, sf_dir: str, *, k: int = 4, iterations: int = 4
) -> DataFrame:
    """Distributed Lloyd's K-means over order value (k=4 price segments,
    fixed literal inits, 4 iterations) — the iterative-algorithm shape
    every Spark deployment runs (IVF coarse quantizers, churn segments):
    centroids are a k-row relation BROADCAST each round, assignment is a
    CASE argmin evaluated inside the scan's codegen stage, the update is
    one map-side-combined aggregate — one pass over the facts per
    iteration, nothing but k (sum, count) rows ever reaches the driver
    (the centroid-sized collect the PQ/IVF builders also make).

    Fully engine-exact, unlike library KMeans: inits are shared literals,
    per-cluster sums are DECIMAL (associative), each new centroid is ONE
    double division rounded to 6 dp, ties assign to the lower cluster id —
    so the whole fixpoint replays as chained CTEs and the oracle pins the
    final centroids, sizes and means value-for-value."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast(DEC).alias("pd")
    )
    cents = [50000.0, 150000.0, 250000.0, 350000.0][:k]

    def assign_col(cs: list[float]):
        p = F.col("pd").cast("double")
        dists = [F.abs(p - F.lit(c)) for c in cs]
        expr = F.lit(len(cs) - 1)
        for i in range(len(cs) - 2, -1, -1):
            cond = dists[i] <= dists[i + 1]
            for j in range(i + 2, len(cs)):
                cond = cond & (dists[i] <= dists[j])
            expr = F.when(cond, F.lit(i)).otherwise(expr)
        return expr.alias("cl")

    for _ in range(iterations):
        # round INSIDE Spark (HALF_UP, matching SQL round) — Python's
        # round() is banker's and would diverge at exact .5 boundaries
        stats = (
            orders.select("pd", assign_col(cents))
            .groupBy("cl")
            .agg(
                F.round(
                    F.sum("pd").cast("double") / F.count("*").cast("double"), 6
                ).alias("c")
            )
            .collect()
        )
        by_cl = {r["cl"]: float(r["c"]) for r in stats}
        cents = [by_cl.get(i, cents[i]) for i in range(k)]
    final = (
        orders.select("pd", assign_col(cents))
        .groupBy("cl")
        .agg(F.sum("pd").alias("s"), F.count("*").alias("n"))
    )
    cent_col = F.create_map(
        *[x for i, c in enumerate(cents) for x in (F.lit(i), F.lit(c))]
    )[F.col("cl")]
    return final.select(
        F.col("cl").cast("int").alias("cluster_id"),
        F.round(cent_col, 6).alias("centroid"),
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
            "mean_price"
        ),
    ).orderBy("cluster_id")
