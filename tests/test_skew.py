"""Salted aggregation/join must equal their unsalted counterparts exactly
(associativity), and bucketed tables must join without an Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def test_salted_agg_equals_plain(spark):
    from hybrid_vector_search_spark.operators.skew import salted_agg
    from hybrid_vector_search_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, r.qty, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, r.qty, r.mx)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": ("sum", F.count("*")),
                "qty": ("sum", F.sum(F.col("l_quantity").cast("decimal(18,2)"))),
                "mx": ("max", F.max("l_extendedprice")),
            },
            factor=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    from hybrid_vector_search_spark.operators.skew import salted_join
    from hybrid_vector_search_spark.sources import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"), cust, "c_custkey", factor=4
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates partitions: the
    sort-merge join runs with NO Exchange on either side — the 100 TB
    repeated-join layout."""
    from hybrid_vector_search_spark.sources import load_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/wh'")
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "bktdb.orders_b"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "bktdb.lineitem_b"
    )
    a = spark.table("bktdb.orders_b")
    b = spark.table("bktdb.lineitem_b")
    # disable broadcast so the planner actually uses the bucketed sort-merge
    # path (at real scale both sides exceed any broadcast threshold)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
