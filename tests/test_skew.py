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


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """1000 identical docs land in ONE (band, key) bucket: uncapped LSH would
    self-join them into ~500k candidate pairs; max_bucket_size=20 bounds the
    candidate set to C(20,2) per band while real near-dup pairs in a mixed
    corpus still surface."""
    from hybrid_vector_search_spark.operators.dedup import (
        lsh_candidates,
        minhash_near_dups,
        minhash_signatures,
    )

    boiler = [(i, "the same boilerplate footer text repeated verbatim everywhere") for i in range(1000)]
    real = [
        (2001, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2002, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    ]
    docs = spark.createDataFrame(boiler + real, ["doc_id", "text"])
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8, shingle_n=3)
    capped = lsh_candidates(sigs, bands=4, rows_per_band=2, max_bucket_size=20)
    n_pairs = capped.count()
    # survivors pair only among themselves: ≤ C(20,2) boilerplate pairs + the real pair
    assert n_pairs <= 20 * 19 // 2 + 1
    # the duplicate GROUP is still discovered (survivors pair with each other)
    assert capped.where((F.col("id_a") < 1000) & (F.col("id_b") < 1000)).count() > 0
    # and the genuine near-dup pair survives end-to-end through exact verify
    out = minhash_near_dups(
        docs, "doc_id", "text", min_jaccard=0.7, bands=4, rows_per_band=2,
        shingle_n=3, max_bucket_size=20,
    )
    assert out.where((F.col("id_a") == 2001) & (F.col("id_b") == 2002)).count() == 1
