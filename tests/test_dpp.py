"""Dynamic partition pruning: a partitioned fact + filtered broadcast dim
must prune fact partitions at runtime — the scan pattern that makes
dimension-filtered star joins feasible at 100 TB (only matching partitions
are read, decided by the dim filter's runtime result)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hybrid_vector_search_spark.sources import load_table


@pytest.fixture(scope="module")
def partitioned_orders(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("dpp") / "orders_by_year")
    (
        load_table(spark, "/root/testdata/sf0.01", "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .mode("overwrite")
        .parquet(d)
    )
    return d


def test_dpp_subquery_in_plan(spark, partitioned_orders):
    fact = spark.read.parquet(partitioned_orders)
    # dim: years in which purchases happened — known only at runtime, so
    # static pruning is impossible; DPP must inject the runtime subquery
    # into the fact scan's partition filters (join key == partition column)
    dim = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .where(F.col("event_type") == "purchase")
        .select(F.year("ts").alias("y"))
        .distinct()
    )
    joined = (
        fact.join(F.broadcast(dim), fact.o_year == dim.y)
        .groupBy("o_year")
        .agg(F.count("*").alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(o_year" in plan, plan


def test_partition_pruning_static(spark, partitioned_orders):
    """Static partition pruning: a literal o_year filter must reach
    PartitionFilters, and results equal the unpartitioned table's."""
    fact = spark.read.parquet(partitioned_orders)
    q = fact.where(F.col("o_year") == 1997)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1997" in plan.split("PartitionFilters")[1][:200], plan
    expected = (
        load_table(spark, "/root/testdata/sf0.01", "orders")
        .where(F.year("o_orderdate") == 1997)
        .count()
    )
    assert q.count() == expected
