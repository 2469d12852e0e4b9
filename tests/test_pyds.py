"""sources.pyds: the partition-parallel synthetic catalog data source."""

from __future__ import annotations

from hybrid_vector_search_spark.sources import pyds
from hybrid_vector_search_spark.sources.catalog_gen import CATALOG_SCHEMA


def _read(spark, n, rows_per_partition, seed=7):
    pyds.register(spark)
    return (
        spark.read.format("synthetic_catalogs")
        .option("n", n)
        .option("seed", seed)
        .option("rows_per_partition", rows_per_partition)
        .load()
    )


def test_partition_count_does_not_change_data(spark):
    """The determinism contract: row i is a pure function of (seed, i), so
    any partitioning yields the identical dataset."""
    a = sorted(r["_id"] for r in _read(spark, 200, 23).collect())
    b = sorted(r["_id"] for r in _read(spark, 200, 200).collect())
    c = sorted(r["_id"] for r in _read(spark, 200, 7).collect())
    assert a == b == c and len(a) == 200


def test_generation_is_distributed(spark):
    df = _read(spark, 100, 10)
    assert df.rdd.getNumPartitions() == 10
    assert df.count() == 100


def test_schema_matches_catalog_gen(spark):
    df = _read(spark, 5, 5)
    assert df.schema == CATALOG_SCHEMA


def test_rows_flow_through_flatten(spark):
    """The generated relation composes with the reference's transform
    (explode products, promote ids) like any other source."""
    from hybrid_vector_search_spark.sources.catalog_gen import flatten_catalogs

    flat = flatten_catalogs(_read(spark, 50, 10))
    rows = flat.collect()
    assert len(rows) >= 150  # 3-8 products per catalog
    assert {"catalogId", "_id"} <= set(flat.columns)


def test_seed_changes_data(spark):
    a = {r["_id"] for r in _read(spark, 50, 50, seed=1).collect()}
    b = {r["_id"] for r in _read(spark, 50, 50, seed=2).collect()}
    assert a != b
