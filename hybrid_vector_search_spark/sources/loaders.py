"""Parquet table loaders for the driver-provided testdata layout.

The reference's sources are MongoDB collection scans
(``collection.find({})``, reference transform-seed.py:113-115) and
aggregation-pipeline cursors (reference backend/api.py:285). Our source is the
columnar parquet scan: predicate pushdown, column pruning and row-group
min/max skipping all apply automatically once the plan is declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Keep this lazy — no .cache(), no .count() —
    so Catalyst can push query-specific filters/projections into the scan."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in the file, which Spark's vectorized
        # parquet reader rejects outright. nanosAsLong is runtime-settable, so
        # set it here rather than at session-build time — callers (the
        # correctness driver included) supply their own SparkSession and never
        # go through our session.py.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        # With nanosAsLong the column scans as epoch-nanos LongType; convert
        # to a proper timestamp (micros — matches DuckDB's precision). Guard
        # on the scanned dtype so a future file with a plain TIMESTAMP column
        # passes through untouched.
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
