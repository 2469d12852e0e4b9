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
    if name != "events":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # events.ts is TIMESTAMP(NANOS) in the file, which Spark's vectorized
    # parquet reader rejects outright. nanosAsLong is runtime-settable, so
    # set it here rather than at session-build time — callers (the
    # correctness driver included) supply their own SparkSession and never
    # go through our session.py. Save/restore the prior value: leaving it
    # set session-wide would make any LATER read of a TIMESTAMP(NANOS)
    # column silently scan as LongType instead of erroring.
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # With nanosAsLong the column scans as epoch-nanos LongType; convert
        # to a proper timestamp (micros — matches DuckDB's precision). Guard
        # on the scanned dtype so a future file with a plain TIMESTAMP column
        # passes through untouched. Force schema resolution inside the
        # conf-restore window (the read itself is lazy).
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
