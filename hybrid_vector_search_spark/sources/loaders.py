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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_ts(df)
    return df


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Pin events.ts to session-local TIMESTAMP regardless of how the file
    encodes it. The driver-generated parquet stores ``timestamp[us]`` with no
    timezone, which Spark scans as TIMESTAMP_NTZ; time functions such as
    ``unix_micros``/``window`` require TIMESTAMP. The session timezone is UTC
    (session.py), so the cast relabels the same wall-clock instant the DuckDB
    oracle reads — values, not just types, stay comparable. The dtype guard
    keeps a future plain-TIMESTAMP file a no-op."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
