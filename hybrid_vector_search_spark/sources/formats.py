"""Interchange formats beyond parquet (S7's distribution-format slot).

Parquet is the engine's native format; JSONL (one JSON object per line) is
the lingua franca of training-data interchange, so the engine reads and
writes it losslessly. Scale notes: ALWAYS pass the explicit schema on read —
schema inference is a full extra pass over 100 TB; JSONL reads are
line-splittable so parallelism matches parquet, but there is no column
pruning or predicate pushdown, which is why it is an EDGE format here
(ingest/export), never the processing format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Export as line-delimited JSON (one object per row)."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Read JSONL with an explicit schema (no inference pass)."""
    return spark.read.schema(schema).json(path)
