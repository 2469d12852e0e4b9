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


CORRUPT_COL = "_corrupt_record"


def read_jsonl_permissive(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSONL read that CAPTURES malformed lines instead of dropping or
    dying on them — real interchange dumps always contain some. PERMISSIVE
    mode parses what it can; a line that fails lands verbatim in
    ``_corrupt_record`` with the data columns null, so ingest jobs can
    route rejects to a quarantine sink and account for them (the
    dropped-rows-are-silent failure mode is the one a 100 TB ingest can
    least afford). Pass the DATA schema only; the corrupt column is
    appended here.

    Spark caveat (pinned in tests): referring to ONLY the corrupt column in
    a filter is disallowed by the JSON reader — cache or select data
    columns alongside it.
    """
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    permissive: bool = True,
) -> DataFrame:
    """CSV edge-format read: explicit schema (no inference pass), optional
    corrupt-record capture. Same scale stance as JSONL — line-splittable
    ingest format, never the processing format (no pushdown, no pruning)."""
    reader = spark.read.schema(
        T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
        if permissive
        else schema
    ).option("header", str(header).lower())
    if permissive:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)
