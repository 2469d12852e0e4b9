"""Streaming embed-and-ingest: the reference's offline embedding backfill
(embed.py: find → batch-embed → update, restartable via --skip-existing) as
an incremental Structured Streaming pipeline with exactly-once semantics.

- Source: parquet file stream (new document files appear → picked up once).
- Transform: the SAME iterator-Pandas-UDF embedder the batch path uses
  (operators.embed) — embedding is a narrow map, so it streams trivially.
- Sink: append-mode parquet + checkpoint. The checkpoint IS the skip-existing
  ledger: a restart resumes from the last committed file offset and never
  re-embeds or duplicates (tested), where the reference re-scans the whole
  collection and filters client-side (embed.py:95-96).

Scale: each micro-batch embeds only new files; with trigger(availableNow)
this is an idempotent catch-up job safe to run from cron — state lives in
the checkpoint, not in the data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.embed import HashingEmbedder, embed_texts


def stream_embed_ingest(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_path: str,
    *,
    text_col: str = "text",
    emb_col: str = "embedding",
    embedder=None,
):
    """Start (availableNow) the embed-and-append stream; returns the query.

    Callers await termination; re-invoking with the same checkpoint embeds
    only files that appeared since the last run."""
    embedder = embedder or HashingEmbedder()
    schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    embedded = stream.withColumn(emb_col, embed_texts(embedder, F.col(text_col)))
    return (
        embedded.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def load_ingested(spark: SparkSession, target_path: str) -> DataFrame:
    return spark.read.parquet(target_path)
