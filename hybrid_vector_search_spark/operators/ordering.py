"""Deterministic epoch shuffle: reproducible global training order, no sort.

A training job over a 100 TB corpus needs every epoch to visit documents in
a pseudo-random order that is (a) reproducible bit-for-bit across reruns and
cluster sizes, (b) different per epoch, and (c) producible WITHOUT a global
sort. The classic recipe (T5's / Megatron's shuffled-shard manifests): hash
every key with an epoch-salted hash, route rows to ``n_shards`` shards by
hash prefix, and order rows *within* a shard by the full hash — loaders then
stream shards independently (or in any interleaving), and the concatenated
order is a fixed pseudo-random permutation of the corpus.

Scale shape: ONE hash-partitioned shuffle into shard groups plus a
per-shard (window-partitioned) sort — the per-partition sort every parquet
writer already performs — never a global ``ORDER BY``. Changing ``epoch``
changes only the salt, so re-shuffling an epoch is the same one-shuffle job;
nothing about the previous epoch's layout is consulted. The hash key is the
full 32-hex-char md5 of ``salt:epoch#key``, so the within-shard order is
total (collision-free in practice) and identical in any engine that can
compute md5 — the DuckDB oracle replays it verbatim.

The reference has no training-order surface (its corpus fits one Mongo
collection, reference transform-seed.py:43-66); this family is brief-driven:
the manifest (`shard_manifest`) is what a data-loader fleet reads to split
work — per-shard row and token budgets let the loader pack shards onto
workers without scanning data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_key(key: Column, *, epoch: int, salt: str) -> Column:
    """Full md5 hex of 'salt:epoch#key' — the per-epoch total-order key."""
    return F.md5(F.concat(F.lit(f"{salt}:{epoch}#"), key.cast("string")))


def epoch_order(
    df: DataFrame,
    key_col: str,
    *,
    epoch: int = 0,
    n_shards: int = 8,
    salt: str = "epoch",
) -> DataFrame:
    """Assign every row a ``(shard, pos)`` training-order coordinate.

    ``shard`` = first 8 hex chars of the epoch hash mod ``n_shards`` (the
    same 32-bit-prefix contract as sampling.hash_bucket); ``pos`` = dense
    1-based rank within the shard by the full hash (ties broken by the key
    itself, though md5 ties are astronomically unlikely). The global epoch
    order is shard-major: (shard, pos) ascending.

    At 100 TB ``n_shards`` is thousands; each window partition is one
    shard (corpus/n_shards rows), so the sort is bounded per-shard and the
    plan is one shuffle + per-partition sort — no global ordering stage.
    """
    ekey = _epoch_key(F.col(key_col), epoch=epoch, salt=salt)
    shard = (
        F.conv(F.substring(ekey, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_ekey", F.col(key_col))
    return (
        df.withColumn("_ekey", ekey)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("_ekey")
    )


def dense_ids(
    df: DataFrame,
    key_col: str,
    *,
    n_shards: int = 64,
    salt: str = "ids",
    id_name: str = "dense_id",
) -> DataFrame:
    """Assign globally dense, gap-free ids ``0..n-1`` WITHOUT a
    single-partition window (the scalable replacement for
    ``monotonically_increasing_id`` — which leaves gaps — and for
    ``row_number() OVER ()`` — which funnels the corpus through ONE task).

    Two-level rank: rows hash into ``n_shards`` shards and rank locally
    (bounded per-shard sort, same shape as :func:`epoch_order`); a tiny
    ``n_shards``-row census of shard sizes turns into broadcast base
    offsets via a prefix sum, and ``dense_id = offset[shard] + pos - 1``.
    One corpus shuffle + one broadcast join; the heavy relation never
    sorts globally. Ids are a pure function of ``(salt, key)`` — stable
    under reruns and repartitioning — and the global order they realize
    is the salted-hash order, replayable as
    ``row_number() OVER (ORDER BY md5(salt#key), key) - 1``.

    Unlike :func:`epoch_order` (mod shards — any bucketing works for a
    per-epoch permutation), shards here are contiguous RANGES of the hash
    space (``floor(prefix32 · n_shards / 2^32)``), so shard-major +
    within-shard hash order IS the global hash order — lexicographic
    fixed-width lowercase hex compares identically to the 128-bit value,
    and the 32-bit prefix ranges are prefixes of that order."""
    ekey = _epoch_key(F.col(key_col), epoch=0, salt=salt)
    prefix = F.conv(F.substring(ekey, 1, 8), 16, 10).cast("long")
    shard = F.floor(prefix * n_shards / F.lit(4294967296)).cast("int")
    win = Window.partitionBy("shard").orderBy("_ekey", F.col(key_col))
    ordered = (
        df.withColumn("_ekey", ekey)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(win))
        .drop("_ekey")
    )
    w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ordered.groupBy("shard")
        .agg(F.count("*").alias("_n"))
        .select(
            "shard",
            F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_base"),
        )
    )
    return (
        ordered.join(F.broadcast(offsets), "shard")
        .withColumn(id_name, (F.col("_base") + F.col("pos") - 1).cast("long"))
        .drop("shard", "pos", "_base")
    )


def shard_manifest(
    ordered: DataFrame,
    *,
    len_col: str | None = None,
) -> DataFrame:
    """Per-shard loader manifest over an :func:`epoch_order` result: row
    count and (optionally) the summed length/token budget — what a loader
    fleet needs to pack shards onto workers without touching the data.
    One small aggregate (n_shards output rows), map-side partials."""
    aggs = [F.count("*").alias("n_rows")]
    if len_col is not None:
        aggs.append(F.sum(F.col(len_col)).alias("len_sum"))
    return ordered.groupBy("shard").agg(*aggs).orderBy("shard")
