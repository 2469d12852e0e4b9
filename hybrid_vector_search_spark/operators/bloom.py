"""Distributed Bloom filter as a broadcastable (word, mask) relation.

The decontamination operator (plans.pipeline.decontaminate) broadcasts the
holdout's full distinct-shingle set into a map-side semi-join. That is the
right plan while the holdout is small, but the broadcast grows linearly with
the benchmark suite: at 100 TB-corpus scale a consortium holdout can reach
10⁸+ shingles (gigabytes of md5 keys) — past comfortable broadcast limits
even though the CORPUS side never needed to shuffle.

A Bloom filter fixes the broadcast size at ``m_bits/8`` bytes regardless of
holdout cardinality (1 MiB here for 2²³ bits), at the cost of a tunable
false-positive rate — and Bloom false positives are SAFE here because the
membership test is only a *prefilter*: survivors are re-verified against the
exact shingle set, so the final answer is exactly the unfiltered plan's
answer (no false negatives by construction: every hash of a present key was
OR-ed into the bitmap). This is the same guarantee structure Spark's own
runtime row-group filtering (InjectRuntimeFilter's bloom_filter_agg) relies
on; it is re-built here from first principles with md5-derived positions so
the DuckDB oracle can replay membership bit-for-bit.

Representation: the bitmap is a DataFrame of ``(word long, mask long)`` —
the OR of ``1 << (pos % 64)`` over every key hash landing in 64-bit word
``pos // 64``. Only NON-ZERO words materialize, so a sparse filter is even
smaller than m_bits/8. Build is one groupBy over k·|keys| tiny rows;
membership is k broadcast hash joins (map-side, no fact shuffle, no row
explosion of the probe side).

Reference parity note: the reference has no Bloom path (its decontamination
analog doesn't exist; closest is Atlas-side search). This operator is part
of the training-data-pipeline surface, mirroring the published CCNet/Dolma
decontamination recipe at the scale where exact broadcast stops working.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex digits = 60 bits — fits a signed 64-bit long with headroom, and both
# engines parse it identically (Spark conv(hex,16,10), DuckDB ('0x'||h)::BIGINT)
_HEX_DIGITS = 15


def _position(c: Column, seed: int, m_bits: int) -> Column:
    """Hash-family member ``seed``'s bit position for key ``c`` in [0, m_bits).

    md5(seed || '#' || key) → first 15 hex digits → integer → mod m_bits.
    The SQL twin is ``('0x' || substr(md5('{seed}#' || key), 1, 15))::BIGINT
    % m_bits`` — bit-identical in both engines.
    """
    h = F.md5(F.concat(F.lit(f"{seed}#"), c.cast("string")))
    return F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("long") % F.lit(m_bits)


def bloom_build(
    df: DataFrame, key_col: str, *, m_bits: int = 1 << 23, k: int = 4
) -> DataFrame:
    """Aggregate ``df[key_col]`` into a Bloom bitmap relation (word, mask).

    One narrow projection fans each key into its k positions (k tiny rows per
    key — the KEY side, which is the small side by assumption), then a single
    groupBy(word) OR-folds the set bits. Map-side partial bit_or applies, so
    the shuffle carries at most ``m_bits/64`` rows per task.
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    key = F.col(key_col)
    pos = F.explode(F.array(*[_position(key, i, m_bits) for i in range(k)])).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # F.shiftleft takes a literal shift count; the column-shift form
            # exists only in the SQL parser
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    m_bits: int = 1 << 23,
    k: int = 4,
) -> DataFrame:
    """Rows of ``df`` whose ``key_col`` MAY be in the filter (superset of the
    true members — callers re-verify survivors exactly).

    k broadcast hash joins against the (word, mask) relation — the fact side
    stays 1× (no probe-side explode), each join is map-side, and all k chain
    inside one stage. A key passes iff EVERY probe bit is set; a missing word
    row means all-zero, so an inner join on word already rejects the row.
    """
    out = df
    key = F.col(key_col)
    for i in range(k):
        b = bloom.select(
            F.col("word").alias(f"_bw{i}"), F.col("mask").alias(f"_bm{i}")
        )
        pos = _position(key, i, m_bits)
        out = (
            out.withColumn(f"_p{i}", pos)
            .withColumn(f"_w{i}", (F.col(f"_p{i}") / 64).cast("long"))
            .withColumn(
                f"_b{i}",
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT))"),
            )
            .drop(f"_p{i}")
        )
        out = out.join(
            F.broadcast(b), on=F.col(f"_w{i}") == F.col(f"_bw{i}"), how="inner"
        ).where(F.col(f"_bm{i}").bitwiseAND(F.col(f"_b{i}")) != 0)
    drop = [c for i in range(k) for c in (f"_w{i}", f"_b{i}", f"_bw{i}", f"_bm{i}")]
    return out.drop(*drop)
