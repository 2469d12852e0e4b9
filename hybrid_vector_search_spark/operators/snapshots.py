"""Corpus snapshot diffing — what changed between two crawls/drops.

Every recurring ingest needs this report before reprocessing: which
documents are NEW since the last snapshot, which were REMOVED, which keys
persist but with MODIFIED content. It drives incremental pipelines (only
re-embed/re-dedup the added+modified slice — see ``dedup.jaccard_pairs_between``
for the matching incremental-dedup shape), audit trails, and drift alarms
(a removal spike usually means an upstream source broke).

Scale contract:
- Content comparison is by fingerprint (md5 of the content column), and the
  fingerprint is projected BEFORE the join — the shuffle carries
  (key, 32-hex) per side, never the documents themselves. At 100 TB the
  join is a narrow co-partitioned merge on the key; with both snapshots
  bucketed by key on disk it is shuffle-free.
- The diff is one full-outer join + one status projection: added = key only
  on the new side, removed = only on the old side, modified = both sides
  with different fingerprints. No window, no collect.
- md5 keeps the report md5-replayable by the DuckDB oracle (`snapshot_diff`
  driver query); swap in xxhash64 for cheaper fingerprints when
  cross-engine replay doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_col: str,
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """(key, status) with status ∈ added | removed | modified (| unchanged).

    ``include_unchanged=False`` (default) keeps the report proportional to
    the CHANGE SET, not the corpus — the property that makes diff-driven
    incremental processing cheaper than reprocessing."""
    o = old.select(
        F.col(key_col).alias("key"), F.md5(F.col(content_col)).alias("_ofp")
    )
    n = new.select(
        F.col(key_col).alias("key"), F.md5(F.col(content_col)).alias("_nfp")
    )
    joined = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("_ofp").isNull(), F.lit("added"))
        .when(F.col("_nfp").isNull(), F.lit("removed"))
        .when(F.col("_ofp") != F.col("_nfp"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select("key", status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def snapshot_diff_counts(
    old: DataFrame, new: DataFrame, key_col: str, content_col: str
) -> DataFrame:
    """(status, n) — the four-row monitoring rollup of :func:`snapshot_diff`
    (unchanged included, so the counts reconcile to |old ∪ new| keys)."""
    return (
        snapshot_diff(old, new, key_col, content_col, include_unchanged=True)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


def scd2_merge(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_col: str,
    *,
    old_version: int = 1,
    new_version: int = 2,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from two snapshots:
    ``(key, fingerprint, valid_from, valid_to, is_current)`` — the
    warehouse-standard history build that :func:`snapshot_diff` feeds.

    Semantics per key (valid_to is NULL while current):
    - unchanged: one row (old fp, from=old_version, to=NULL, current)
    - modified:  (old fp, from=old_version, to=new_version, closed) +
                 (new fp, from=new_version, to=NULL, current)
    - removed:   (old fp, from=old_version, to=new_version, closed)
    - added:     (new fp, from=new_version, to=NULL, current)

    Scale: same join shape as snapshot_diff — fingerprints projected before
    the one full-outer key join, then the history rows are a flat
    projection (array-of-structs explode), so output ∝ |keys| + |changes|
    with no additional shuffle."""
    o = old.select(
        F.col(key_col).alias("key"), F.md5(F.col(content_col)).alias("_ofp")
    )
    n = new.select(
        F.col(key_col).alias("key"), F.md5(F.col(content_col)).alias("_nfp")
    )
    j = o.join(n, "key", "full_outer")
    ov, nv = F.lit(old_version), F.lit(new_version)
    null_i = F.lit(None).cast("int")
    old_closed = F.struct(
        F.col("_ofp").alias("fingerprint"),
        ov.alias("valid_from"),
        nv.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    old_open = F.struct(
        F.col("_ofp").alias("fingerprint"),
        ov.alias("valid_from"),
        null_i.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    new_open = F.struct(
        F.col("_nfp").alias("fingerprint"),
        nv.alias("valid_from"),
        null_i.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    rows = (
        F.when(F.col("_ofp").isNull(), F.array(new_open))  # added
        .when(F.col("_nfp").isNull(), F.array(old_closed))  # removed
        .when(F.col("_ofp") == F.col("_nfp"), F.array(old_open))  # unchanged
        .otherwise(F.array(old_closed, new_open))  # modified
    )
    return j.select("key", F.explode(rows).alias("h")).select(
        "key", "h.fingerprint", "h.valid_from", "h.valid_to", "h.is_current"
    )


def scd2_apply(
    history: DataFrame | None,
    changes: DataFrame,
    version: int,
    key_col: str,
    content_col: str,
    *,
    op_col: str = "op",
) -> DataFrame:
    """Apply ONE CDC batch to an SCD2 history table and return the new
    history — the incremental maintenance step :func:`scd2_merge` is the
    two-snapshot special case of.

    ``changes`` carries (key, content, op) with op ∈ 'upsert' | 'delete',
    at most one op per key per batch (extra rows collapse via
    dropDuplicates on the key). Per current row:

    - no change row, or upsert with an UNCHANGED fingerprint → kept as-is
    - delete, or upsert with a changed fingerprint → closed
      (valid_to = version)
    - upsert with no current row or a changed fingerprint → a new open row
      (valid_from = version)

    Applying the same batch twice yields the same history (fingerprints
    already current → no-ops), which is what makes the streaming
    foreachBatch wrapper (streaming.ingest.stream_scd2_apply) safe under
    at-least-once batch redelivery.

    Scale: fingerprints are projected before the single full-outer join of
    CURRENT rows (∝ live keys) with the batch (∝ change set); closed
    history rows pass through untouched — no shuffle ever carries content
    or the closed tail.
    """
    ch = (
        changes.dropDuplicates([key_col])
        .where(F.col(op_col).isin("upsert", "delete"))
        .select(
            F.col(key_col).alias("key"),
            F.md5(F.col(content_col)).alias("_nfp"),
            F.col(op_col).alias("_op"),
            F.lit(True).alias("_has_ch"),
        )
    )
    spark = changes.sparkSession
    if history is None:
        key_type = changes.schema[key_col].dataType.simpleString()
        history = spark.createDataFrame(
            [],
            f"key {key_type}, fingerprint string, valid_from int,"
            " valid_to int, is_current boolean",
        )
    # Explicit presence markers, NOT fingerprint/op nullability: md5(NULL)
    # content gives a NULL fingerprint on a perfectly real current row, and
    # inferring presence from it would make that row invisible (a later
    # upsert would open a second is_current row the delete could never
    # close). Fingerprint comparisons are null-safe (<=>) for the same
    # reason.
    cur = history.where(F.col("is_current")).withColumn("_has_cur", F.lit(True))
    closed_tail = history.where(~F.col("is_current"))
    j = cur.join(ch, "key", "full_outer")
    has_cur = F.col("_has_cur").isNotNull()
    has_ch = F.col("_has_ch").isNotNull()
    fp_changed = ~(F.col("_nfp").eqNullSafe(F.col("fingerprint")))
    closes = has_cur & has_ch & ((F.col("_op") == "delete") | fp_changed)
    opens = has_ch & (F.col("_op") == "upsert") & (~has_cur | fp_changed)
    v = F.lit(int(version))
    null_i = F.lit(None).cast("int")
    closed = j.where(closes).select(
        "key", "fingerprint", "valid_from", v.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    kept = j.where(has_cur & ~closes).select(
        "key", "fingerprint", "valid_from", null_i.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    opened = j.where(opens).select(
        "key", F.col("_nfp").alias("fingerprint"), v.alias("valid_from"),
        null_i.alias("valid_to"), F.lit(True).alias("is_current"),
    )
    return closed_tail.unionAll(closed).unionAll(kept).unionAll(opened)
