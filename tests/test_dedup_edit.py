"""edit_distance_near_dups: known-edit pairs, threshold exclusion, and the
thresholded-kernel equivalence with plain Levenshtein within bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.dedup import edit_distance_near_dups


def _corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the quiet green forest before the rain starts falling"
    )
    rows = [
        (1, base),
        (2, base.replace("quick", "quack")),          # 1 edit, near-identical shingles
        (3, base + " tonight"),                        # 8 edits (appended)
        (4, "completely different content about spark dataframes and "
            "catalyst optimizer internals with nothing shared at all here"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_known_edit_counts_and_threshold(spark):
    docs = _corpus(spark)
    got = {
        (r.id_a, r.id_b): r.edits
        for r in edit_distance_near_dups(
            docs, "doc_id", "text", max_edits=10
        ).collect()
    }
    assert got.get((1, 2)) == 1
    assert got.get((1, 3)) == 8
    # doc 4 shares no shingles -> never a candidate; pairs above the edit
    # bound are dropped even when LSH proposes them
    assert all(4 not in pair for pair in got)
    tight = {
        (r.id_a, r.id_b): r.edits
        for r in edit_distance_near_dups(
            docs, "doc_id", "text", max_edits=3
        ).collect()
    }
    assert (1, 2) in tight and (1, 3) not in tight


def test_thresholded_kernel_equals_plain_levenshtein_within_bound(spark):
    docs = _corpus(spark)
    pairs = edit_distance_near_dups(docs, "doc_id", "text", max_edits=10)
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb"))
    checked = (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .select("edits", F.levenshtein("_ta", "_tb").alias("plain"))
        .collect()
    )
    assert len(checked) >= 2
    assert all(r.edits == r.plain for r in checked)
