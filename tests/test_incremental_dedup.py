"""Cross-corpus incremental dedup (dedup.jaccard_pairs_between): base×new
pair space only, equivalence to the self-join kernel restricted to cross
pairs, and the union-side document-frequency skew guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_between,
    shingle_table,
)

BASE = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "one two three four five six seven eight nine"),
    (3, "totally unrelated content about weather patterns today"),
]
NEW = [
    # near-dup of base doc 1 (one token changed at the end)
    (101, "alpha beta gamma delta epsilon zeta eta iota"),
    # exact copy of base doc 2
    (102, "one two three four five six seven eight nine"),
    # near-dup of ANOTHER new doc only — must NOT pair (new×new excluded)
    (103, "purple monkey dishwasher quantum banana field trip"),
    (104, "purple monkey dishwasher quantum banana field crew"),
]


def _pairs(spark, min_jaccard=0.3, **kw):
    base = spark.createDataFrame(BASE, ["doc_id", "text"])
    new = spark.createDataFrame(NEW, ["doc_id", "text"])
    sh_b = shingle_table(base, "doc_id", "text", n=3)
    sh_n = shingle_table(new, "doc_id", "text", n=3)
    return jaccard_pairs_between(sh_b, sh_n, min_jaccard=min_jaccard, **kw)


def test_matches_self_join_restricted_to_cross_pairs(spark):
    """The cross-corpus kernel must equal the union-corpus self-join kernel
    filtered to (base, new) pairs — same shingles, same Jaccard arithmetic."""
    got = {
        (r.id_base, r.id_new, round(r.jaccard, 9))
        for r in _pairs(spark).collect()
    }
    union = spark.createDataFrame(BASE + NEW, ["doc_id", "text"])
    sh = shingle_table(union, "doc_id", "text", n=3)
    want = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in jaccard_pairs(sh, min_jaccard=0.3).collect()
        if r.id_a <= 100 and r.id_b > 100  # cross pairs only (ids sorted a<b)
    }
    assert got == want
    assert {(a, b) for a, b, _ in got} == {(1, 101), (2, 102)}


def test_new_by_new_pairs_never_materialize(spark):
    """Docs 103/104 are near-identical but both in the NEW snapshot: the
    incremental kernel must not pair them (that's the base corpus's own
    dedup, already done)."""
    ids = {(r.id_base, r.id_new) for r in _pairs(spark).collect()}
    assert (103, 104) not in ids and (104, 103) not in ids


def test_exact_copy_scores_jaccard_one(spark):
    row = [r for r in _pairs(spark).collect() if r.id_new == 102]
    assert len(row) == 1 and row[0].jaccard == 1.0


def test_union_side_df_guard_drops_hot_shingles(spark):
    """A shingle hot across BOTH sides is dropped before the join: with
    max_shingle_df=1 every shared shingle (df >= 2 by construction of a
    match) is gone, so no pair can survive."""
    out = _pairs(spark, max_shingle_df=1)
    assert out.count() == 0
