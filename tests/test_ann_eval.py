"""operators.ann_eval: the self-attesting recall report's semantics —
exact-side facts, per-query floor, whole-report mean floor."""

from __future__ import annotations

from hybrid_vector_search_spark.operators import ann_eval


def _exact(spark):
    # 2 queries × k=3 exact neighbours; top-1 of q0 is id 7 (score ties
    # broken low-id: id 5 and 7 both 0.9 → top1 must be 5... no: engine
    # order is score DESC then id ASC, so top1 = lowest id among max score)
    rows = [
        (0, 5, 0.9),
        (0, 7, 0.9),
        (0, 2, 0.5),
        (1, 1, 1.0),
        (1, 4, 0.8),
        (1, 9, 0.7),
    ]
    return spark.createDataFrame(rows, "query_id long, vec_id long, score double")


def test_exact_side_facts_and_per_query_floor(spark):
    approx = spark.createDataFrame(
        # q0 recovers 2/3, q1 recovers 1/3 (plus a non-exact id that must
        # not count as a hit)
        [(0, 5), (0, 2), (1, 1), (1, 99)],
        "query_id long, vec_id long",
    )
    got = {
        r["query_id"]: r
        for r in ann_eval.recall_report(
            _exact(spark), approx, k=3, floor=0.6
        ).collect()
    }
    assert got[0]["n_exact"] == 3 and got[1]["n_exact"] == 3
    assert got[0]["exact_top1_id"] == 5  # max score, then id ASC
    assert got[0]["exact_top1_score"] == 0.9
    assert got[1]["exact_top1_id"] == 1
    assert got[0]["recall_ok"] is True  # 2/3 >= ceil(0.6*3)=2
    assert got[1]["recall_ok"] is False  # 1/3 < 2


def test_mean_floor_is_whole_report(spark):
    approx = spark.createDataFrame(
        [(0, 5), (0, 7), (0, 2), (1, 99)],  # q0: 3/3, q1: 0/3 → mean 0.5
        "query_id long, vec_id long",
    )
    rep = ann_eval.recall_report(
        _exact(spark), approx, k=3, floor=0.0, mean_floor=0.5
    ).collect()
    assert all(r["mean_recall_ok"] is True for r in rep)
    rep2 = ann_eval.recall_report(
        _exact(spark), approx, k=3, floor=0.0, mean_floor=0.51
    ).collect()
    assert all(r["mean_recall_ok"] is False for r in rep2)


def test_empty_approx_still_reports_exact_side(spark):
    approx = spark.createDataFrame([], "query_id long, vec_id long")
    rep = ann_eval.recall_report(
        _exact(spark), approx, k=3, floor=0.1, mean_floor=0.1
    ).collect()
    assert [r["query_id"] for r in rep] == [0, 1]
    assert all(not r["recall_ok"] and not r["mean_recall_ok"] for r in rep)
    assert all(r["n_exact"] == 3 for r in rep)
