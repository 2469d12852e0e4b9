"""Self-attesting recall reports for approximate-ANN paths.

The IVF / LSH / PQ searches are deliberately approximate — their result
sets depend on KMeans assignments, seeded hyperplanes, or trained
codebooks, none of which a SQL oracle can replay. What an oracle CAN
verify is the *contract*: the exact top-k per query (brute-force
cosine — fully SQL-expressible) and the claim "the approximate search
recovered at least ``floor`` of it". ``recall_report`` emits exactly
that relation, computing recall inside the plan:

    (query_id, k, n_exact, exact_top1_id, exact_top1_score, recall_ok)

``n_exact`` / ``exact_top1_*`` come from the EXACT side, so the oracle
checks them value-for-value; ``recall_ok`` is the approximate side's
attestation — the oracle states it as TRUE, so any recall regression
below the floor flips the boolean and hash-fails the driver's
correctness gate instead of hiding in a rows-only row. This mirrors the
reference's ``numCandidates`` recall dial (reference backend/api.py:120,
local-test.py:151): the user picks a candidate budget, the engine owes
them evidence the budget is enough.

Scale shape: exact side is a bulk ``knn_join`` (broadcast queries,
partition-local top-k — knn.py:137); the approximate side is the probed
search under test; the comparison is a broadcast-sized join of two
(queries × k)-row relations and one tiny aggregate. Nothing here adds a
pass over the corpus beyond the two searches being compared.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_report(
    exact: DataFrame,
    approx: DataFrame,
    *,
    k: int,
    floor: float,
    mean_floor: float | None = None,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "score",
) -> DataFrame:
    """Per-query recall attestation of ``approx`` against ``exact``.

    ``exact``: (query_id, id, score) — the brute-force top-k per query
    (ordered or not; only membership and the max score matter).
    ``approx``: (query_id, id) — the approximate top-k per query.

    Two attestation levels, because a single query's recall is a noisy
    draw while the mean over the query set concentrates:
    - ``recall_ok``: |approx ∩ exact| >= ceil(floor * k) for THIS query —
      a loose per-query sanity floor;
    - ``mean_recall_ok`` (when ``mean_floor`` is given): the mean recall
      over ALL queries in the report >= mean_floor — the tight contract,
      replicated onto every row so the oracle pins it per row.

    Both inputs are tiny (queries × k rows), so the join and the
    whole-report window below are broadcast-sized regardless of corpus
    scale.
    """
    need = int(math.ceil(floor * k))
    ex = exact.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("__eid"),
        F.col(score_col).alias("__escore"),
    )
    ap = approx.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("__aid"),
        F.lit(1).alias("__hit"),
    )
    joined = ex.join(
        ap,
        (ex["query_id"] == ap["query_id"]) & (ex["__eid"] == ap["__aid"]),
        "left",
    ).select(ex["query_id"], "__eid", "__escore", "__hit")
    per_q = joined.groupBy("query_id").agg(
        F.lit(k).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_exact"),
        # tiebreak matches the engine's (score DESC, id ASC) total order
        F.expr("max_by(__eid, struct(__escore, -__eid))").alias(
            "exact_top1_id"
        ),
        F.max("__escore").alias("exact_top1_score"),
        F.coalesce(F.sum("__hit"), F.lit(0)).alias("__n_hit"),
    )
    out = per_q.withColumn("recall_ok", F.col("__n_hit") >= F.lit(need))
    if mean_floor is not None:
        from pyspark.sql import Window

        # whole-report window: the report is |queries| rows, so the single
        # partition this implies is a few rows, never data-scale
        w = Window.partitionBy(F.lit(1))
        mean_recall = F.sum("__n_hit").over(w) / (
            F.lit(k) * F.count("*").over(w)
        )
        out = out.withColumn(
            "mean_recall_ok", mean_recall >= F.lit(mean_floor)
        )
    return out.drop("__n_hit").orderBy("query_id")
