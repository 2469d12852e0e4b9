"""Score fusion ($scoreFusion semantics) as an outer-join + expression.

The reference's hybrid mode runs two sub-pipelines (vector ANN + BM25 text)
inside ``$scoreFusion`` with sigmoid normalization and the weighted-sum
combination ``10·σ(s_vec) + 1·σ(s_txt)`` (reference backend/api.py:203-254:
normalization :222-223, weights :226-231, scoreDetails :233).

Semantics pinned here (SURVEY.md §2.4 A6, §7.5.3):
- Alignment of the two result sets *by document identity* is a FULL OUTER
  join on the id — a document found by only one branch still surfaces.
- A branch that did not return the document contributes **0** — i.e.
  ``coalesce(σ(s), 0)``, NOT ``σ(coalesce(s, 0))`` (σ(0)=0.5 would wrongly
  reward absence).
- ``score_details`` carries raw + normalized per-branch values, mirroring the
  reference's scoreDetails consumed by its frontend (main.js:104-151).
- Residual filters apply AFTER fusion (fuse-then-filter), matching the
  reference's observable output (SURVEY.md §2.12 asymmetry note).

Scale: each branch is already a top-k/top-candidates result (thousands of
rows, not the corpus), so the outer join is a broadcast-able join of two tiny
relations; cost lives in the branches, not the fusion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VECTOR_WEIGHT = 10.0
TEXT_WEIGHT = 1.0


def sigmoid(c: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-c))


def rank_fusion(
    branches: dict[str, DataFrame],
    *,
    id_col: str = "id",
    score_col: str = "score",
    rank_k: int = 60,
    weights: dict[str, float] | None = None,
    round_dp: int | None = 6,
    max_branch_rows: int | None = 1024,
) -> DataFrame:
    """Reciprocal-rank fusion (RRF): Σ_b w_b / (rank_k + rank_b(id)).

    The rank-based sibling of score_fusion (Atlas exposes both as
    $scoreFusion / $rankFusion; the reference uses only the former).
    Rank-based fusion is scale-free — immune to incomparable score
    distributions between branches — at the cost of discarding score
    magnitudes. Ranks are dense per branch, ties broken by id ascending so
    the result is engine-reproducible. Missing-from-branch contributes 0.

    Ranking needs a global total order per branch, which Spark can only
    compute in one partition — safe for the intended inputs (top-k branch
    results; the reference clamps k to ≤ 25, backend/api.py:115-119) but a
    scale trap for an arbitrary DataFrame. ``max_branch_rows`` therefore
    bounds every branch with a TakeOrderedAndProject top-N (per-partition
    top-N, THEN a single-partition merge of ≤ N·partitions rows — never a
    global sort) before the rank window; ranks 1..N are identical to the
    unbounded ranks, and rows past N contribute 0 exactly like
    missing-from-branch ids (truncated-list RRF, the standard IR practice).
    Pass None to disable ONLY when the caller guarantees bounded input."""
    from pyspark.sql import Window

    weights = weights or {n: 1.0 for n in branches}
    if set(branches) != set(weights):
        raise ValueError("branches and weights must have identical keys")
    names = sorted(branches)
    fused: DataFrame | None = None
    for name in names:
        b = branches[name]
        if max_branch_rows is not None:
            b = b.orderBy(
                F.col(score_col).desc(), F.col(id_col).asc()
            ).limit(max_branch_rows)
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        b = b.select(
            F.col(id_col).alias("id"),
            F.row_number().over(w).alias(f"_rank_{name}"),
        )
        fused = b if fused is None else fused.join(b, "id", "full_outer")
    combined = None
    for n in names:
        term = F.coalesce(
            F.lit(float(weights[n])) / (F.lit(float(rank_k)) + F.col(f"_rank_{n}")),
            F.lit(0.0),
        )
        combined = term if combined is None else combined + term
    if round_dp is not None:
        combined = F.round(combined, round_dp)
    return fused.select(F.col("id").alias(id_col), combined.alias(score_col))


def score_fusion(
    branches: dict[str, DataFrame],
    weights: dict[str, float],
    *,
    id_col: str = "id",
    score_col: str = "score",
    normalization: str = "sigmoid",
    include_details: bool = False,
    round_dp: int | None = 6,
) -> DataFrame:
    """Fuse N scored branches into (id, score [, score_details]).

    Each branch DataFrame must have columns (id_col, score_col). Output rows
    are the union of branch ids (full outer alignment).
    """
    if normalization != "sigmoid":
        raise ValueError(f"unsupported normalization {normalization!r}")
    if set(branches) != set(weights):
        raise ValueError("branches and weights must have identical keys")

    names = sorted(branches)
    fused: DataFrame | None = None
    for name in names:
        b = branches[name].select(
            F.col(id_col).alias("id"), F.col(score_col).alias(f"_raw_{name}")
        )
        fused = b if fused is None else fused.join(b, "id", "full_outer")

    norm_cols = {n: F.coalesce(sigmoid(F.col(f"_raw_{n}")), F.lit(0.0)) for n in names}
    combined = None
    for n in names:
        term = F.lit(float(weights[n])) * norm_cols[n]
        combined = term if combined is None else combined + term
    if round_dp is not None:
        combined = F.round(combined, round_dp)

    out_cols = [F.col("id").alias(id_col), combined.alias(score_col)]
    if include_details:
        details = F.struct(
            *[
                F.struct(
                    F.col(f"_raw_{n}").alias("raw"),
                    norm_cols[n].alias("normalized"),
                    F.lit(float(weights[n])).alias("weight"),
                ).alias(n)
                for n in names
            ]
        )
        out_cols.append(details.alias("score_details"))
    return fused.select(*out_cols)
