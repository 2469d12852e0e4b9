"""Entity resolution — Fellegi-Sunter record linkage (blocked, weighted).

Record linkage dedupes ENTITIES rather than byte content: the same customer
re-ingested with a typo'd name and a drifted balance is one entity in two
rows, and no content hash or shingle set will say so. The reference engine's
corpus carries the same problem one level up (re-crawled pages, re-embedded
docs); this operator is the classic probabilistic answer (Fellegi & Sunter
1969) — the model behind Splink, Zingg, and every MDM dedupe:

1. **Blocking** (multi-pass): candidate pairs are generated per blocking
   key — an inverted-index self-join, Σ per-block n² fan-out, never
   corpus². Several cheap keys unioned beat one clever key (a pair missed
   by every pass is unrecoverable, so passes are chosen for complementary
   recall — the standard multi-pass discipline).
2. **Field comparison**: each candidate pair gets a boolean agreement
   vector (edit-distance bands, numeric tolerance, exact codes).
3. **Weighting**: each field contributes ln(m/u) on agreement and
   ln((1-m)/(1-u)) on disagreement (m = P(agree | same entity),
   u = P(agree | different entities)); the pair's score is the sum — the
   log-likelihood ratio of the match hypothesis. Pairs ≥ threshold link.

Determinism: agreements are integer/exact-string predicates (levenshtein,
equality, DECIMAL tolerance); weights are ln() of literal ratios — fixed
double constants identical in any engine — summed in fixed expression
order and rounded once, so the whole linkage replays bit-for-bit in SQL.

Scale: each blocking pass shuffles (id, key) only; the candidate union is
distinct-ed BEFORE the record payloads join back (payloads move once per
surviving pair, not per pass); the weighted compare is a map-only
projection. Skewed blocks are the operational risk — cap or salt hot keys
exactly as the dedup shingle joins document.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Comparator = tuple[str, Callable[[Column, Column], Column], float, float]


def fellegi_sunter_pairs(
    records: DataFrame,
    id_col: str,
    *,
    block_keys: Sequence[Column],
    comparators: Sequence[Comparator],
    threshold: float,
    round_dp: int = 6,
    max_block_size: int | None = None,
    stacked: bool = False,
) -> DataFrame:
    """(id_a, id_b, w_<field>..., weight) for candidate pairs scoring ≥
    threshold under the Fellegi-Sunter log-likelihood model.

    ``block_keys``: one blocking pass per expression (evaluated over
    ``records``); ``comparators``: (field, agree(a_struct, b_struct) →
    Boolean, m, u) triples. The threshold compares the ROUNDED weight, so
    the decision boundary is engine-portable.

    ``stacked=True`` (r13) runs all passes through ONE self-join: the keys
    must then share one Spark type (callers encode each pass injectively —
    e.g. a namespaced string), and they are exploded to (id, pass, key)
    rows so one exchange serves every pass instead of one join per pass.
    Candidates are identical by construction (a pair shares a stacked key
    iff it shares that pass's key); expensive key subexpressions (rank
    windows) are evaluated once instead of once per pass. Incompatible
    with ``max_block_size`` (measure per pass before stacking).

    ``max_block_size``: opt-in loud-failure guard (the
    dedup.embedding_near_dups broadcast_limit pattern). The candidate
    fan-out is Σ n² over blocks, so ONE hot key quadratically dominates the
    join; with the guard set, one eager aggregate job measures the largest
    block of every pass up front and raises with the salt-or-cap recipe
    instead of launching a join that cannot finish. Leave it None in
    latency-sensitive composition (it costs an extra job) and size blocking
    keys corpus-proportionally instead — see entity_resolution_pairs.
    """
    if not block_keys:
        raise ValueError("at least one blocking key is required")
    if not comparators:
        raise ValueError("at least one comparator is required")
    if stacked:
        if max_block_size is not None:
            raise ValueError("stacked=True does not support max_block_size")
        # two projections: window-bearing key expressions are evaluated in
        # the first (a generator cannot host a window function), the
        # explode runs over the materialized key columns in the second
        # materialized once (localCheckpoint): both self-join sides AND the
        # broadcast build read the same computed keys — window-bearing key
        # expressions would otherwise re-execute per consumer subtree. The
        # relation is (id, keys): |records| rows of small strings. Lazy
        # (eager=False, r14): one-time materialization at the first action,
        # inside the caller's timed execution window.
        withkeys = records.select(
            F.col(id_col).alias("_id"),
            *[bk.alias(f"_bk{i}") for i, bk in enumerate(block_keys)],
        ).localCheckpoint(eager=False)
        keyed = withkeys.select(
            "_id",
            F.posexplode(
                F.array(*[F.col(f"_bk{i}") for i in range(len(block_keys))])
            ).alias("_pass", "_bk"),
        ).where(F.col("_bk").isNotNull())
        a = keyed.select(F.col("_id").alias("id_a"), "_pass", "_bk")
        b = keyed.select(F.col("_id").alias("id_b"), "_pass", "_bk")
        cands = (
            a.join(b, ["_pass", "_bk"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return _score_candidates(
            cands, records, id_col, comparators=comparators,
            threshold=threshold, round_dp=round_dp,
        )
    if max_block_size is not None:
        sized = None
        for i, bk in enumerate(block_keys):
            per_key = (
                records.select(bk.alias("_bk"))
                .where(F.col("_bk").isNotNull())
                .groupBy("_bk")
                .count()
                .agg(F.max("count").alias("mx"))
                .select(F.lit(i).alias("pass_idx"), "mx")
            )
            sized = per_key if sized is None else sized.unionAll(per_key)
        worst = sized.orderBy(F.desc_nulls_last("mx")).first()
        if worst is not None and worst["mx"] is not None and worst["mx"] > max_block_size:
            raise ValueError(
                f"blocking pass {worst['pass_idx']} produces a block of "
                f"{worst['mx']} rows (> max_block_size={max_block_size}); the "
                f"pair fan-out is Σ n² over blocks, so this key would "
                f"dominate the join quadratically. Use a corpus-proportional "
                f"key (name prefix, sorted-neighborhood band over a row_number "
                f"window) so block sizes stay bounded as the corpus grows, "
                f"salt the hot key (append pmod(hash(id), s) and accept "
                f"intra-salt recall), or cap: route blocks over the limit to "
                f"a dedicated pass with a cheaper comparator."
            )
    cands = None
    for bk in block_keys:
        keyed = records.select(F.col(id_col).alias("_id"), bk.alias("_bk")).where(
            F.col("_bk").isNotNull()
        )
        a = keyed.select(F.col("_id").alias("id_a"), "_bk")
        b = keyed.select(F.col("_id").alias("id_b"), "_bk")
        p = (
            a.join(b, "_bk")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cands = p if cands is None else cands.unionAll(p)
    cands = cands.distinct()
    return _score_candidates(
        cands, records, id_col, comparators=comparators,
        threshold=threshold, round_dp=round_dp,
    )


def _score_candidates(
    cands: DataFrame,
    records: DataFrame,
    id_col: str,
    *,
    comparators: Sequence[Comparator],
    threshold: float,
    round_dp: int,
) -> DataFrame:
    """Field comparison + Fellegi-Sunter weighting for candidate (id_a,
    id_b) pairs — the shared precision phase behind both blocking shapes."""
    payload = records.select(
        F.col(id_col).alias("_id"), F.struct(*records.columns).alias("_r")
    )
    paired = (
        cands.join(payload.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_r", "_ra")
        .join(payload.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumnRenamed("_r", "_rb")
    )
    weight_cols = []
    total = None
    for name, agree, m, u in comparators:
        w = F.when(
            agree(F.col("_ra"), F.col("_rb")),
            F.log(F.lit(m) / F.lit(u)),
        ).otherwise(F.log(F.lit(1.0 - m) / F.lit(1.0 - u)))
        col = F.round(w, round_dp).alias(f"w_{name}")
        weight_cols.append(col)
        total = w if total is None else total + w
    return (
        paired.select(
            "id_a",
            "id_b",
            *weight_cols,
            F.round(total, round_dp).alias("weight"),
        )
        .where(F.col("weight") >= threshold)
        .orderBy("id_a", "id_b")
    )
