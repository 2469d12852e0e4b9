"""Linear bag-of-words text classifier (naive-Bayes log-odds weights).

The fastText-filter shape used by large-scale pretraining pipelines
(CCNet-style quality / language gates): a document's score is a dot product
between its token counts and a vocab-sized weight vector, so scoring is
one token-keyed join — the classifier IS a linear model, trained here as
multinomial naive Bayes with add-one smoothing (the closed-form member of
that family, hence exactly reproducible in SQL — no SGD state).

Reference analog: the reference delegates all text relevance to the Atlas
Lucene index (reference backend/indexes.py:73-86) and ships no trainable
filter; this operator is part of the LLM-data-pipeline surface the task
brief adds on top of reference parity.

Scale notes (SCALE.md "classifier"):
- Training: the token relation aggregates map-side (partial_count) to a
  (tok, class) relation bounded by VOCAB size, never corpus size. Two
  scalar aggregates (class token totals, class doc counts) broadcast back.
- Scoring: the weight table is unigram-vocab-sized — much smaller than the
  corpus but still growing with it (Heaps' law), so the scoring join
  carries no forced broadcast hint: AQE broadcasts it while it measures
  small (a map-side hash join + per-doc sum) and shuffles on the token key
  once it doesn't. The corpus text itself never shuffles in either phase.
- Unseen tokens (scoring a NEW corpus with a trained model) fall back to
  the smoothing-only weight via coalesce, so the model object transfers.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["NBModel", "nb_fit", "nb_score", "nb_self_score"]


@dataclass(frozen=True)
class NBModel:
    """Lazy linear-classifier model: a vocab-sized weight relation plus a
    1-row relation of scalars (log-prior and the unseen-token fallback
    weight). Both are unevaluated DataFrames — fit+score compose into one
    Spark plan."""

    weights: DataFrame  # (tok string, weight double)
    scalars: DataFrame  # 1 row: (prior double, default_weight double)


def nb_fit(
    df: DataFrame, text_col: str, label_col: str, *, positive: str | Column
) -> NBModel:
    """Train multinomial NB with add-one smoothing on ``df``; rows where
    ``label_col == positive`` are the positive class, all others negative.

    weight(tok) = ln((c_pos+1)/(T_pos+V)) - ln((c_neg+1)/(T_neg+V))
    prior       = ln(n_pos_docs / n_neg_docs)
    where c_* are per-class token counts, T_* class token totals and V the
    corpus vocabulary size. A doc's NB log-odds is then exactly
    prior + Σ_occurrences weight(tok) — a linear model.
    """
    pos = F.col(label_col) == (F.lit(positive) if isinstance(positive, str) else positive)
    toks = df.select(
        pos.alias("is_pos"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    # vocab-sized: map-side partial counts, one shuffle of (tok, 2 longs)
    per_tok = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("is_pos"), 0).otherwise(1)).alias("c_neg"),
    )
    # three scalars derived from the vocab relation (tiny), broadcast back
    totals = per_tok.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
        F.count("*").alias("v"),
    )
    weights = per_tok.join(F.broadcast(totals)).select(
        "tok",
        (
            F.log((F.col("c_pos") + 1) / (F.col("t_pos") + F.col("v")))
            - F.log((F.col("c_neg") + 1) / (F.col("t_neg") + F.col("v")))
        ).alias("weight"),
    )
    docs = df.agg(
        F.sum(F.when(pos, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(pos, 0).otherwise(1)).alias("n_neg"),
    )
    scalars = docs.join(F.broadcast(totals)).select(
        F.log(F.col("n_pos") / F.col("n_neg")).alias("prior"),
        (
            F.log(F.lit(1.0) / (F.col("t_pos") + F.col("v")))
            - F.log(F.lit(1.0) / (F.col("t_neg") + F.col("v")))
        ).alias("default_weight"),
    )
    return NBModel(weights=weights, scalars=scalars)


def nb_score(model: NBModel, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Score ``df`` under ``model``: (id_col, score, pred) with
    score = prior + Σ weight(tok) over token OCCURRENCES (rounded 6dp for
    cross-engine reproducibility) and pred = score > 0. Docs with zero
    tokens score exactly the prior. Tokens absent from the model's vocab
    take the smoothing-only default weight, so a model trained on one
    corpus applies to another."""
    # explode_OUTER keeps token-less docs as one null-token row, so a single
    # per-doc aggregate covers the whole corpus — no docs-vs-scores rejoin,
    # exactly one exchange (the groupBy on id) in the entire scoring pass
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    )
    scored = (
        toks.join(F.broadcast(model.scalars))
        .join(model.weights, "tok", "left")
        .groupBy("id")
        .agg(
            F.round(
                F.first("prior")
                + F.sum(
                    # null tok = empty doc (contributes 0), NOT an unseen token
                    F.when(F.col("tok").isNull(), F.lit(0.0)).otherwise(
                        F.coalesce(F.col("weight"), F.col("default_weight"))
                    )
                ),
                6,
            ).alias("score")
        )
    )
    return scored.select(
        F.col("id").alias(id_col), "score", (F.col("score") > 0).alias("pred")
    )


def nb_self_score(
    df: DataFrame, id_col: str, text_col: str, label_col: str, *, positive: str
) -> DataFrame:
    """Fit on ``df`` and score the same rows — the corpus-gate deployment
    shape (train the filter on a labeled slice, sweep the corpus) collapsed
    to one relation; everything stays one lazy plan."""
    return nb_score(nb_fit(df, text_col, label_col, positive=positive), df, id_col, text_col)
