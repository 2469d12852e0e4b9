"""Naive-Bayes log-odds classifier (operators/classifier.py): closed-form
weights against a pure-Python reference, prior-only scoring for token-less
docs, the unseen-token fallback that makes a trained model transfer to a
new corpus, and the broadcast plan shape of the scoring join."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.classifier import (
    nb_fit,
    nb_score,
    nb_self_score,
)

CORPUS = [
    (1, "the quick brown fox jumps", "en"),
    (2, "the lazy dog sleeps here", "en"),
    (3, "el zorro rapido salta", "es"),
    (4, "le chien dort ici", "fr"),
    (5, "the dog and the fox", "en"),
    (6, "", "en"),  # token-less: must score exactly the prior
]


def _tok(t: str) -> list[str]:
    return [w for w in re.split(r"[\W_]+", t.lower()) if w]


def _python_model(rows):
    c_pos: dict[str, int] = {}
    c_neg: dict[str, int] = {}
    n_pos = n_neg = 0
    for _, text, lang in rows:
        pos = lang == "en"
        n_pos, n_neg = n_pos + pos, n_neg + (not pos)
        for w in _tok(text):
            (c_pos if pos else c_neg)[w] = (c_pos if pos else c_neg).get(w, 0) + 1
    vocab = set(c_pos) | set(c_neg)
    t_pos, t_neg, v = sum(c_pos.values()), sum(c_neg.values()), len(vocab)
    weights = {
        w: math.log((c_pos.get(w, 0) + 1) / (t_pos + v))
        - math.log((c_neg.get(w, 0) + 1) / (t_neg + v))
        for w in vocab
    }
    prior = math.log(n_pos / n_neg)
    default = math.log(1.0 / (t_pos + v)) - math.log(1.0 / (t_neg + v))
    return weights, prior, default


def test_self_score_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "lang"])
    got = {r.doc_id: (r.score, r.pred) for r in
           nb_self_score(df, "doc_id", "text", "lang", positive="en").collect()}
    weights, prior, _ = _python_model(CORPUS)
    assert len(got) == len(CORPUS)
    for doc_id, text, _lang in CORPUS:
        want = round(prior + sum(weights[w] for w in _tok(text)), 6)
        assert got[doc_id][0] == want, (doc_id, got[doc_id], want)
        assert got[doc_id][1] == (want > 0)


def test_token_less_doc_scores_exactly_the_prior(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.score for r in
           nb_self_score(df, "doc_id", "text", "lang", positive="en").collect()}
    _, prior, _ = _python_model(CORPUS)
    assert out[6] == round(prior, 6)


def test_unseen_tokens_take_the_smoothing_fallback(spark):
    """A model trained on one corpus scores a NEW corpus: tokens absent from
    the training vocab contribute the smoothing-only default weight, so the
    model object transfers instead of dropping rows or NULLing scores."""
    train = spark.createDataFrame(CORPUS, ["doc_id", "text", "lang"])
    model = nb_fit(train, "text", "lang", positive="en")
    new = spark.createDataFrame(
        [(101, "the fox zzzunseen"), (102, "zzzunseen qqqnovel")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.score for r in nb_score(model, new, "doc_id", "text").collect()}
    weights, prior, default = _python_model(CORPUS)
    want101 = round(prior + weights["the"] + weights["fox"] + default, 6)
    want102 = round(prior + 2 * default, 6)
    assert got == {101: want101, 102: want102}


def test_scoring_join_is_broadcast(spark):
    """The weight relation is vocab-sized — growing with the corpus — so it
    carries NO forced broadcast hint; on a vocabulary that measures small,
    AQE must still pick BroadcastHashJoin at runtime for the scoring join
    (the corpus token relation never shuffles on tok). The FINAL adaptive
    plan is inspected after execution, since the runtime conversion is the
    behavior under test."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "lang"])
    out = nb_self_score(df, "doc_id", "text", "lang", positive="en")
    out.collect()  # materialize so AQE finalizes join strategies
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the adaptive plan print appends the pre-AQE "Initial Plan" section,
    # which legitimately shows the sort-merge the runtime replaced — only
    # the finalized section above it is the behavior under test
    final = plan.split("Initial Plan")[0]
    assert "isFinalPlan=true" in final, plan
    assert "BroadcastHashJoin" in final, plan
    assert "SortMergeJoin" not in final, plan


def test_pred_is_score_sign(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text", "lang"])
    out = nb_self_score(df, "doc_id", "text", "lang", positive="en")
    bad = out.where((F.col("pred") != (F.col("score") > 0))).count()
    assert bad == 0
