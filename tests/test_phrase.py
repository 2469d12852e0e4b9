"""Positional inverted index + exact phrase search."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from .conftest import SF_MID


def _py_phrase_counts(texts: dict, phrase: str) -> dict:
    """Reference: tokenize, count consecutive-run matches (overlaps count)."""
    pterms = [t for t in re.split(r"[\W_]+", phrase.lower()) if t]
    out = {}
    for i, text in texts.items():
        toks = [t for t in re.split(r"[\W_]+", (text or "").lower()) if t]
        starts = [
            s
            for s in range(len(toks) - len(pterms) + 1)
            if toks[s : s + len(pterms)] == pterms
        ]
        if starts:
            out[i] = (len(starts), starts[0])
    return out


@pytest.fixture(scope="module")
def docs(spark):
    from hybrid_vector_search_spark.sources import load_table

    return load_table(spark, SF_MID, "documents").cache()


def test_phrase_search_matches_python_reference(spark, docs):
    from hybrid_vector_search_spark.operators.phrase import phrase_search

    texts = {r.doc_id: r.text for r in docs.collect()}
    for phrase in ("fast table", "slow hash batch", "table table"):
        got = {
            r.doc_id: (r.n_occurrences, r.first_pos)
            for r in phrase_search(docs, phrase, id_col="doc_id", text_col="text").collect()
        }
        assert got == _py_phrase_counts(texts, phrase), phrase
        assert got  # the corpus actually contains each probe phrase


def test_phrase_overlapping_occurrences_count(spark):
    from hybrid_vector_search_spark.operators.phrase import phrase_search

    df = spark.createDataFrame(
        [(1, "table table table"), (2, "table"), (3, "a table table b")],
        "id long, text string",
    )
    got = {r.id: (r.n_occurrences, r.first_pos) for r in phrase_search(df, "table table").collect()}
    # overlap: positions 0 and 1 both match in doc 1 — a replace()-count scan
    # would see only one
    assert got == {1: (2, 0), 3: (1, 1)}


def test_phrase_normalizes_through_tokenizer(spark):
    from hybrid_vector_search_spark.operators.phrase import phrase_search

    df = spark.createDataFrame([(1, "Fast, TABLE! scan")], "id long, text string")
    got = phrase_search(df, "fAst   TaBle").collect()
    assert len(got) == 1 and got[0].first_pos == 0

    with pytest.raises(ValueError):
        phrase_search(df, "  ,,, ")


def test_phrase_prebuilt_index_path(spark, docs):
    from hybrid_vector_search_spark.operators.phrase import phrase_search, positional_index

    idx = positional_index(docs, "doc_id", "text").cache()
    direct = {
        (r.doc_id, r.n_occurrences, r.first_pos)
        for r in phrase_search(docs, "fast table", id_col="doc_id", text_col="text").collect()
    }
    via_index = {
        (r.doc_id, r.n_occurrences, r.first_pos)
        for r in phrase_search(docs, "fast table", id_col="doc_id", index=idx).collect()
    }
    assert direct == via_index
    idx.unpersist()


def test_phrase_term_filter_pushed_to_scan(spark, docs):
    """The inline path pushes each branch's term filter into the plan —
    Filter(term = 'x') sits under the join, so a persisted term-partitioned
    index would partition-prune instead of full-scan."""
    from hybrid_vector_search_spark.operators.phrase import phrase_search

    plan = phrase_search(docs, "fast table", id_col="doc_id", text_col="text")._jdf.queryExecution().optimizedPlan().toString()
    assert "fast" in plan and "table" in plan
