"""Unicode analyzer parity: the reference's full-text index is Lucene's
standard analyzer (reference indexes.py:73-86), which keeps Unicode letters,
and the reference corpus is Spanish (reference seed.py:189-193, Faker
es_ES) — "menú"/"café" must survive as single tokens. These tests pin that
the three spellings of the token class (Java regex / RE2 / Python re) agree
on accented text, end to end through BM25."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.functions.text import (
    PY_TOKEN_SPLIT_RE,
    TOKEN_SPLIT_RE,
    tokens,
)

ACCENTED = [
    "El Menú de Café y Ñandú 42",
    "niño pequeño — ärger straße",  # eszett lowercases to itself
    "русский текст и 日本語 mixed_with ascii",
]


def _py(s: str) -> list[str]:
    return [t for t in re.split(PY_TOKEN_SPLIT_RE, s.lower()) if t]


def test_menu_survives_as_one_token(spark):
    df = spark.createDataFrame([(ACCENTED[0],)], "text string")
    got = df.select(tokens(F.col("text")).alias("ts")).collect()[0]["ts"]
    assert got == ["el", "menú", "de", "café", "y", "ñandú", "42"]


@pytest.mark.parametrize("s", ACCENTED)
def test_three_engines_tokenize_identically(spark, s):
    spark_toks = (
        spark.createDataFrame([(s,)], "text string")
        .select(tokens(F.col("text")).alias("ts"))
        .collect()[0]["ts"]
    )
    duck_toks = duckdb.sql(
        "SELECT list_filter(string_split_regex(lower($s), $re), t -> t <> '')",
        params={"s": s, "re": TOKEN_SPLIT_RE},
    ).fetchone()[0]
    assert spark_toks == duck_toks == _py(s)


def test_bm25_matches_accented_query(spark):
    """Under the old ASCII analyzer 'menú' degraded to 'men' and matched the
    wrong document; the Unicode analyzer must rank the menú doc first."""
    from hybrid_vector_search_spark.operators.bm25 import fulltext

    docs = spark.createDataFrame(
        [
            (1, "el menú del café es excelente"),
            (2, "men at work shipping boxes"),
            (3, "totally unrelated text about spark"),
        ],
        "doc_id long, text string",
    )
    hits = fulltext(docs, "menú", 3, id_col="doc_id", text_col="text")
    rows = hits.collect()
    assert rows and rows[0]["doc_id"] == 1
    assert all(r["doc_id"] != 2 for r in rows)  # 'men' must NOT match 'menú'
