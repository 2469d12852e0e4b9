"""Positional inverted index and exact phrase search.

The reference's full-text surface is Atlas `$search` over `title`
(backend/api.py:214-221), which Lucene serves from a positional inverted
index; our BM25 operator (operators/bm25.py) covers the scoring half. This
module covers the *index* half: the (doc, term, position) relation and the
exact-phrase query evaluated as a k-way intersection of posting lists — the
standard IR positional-join, not a string scan.

- ``positional_index``: (id, term, pos) via one `posexplode` of the shared
  tokenizer (functions/text.py — same regex the BM25 stats and the DuckDB
  oracle use).
- ``phrase_search``: docs containing the phrase's tokens at consecutive
  positions. Each phrase term contributes a posting list shifted by its
  offset (pos - i); an inner join on (id, start) keeps exactly the
  positions where all k terms line up. Overlapping matches count
  ("table table table" contains "table table" twice) — a LIKE/replace scan
  can't express that, the positional join gets it for free.

Scale: at 100 TB the index is built once and persisted partitioned by a
term bucket (like operators/ivf.py's cluster layout); a phrase query then
reads only its k terms' postings (partition-pruned), and the (id, start)
intersection joins posting lists whose size is the term frequency, never
the corpus. The inline path here (pass the corpus DataFrame) re-derives the
index under the join — correct, with the term filter pushed into each
branch's scan; pass a cached/materialized ``index=`` to amortize across
queries exactly like SearchEngine reuses its BM25 stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .bm25 import _py_tokens


def positional_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, pos) — one row per token occurrence, pos 0-based."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    ).select("id", "term", "pos")


def phrase_search(
    df: DataFrame,
    phrase: str,
    *,
    id_col: str = "id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact phrase match: (id, n_occurrences, first_pos), one row per
    matching document. ``phrase`` goes through the engine tokenizer, so
    punctuation/case differences never cause silent misses."""
    terms = _py_tokens(phrase)
    if not terms:
        raise ValueError("phrase has no tokens after normalization")
    idx = index if index is not None else positional_index(df, id_col, text_col)
    hits: DataFrame | None = None
    for i, t in enumerate(terms):
        branch = idx.where(F.col("term") == t).select(
            "id", (F.col("pos") - F.lit(i)).alias("start")
        )
        hits = branch if hits is None else hits.join(branch, ["id", "start"])
    return (
        hits.groupBy("id")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min("start").alias("first_pos"),
        )
        .withColumnRenamed("id", id_col)
    )
