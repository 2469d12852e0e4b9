r"""Text tokenization and n-gram column expressions.

The reference's analyzer is Lucene's standard analyzer inside the Atlas
full-text index (reference indexes.py:73-86), which keeps UNICODE letters —
the reference corpus is Spanish (reference seed.py:189-193, Faker es_ES), so
"menú"/"café" must survive as single tokens. Our engine pins an explicit,
oracle-reproducible definition: lowercase, split on runs of characters that
are neither Unicode letters nor Unicode digits, drop empties. The same class
is spelled three ways for three regex engines that all agree on it:

- ``TOKEN_SPLIT_RE`` — ``[^\p{L}\p{N}]+`` for Java regex (Spark ``F.split``
  / ``regexp_replace``) and RE2 (DuckDB ``string_split_regex``), which share
  the ``\p{L}``/``\p{N}`` property syntax;
- ``PY_TOKEN_SPLIT_RE`` — ``[\W_]+`` for Python ``re`` (no ``\p`` support):
  ``\w`` minus underscore is Unicode letters+digits (combining marks are
  excluded by all three engines, checked in tests).

Both sides of every text-family oracle evaluate the same class, so BM25 /
shingle / token-stat corpus statistics hash-match across engines
(SURVEY.md §7.5.1). On pure-ASCII corpora (the driver testdata) this is
byte-identical to the former ``[^a-z0-9]+`` analyzer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"
PY_TOKEN_SPLIT_RE = r"[\W_]+"


def tokens(text: Column) -> Column:
    """array<string> of lowercase tokens, empties removed."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (token shingles joined by a space).

    Built with the ``transform`` / ``slice`` higher-order functions — stays in
    codegen, no UDF. Documents shorter than *n* tokens produce no shingles.
    """
    toks = tokens(text)
    k = F.size(toks) - F.lit(n - 1)
    # sequence(1, 0) would count DOWN ([1, 0]); guard the short-doc case.
    idx = F.when(k >= F.lit(1), F.sequence(F.lit(1), k)).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams)


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the lowercased text (dedup shingling)."""
    s = F.lower(text)
    k = F.length(s) - F.lit(n - 1)
    idx = F.when(k >= F.lit(1), F.sequence(F.lit(1), k)).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.substring(s, i, F.lit(n)))
    return F.array_distinct(grams)


def chunk_index(n_tokens: Column, size: int, stride: int) -> Column:
    """array<int> of 0-based chunk ids covering ``n_tokens`` tokens with
    windows of ``size`` advancing by ``stride`` (the RAG/training-context
    chunking layout: the last window may be short, empty docs get none).

    Chunk count is exact integer arithmetic — 1 + ceil((n - size)/stride)
    via (n - size + stride - 1) div stride — so the DuckDB oracle reproduces
    the boundaries bit-for-bit, no float rounding at the edges."""
    if size <= 0 or stride <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    extra = (n_tokens - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)
    n_chunks = (
        F.when(n_tokens <= F.lit(0), F.lit(0))
        .when(n_tokens <= F.lit(size), F.lit(1))
        .otherwise(F.lit(1) + extra.cast("int"))
    )
    return F.when(
        n_chunks > F.lit(0), F.sequence(F.lit(0), n_chunks - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
