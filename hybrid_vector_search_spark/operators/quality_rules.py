"""Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
Models: ... Gopher", §A.1.1 — public paper; thresholds are parameters here).

A large-scale training-data pipeline gates documents on cheap structural
rules before any model-based scoring. Every rule below is a pure Catalyst
column expression over one row — zero shuffle, whole-stage codegen, no
Python — so at 100 TB this is a map-only pass fused into the parquet scan
(the filter on ``passes`` pushes down to the scan when selected early).

The reference has no corpus-filter stage (it serves a curated catalog,
reference seed.py generates clean data by construction); this module is part
of the training-pipeline extension surface. Rule set:

- ``n_words``        token count (shared tokenizer, functions.text.tokens)
- ``mean_word_len``  mean token length
- ``frac_alpha``     fraction of tokens containing an alphabetic char
- ``frac_bullet_lines`` / ``frac_ellipsis_lines``  list-y / truncated docs
- ``symbol_word_ratio``  '#' and '...' occurrences per word
- ``stop_hits``      how many canonical English stopwords appear at all
- ``passes``         the conjunction, with parameterized thresholds
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

#: stopword probe set (Gopher §A.1.1 uses exactly these eight)
STOP_PROBE = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _occurrences(text: Column, needle: str) -> Column:
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 6)).otherwise(
        F.lit(0.0)
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document rule metrics + the pass/fail conjunction.

    Still map-only and zero-Python, but STAGED as three stacked projections
    so the expensive array builds evaluate once per row: higher-order-
    function expressions are excluded from whole-stage-codegen subexpression
    elimination, so the original single-projection form re-tokenized the
    full text once per metric — and then once more per term of ``passes``
    (~15 regex splits per document; 2.8 s for a 5 000-doc map at sf0.1,
    the r7 bench's flagged row). The lower projection materializes the
    token and line arrays; the middle one derives each metric from those
    array COLUMNS; the top one folds ``passes`` from the metric columns.
    CollapseProject keeps the stages apart precisely because the aliased
    arrays are non-cheap and multiply referenced. Output is byte-identical
    (``passes`` always compared the same rounded expressions).
    """
    text = F.col(text_col)
    base = df.select(
        F.col(id_col),
        text.alias("_text"),
        tokens(text).alias("_toks"),
        F.filter(
            F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ).alias("_lines"),
    )

    toks, lines, raw = F.col("_toks"), F.col("_lines"), F.col("_text")
    n_words = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("\\p{L}")))
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike("^[-*•]")))
    n_ellipsis = F.size(F.filter(lines, lambda l: l.rlike("\\.\\.\\.$")))
    n_symbols = _occurrences(raw, "#") + _occurrences(raw, "...")
    tok_set = F.array_distinct(toks)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in STOP_PROBE]),
            lambda s: F.array_contains(tok_set, s),
        )
    )
    metrics = base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        _frac(sum_len, n_words).alias("mean_word_len"),
        _frac(n_alpha, n_words).alias("frac_alpha"),
        _frac(n_bullet, n_lines).alias("frac_bullet_lines"),
        _frac(n_ellipsis, n_lines).alias("frac_ellipsis_lines"),
        _frac(n_symbols, n_words).alias("symbol_word_ratio"),
        stop_hits.alias("stop_hits"),
    )

    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_ratio)
        & (F.col("frac_bullet_lines") <= max_bullet_frac)
        & (F.col("frac_ellipsis_lines") <= max_ellipsis_frac)
        & (F.col("frac_alpha") >= min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return metrics.select("*", passes.alias("passes"))
