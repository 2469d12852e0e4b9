"""Text-analysis operators for training-data pipelines.

Extensions beyond the reference surface (BASELINE.json north-star): the
per-document statistics an LLM-data pipeline computes at corpus scale —
language ID, quality scoring, token counting, fingerprinting. All are
single-pass, per-row column expressions (no shuffle at all except where a
groupBy is the semantics), so they scale with scan bandwidth.

Definitions are pinned (and mirrored in the DuckDB oracle):
- tokens: functions.text.tokens (lower, split non-alphanumeric runs)
- stopword ratio: |distinct(tokens) ∩ stoplist| / |distinct(tokens)|
- language ID: argmax over per-language stopword ratios, alphabetical
  tie-break, 'und' when the best ratio < MIN_LANG_RATIO
- quality score: bounded combination of length, type-token ratio, alnum
  ratio, and stopword presence (each term a ratio of integers — exact and
  engine-independent before the final rounding)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import char_ngrams, tokens

# Tiny pinned stopword lists (public, frequency-derived). Enough for a
# deterministic heuristic; swap for real lists (spaCy/NLTK) in production.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "no", "por"),
    "fr": ("le", "la", "de", "et", "un", "est", "pas", "pour", "que", "dans"),
}
MIN_LANG_RATIO = 0.05


def _stop_ratio(distinct_toks: Column, lang: str) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(distinct_toks, stop)).cast("double") / F.greatest(
        F.size(distinct_toks), F.lit(1)
    ).cast("double")


def oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    vocab_size: int = 1000,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a token vocabulary —
    the tokenizer-coverage diagnostic run before committing a vocab to a
    training run (docs with high OOV are mis-languaged or junk; a vocab
    with high corpus OOV is undersized).

    ``vocab``: any (token) DataFrame; defaults to the corpus's own top
    ``vocab_size`` tokens by document frequency (ties broken by token
    string, so the cut is deterministic). The vocabulary is broadcast into
    the scoring join — vocab relations are bounded by the tokenizer, not
    the corpus — and the corpus makes one exploded pass + one groupBy(id).

    Returns (id, n_tokens, n_oov, oov_rate[6dp]); token-less docs report
    0 tokens and rate 0.0.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode_outer(tokens(F.col(text_col))).alias("tok")
    )
    if vocab is None:
        dfreq = (
            toks.where(F.col("tok").isNotNull())
            .groupBy("tok")
            .agg(F.countDistinct("id").alias("df"))
        )
        # orderBy().limit() → TakeOrderedAndProject (per-partition heaps):
        # the vocab cut never funnels the token relation into one task
        vocab = (
            dfreq.orderBy(F.col("df").desc(), F.col("tok").asc())
            .limit(vocab_size)
            .select("tok")
        )
    known = vocab.select(F.col("tok"), F.lit(1).alias("_in_vocab"))
    return (
        toks.join(F.broadcast(known), "tok", "left")
        .groupBy("id")
        .agg(
            F.count("tok").alias("n_tokens"),
            F.count(F.when(F.col("tok").isNotNull() & F.col("_in_vocab").isNull(), 1)).alias(
                "n_oov"
            ),
        )
        .select(
            "id",
            "n_tokens",
            "n_oov",
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6)
            )
            .alias("oov_rate"),
        )
    )


def source_token_divergence(
    df: DataFrame, group_col: str, text_col: str, *, round_dp: int = 6
) -> DataFrame:
    """KL divergence of each group's unigram token distribution from the
    whole corpus's — the distribution-shift radar for TEXT (the token-side
    sibling of the embedding drift monitor): a source whose language mix,
    template noise, or domain jargon diverges from the corpus shows a high
    KL long before a human reads samples. Emits (group, n_tokens, n_vocab,
    kl_divergence).

    KL(P_g ‖ Q) = Σ_t p_{t,g} · ln(p_{t,g} / q_t), with p and q exact count
    ratios (every group term exists in the corpus, so q_t > 0 — KL is
    finite by construction). Arithmetic is double + final 6-dp rounding,
    the same engine-parity recipe as the LM scorers: per-term ln ulp
    differences and sum-order drift are ~1e-13 against a 5e-7 rounding
    margin.

    Plan: one token explosion → one (group, tok) count; the corpus token
    relation and group totals derive FROM that aggregate (vocab-sized and
    group-sized) and join back on the token key — no forced hint, since
    vocabulary grows with the corpus (Heaps' law): AQE broadcasts it while
    it measures small and falls back to a term-keyed shuffle join at scale.
    """
    toks = df.select(
        F.col(group_col).alias("g"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    gt = toks.groupBy("g", "tok").agg(F.count("*").alias("c"))
    g_tot = gt.groupBy("g").agg(F.sum("c").alias("n_g"))
    corp = gt.groupBy("tok").agg(F.sum("c").alias("c_t"))
    n_total = corp.agg(F.sum("c_t").alias("n_total"))
    p = F.col("c") / F.col("n_g")
    q = F.col("c_t") / F.col("n_total")
    return (
        gt.join(corp, "tok")
        .join(F.broadcast(g_tot), "g")
        .crossJoin(F.broadcast(n_total))
        .groupBy("g")
        .agg(
            F.any_value("n_g").alias("n_tokens"),
            F.count("*").alias("n_vocab"),
            F.round(F.sum(p * F.log(p / q)), round_dp).alias("kl_divergence"),
        )
    )


def source_token_js(
    df: DataFrame, group_col: str, text_col: str, *, round_dp: int = 6
) -> DataFrame:
    """Jensen-Shannon divergence of each group's unigram distribution from
    the REST of the corpus — the symmetric, bounded (≤ ln 2) sibling of
    source_token_divergence's KL: JS never blows up on tokens the rest
    lacks, so it ranks sources comparably even when vocabularies barely
    overlap (where KL(P‖corpus) saturates on q→p dominance instead).
    Emits (group, n_tokens, js_divergence).

    JS(P, Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = (P+Q)/2, with P the group's
    distribution and Q the rest-of-corpus distribution. Only the group's
    own (g, tok) rows are materialized: tokens ABSENT from the group
    contribute q·ln 2 each to the Q-side sum, which telescopes to
    ln 2 · (1 − Σ_{t∈g} q_t) — one aggregate over the same rows, so the
    relation stays Σ|group vocabularies|, never |groups| × |vocab|.

    Same engine-parity recipe as the KL: exact count ratios, double
    log-sum, 6-dp rounding (per-term ulp and sum-order drift ~1e-13
    against a 5e-7 margin). Same plan shape too: one token explosion, one
    (group, tok) count, vocab/group-sized joins with no forced hint."""
    toks = df.select(
        F.col(group_col).alias("g"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    gt = toks.groupBy("g", "tok").agg(F.count("*").alias("c"))
    g_tot = gt.groupBy("g").agg(F.sum("c").alias("n_g"))
    corp = gt.groupBy("tok").agg(F.sum("c").alias("c_t"))
    n_total = corp.agg(F.sum("c_t").alias("n_total"))
    p = F.col("c") / F.col("n_g")
    q = (F.col("c_t") - F.col("c")) / (F.col("n_total") - F.col("n_g"))
    m = (p + q) / F.lit(2.0)
    p_term = p * F.log(p / m)
    q_term = F.when(F.col("c_t") > F.col("c"), q * F.log(q / m)).otherwise(F.lit(0.0))
    ln2 = float(math.log(2.0))
    return (
        gt.join(corp, "tok")
        .join(F.broadcast(g_tot), "g")
        .crossJoin(F.broadcast(n_total))
        .groupBy("g")
        .agg(
            F.any_value("n_g").alias("n_tokens"),
            F.round(
                F.lit(0.5) * F.sum(p_term)
                + F.lit(0.5) * (F.sum(q_term) + F.lit(ln2) * (F.lit(1.0) - F.sum(q))),
                round_dp,
            ).alias("js_divergence"),
        )
    )


def compression_ratio(
    df: DataFrame, id_col: str, text_col: str, *, level: int = 6
) -> DataFrame:
    """Per-doc zlib compressibility — the cheap redundancy signal quality
    pipelines (Gopher's repetition analysis, Dolma's filters) use to catch
    boilerplate/template/spam text: natural prose compresses to ~0.4-0.6 of
    its size, pathological repetition far below.

    Arrow kernel (zlib is CPython stdlib — no SQL twin for the compressed
    SIZE, so its exact value is pinned by pytest, while the driver row
    attests the checkable contracts instead): map-only, no shuffle, fixed
    compression level so the ratio is a pure function of the bytes.
    Returns (id, n_bytes, n_compressed, compression_ratio[6dp],
    roundtrip_ok); empty docs report ratio 0.0. ``roundtrip_ok`` is the
    losslessness attestation, verified IN the kernel:
    decompress(compress(bytes)) == bytes — the property that makes the
    signal trustworthy at all.
    """
    import zlib
    from typing import Iterator

    import pandas as pd

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, text in zip(pdf["id"], pdf["t"]):
                b = (text or "").encode("utf-8")
                if b:
                    z = zlib.compress(b, level)
                    c = len(z)
                    ok = zlib.decompress(z) == b
                else:
                    c, ok = 0, True
                out.append(
                    (i, len(b), c, round(c / len(b), 6) if b else 0.0, ok)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "id", "n_bytes", "n_compressed", "compression_ratio", "roundtrip_ok",
                ],
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).repartition(par)
    return src.mapInPandas(
        kern,
        "id long, n_bytes long, n_compressed long, compression_ratio double,"
        " roundtrip_ok boolean",
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting: regex tokens, whitespace tokens, distinct tokens,
    total/mean token length — all via higher-order functions, zero shuffle."""
    toks = tokens(F.col(text_col))
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        tok_chars.cast("long").alias("n_token_chars"),
        F.round(
            tok_chars.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double"), 6
        ).alias("mean_token_len"),
    )


# GPT-2-style pre-tokenizer, restricted to constructs RE2 also supports
# (no lookahead) so the DuckDB oracle replays it verbatim: an optional
# leading space glued to a letter run, digit run, or punctuation run.
# Both Java regex and RE2 use leftmost-first alternation, so the piece
# boundaries agree across engines.
BPE_PRETOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """BPE-ish token counting: the subword-tokenizer PRE-tokenization pass
    (GPT-2's regex split, minus RE2-unsupported lookahead) — the unit real
    context-length accounting is done in before merges apply. Per doc:
    piece count, distinct pieces, characters covered, mean piece length.
    Pure codegen expressions — map-only, zero shuffle."""
    pieces = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_PRETOKEN_RE), 0
    )
    chars = F.aggregate(
        F.transform(pieces, lambda p: F.length(p)), F.lit(0), lambda a, x: a + x
    )
    n = F.size(pieces)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_pieces"),
        F.size(F.array_distinct(pieces)).cast("long").alias("n_distinct_pieces"),
        chars.cast("long").alias("n_piece_chars"),
        F.round(
            chars.cast("double") / F.greatest(n, F.lit(1)).cast("double"), 6
        ).alias("mean_piece_len"),
    )


def _language_pred_from_ratios(ratios: "dict[str, Column]") -> Column:
    """argmax stopword-overlap ratio with alphabetical tie-break, 'und'
    below MIN_LANG_RATIO — over ALREADY-ROUNDED per-language ratios."""
    # argmax with alphabetical tie-break: strict > against all earlier langs
    best_lang = None
    best_ratio = None
    for lang in sorted(ratios):
        r = ratios[lang]
        if best_lang is None:
            best_lang, best_ratio = F.lit(lang), r
        else:
            cond = r > best_ratio
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_ratio = F.when(cond, r).otherwise(best_ratio)
    return F.when(best_ratio >= F.lit(MIN_LANG_RATIO), best_lang).otherwise(
        F.lit("und")
    )


def language_pred_expr(dt: Column) -> Column:
    """``pred_lang`` as a pure column expression over the DISTINCT-token
    array ``dt``. Shared by :func:`language_id` and the single-pass
    corpus-gate plan (r14), so the two can never drift."""
    return _language_pred_from_ratios(
        {lang: F.round(_stop_ratio(dt, lang), 6) for lang in sorted(STOPWORDS)}
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-overlap language ID with deterministic tie-break."""
    distinct_toks = F.array_distinct(tokens(F.col(text_col)))
    out = df.select(F.col(id_col), distinct_toks.alias("_dt"))
    langs = sorted(STOPWORDS)
    for lang in langs:
        out = out.withColumn(f"ratio_{lang}", F.round(_stop_ratio(F.col("_dt"), lang), 6))
    return out.select(
        F.col(id_col),
        *[F.col(f"ratio_{lang}") for lang in langs],
        _language_pred_from_ratios(
            {lang: F.col(f"ratio_{lang}") for lang in langs}
        ).alias("pred_lang"),
    )


def quality_expr(text: Column) -> Column:
    """The rounded composite ``quality`` score as a pure column expression —
    shared by :func:`quality_score` and the single-pass corpus-gate plan
    (r14)."""
    toks = tokens(text)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    len_sat = F.least(n.cast("double") / F.lit(50.0), F.lit(1.0))
    ttr = nd.cast("double") / F.greatest(n, F.lit(1)).cast("double")
    alnum = F.length(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]", "")).cast("double")
    alnum_ratio = alnum / F.greatest(F.length(text), F.lit(1)).cast("double")
    stop_en = _stop_ratio(F.array_distinct(toks), "en")
    score = len_sat * (F.lit(0.5) + F.lit(0.5) * ttr) * alnum_ratio * (
        F.lit(0.8) + F.lit(0.2) * F.least(stop_en * 10.0, F.lit(1.0))
    )
    return F.round(score, 6)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite quality in [0,1]: length saturation × lexical diversity ×
    alnum density, boosted by English stopword presence. Every component is
    a ratio of exact integers; only the final product is floating."""
    text = F.col(text_col)
    toks = tokens(text)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    ttr = nd.cast("double") / F.greatest(n, F.lit(1)).cast("double")
    alnum = F.length(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]", "")).cast("double")
    alnum_ratio = alnum / F.greatest(F.length(text), F.lit(1)).cast("double")
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(ttr, 6).alias("ttr"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        quality_expr(text).alias("quality"),
    )


def fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, ngram: int = 5, kernel: str = "pandas"
) -> DataFrame:
    """Document fingerprinting: exact content hash (normalized) + min-hash of
    character n-grams (winnowing-style representative hash — equal for texts
    sharing their minimal n-gram, robust to trailing edits).

    kernel="pandas" (default): hashlib md5 over rolling character windows in
    an Arrow-batched kernel — one md5 per character position is exactly the
    shape where C hashlib beats the Catalyst lambda interpreter (~5× at
    sf0.1). kernel="sql" keeps the pure-Catalyst twin; both produce
    identical hex values (tests/test_kernels.py)."""
    from .dedup import normalized_text

    if kernel == "sql":
        grams = char_ngrams(F.col(text_col), ngram)
        min_gram = F.array_min(F.transform(grams, lambda g: F.md5(g)))
        return df.select(
            F.col(id_col),
            F.md5(normalized_text(F.col(text_col))).alias("content_hash"),
            min_gram.alias("min_ngram_hash"),
        )

    import hashlib
    import re
    from typing import Iterator

    import pandas as pd

    norm_re = re.compile(r"[\W_]+")

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chs, mins = [], []
            for text in pdf["t"]:
                s = (text or "").lower()
                normed = norm_re.sub(" ", s).strip()
                chs.append(hashlib.md5(normed.encode("utf-8")).hexdigest())
                if len(s) >= ngram:
                    mins.append(
                        min(
                            hashlib.md5(s[i : i + ngram].encode("utf-8")).hexdigest()
                            for i in range(len(s) - ngram + 1)
                        )
                    )
                else:
                    mins.append(None)
            out = pdf[["id"]].copy()
            out["content_hash"] = chs
            out["min_ngram_hash"] = mins
            yield out

    # small tables arrive as one parquet split; fan the CPU-bound kernel out
    # across cores (a few MB of text — the shuffle is noise vs the hashing)
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).repartition(par)
    out = src.mapInPandas(kern, "id long, content_hash string, min_ngram_hash string")
    return out.withColumnRenamed("id", id_col)


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-LM quality proxy (CCNet-style): per-doc mean unigram negative
    log-probability under the corpus's own empirical distribution — fluent /
    typical docs score low, gibberish and outliers high.

    Plan shape: one explode → token-count aggregate builds the "language
    model" (vocab-sized — no broadcast hint: vocabulary grows with the
    corpus, so AQE broadcasts it only while it measures small); the scoring
    pass joins each doc's tokens against it and averages. The corpus is
    scanned twice (token relation aggregates map-side to vocab size; at
    100 TB the vocab relation is the only thing that moves)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    total_freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    corpus_n = total_freq.agg(F.sum("cnt").alias("n_total"))
    lm = total_freq.join(F.broadcast(corpus_n)).select(
        "tok", (-F.log(F.col("cnt") / F.col("n_total"))).alias("neg_logp")
    )
    return (
        toks.join(lm, "tok")
        .groupBy("id")
        .agg(
            F.round(F.avg("neg_logp"), 6).alias("mean_neg_logp"),
            F.count("*").alias("n_tokens"),
        )
    )


def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str, *, broadcast_lm: bool = True
) -> DataFrame:
    """Bigram-LM quality score (the CCNet/KenLM perplexity-filter shape, one
    order up from :func:`unigram_logprob`): per-doc mean negative log
    P(w_i | w_{i-1}) under the corpus's own bigram counts —
    -ln(cnt(w_{i-1} w_i) / cnt(w_{i-1} as left context)). Every bigram a doc
    contains is by construction in the corpus LM, so no smoothing term is
    needed and the score is exactly reproducible in SQL.

    Plan shape mirrors unigram_logprob at one order higher: bigrams come
    from a codegen `transform` over the token array (no UDF); the LM is two
    vocab-sized aggregates (bigram counts; left-context counts derived from
    them map-side) joined back to the scoring relation. The corpus text
    itself never shuffles — only the bigram relation moves.

    Scale caveat: a BIGRAM vocabulary grows roughly quadratically in the
    unigram vocabulary, so unlike the unigram LM it can exceed broadcast /
    driver limits on a very large corpus. ``broadcast_lm=True`` (default,
    right for bench-scale and most bounded-vocab corpora) broadcasts the LM
    into the scoring join; set ``broadcast_lm=False`` on corpora whose
    bigram vocab is too large to broadcast — the scoring join then shuffles
    both sides by the 2-token gram key (sort-merge; a skewed head gram costs
    more here, which is the price of an un-broadcastable LM).

    Local-mode fixture: small testdata arrives as ONE parquet split, which
    would serialize the (CPU-heavy) bigram transform on one core — fan out
    to defaultParallelism first, same as fingerprint_stats. On a real
    cluster the input is already many splits and this repartition is a
    cheap no-op to remove."""
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .repartition(par)
        .select("id", tokens(F.col("t")).alias("ts"))
    )
    k = F.size("ts") - F.lit(1)
    idx = F.when(k >= F.lit(1), F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = toks.select(
        "id",
        F.explode(
            F.transform(idx, lambda i: F.array_join(F.slice(F.col("ts"), i, 2), " "))
        ).alias("gram"),
    )
    bi = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    # left-context totals: sum bigram counts per first token (vocab-sized
    # input, so this reduction is tiny — never the corpus)
    ctx = bi.groupBy(F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("left")).agg(
        F.sum("cnt").alias("ctx_cnt")
    )
    lm = bi.join(
        F.broadcast(ctx) if broadcast_lm else ctx,
        F.split_part(F.col("gram"), F.lit(" "), F.lit(1)) == F.col("left"),
    ).select("gram", (-F.log(F.col("cnt") / F.col("ctx_cnt"))).alias("neg_logp"))
    return (
        grams.join(lm if broadcast_lm else lm, "gram")
        .groupBy("id")
        .agg(
            F.round(F.avg("neg_logp"), 6).alias("mean_neg_logp"),
            F.count("*").alias("n_bigrams"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, kernel: str = "pandas"
) -> DataFrame:
    """Within-document repetition (Gopher-style quality rule): the fraction
    of word n-grams that are repeats of an earlier n-gram in the same doc.
    Map-only either way (zero shuffle); kernel="pandas" (default) tokenizes
    and counts in an Arrow batch kernel — measured ~10× over the Catalyst
    higher-order-function twin (kernel="sql"), which stays as the
    cross-check (pinned equal in tests)."""
    if kernel == "sql":
        toks = tokens(F.col(text_col))
        k = F.size(toks) - F.lit(n - 1)
        idx = F.when(k >= F.lit(1), F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")
        )
        grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        n_grams = F.size(grams)
        n_distinct = F.size(F.array_distinct(grams))
        return df.select(
            F.col(id_col),
            n_grams.alias("n_grams"),
            n_distinct.alias("n_distinct"),
            F.when(n_grams > 0, F.round((n_grams - n_distinct) / n_grams, 6))
            .otherwise(F.lit(0.0))
            .alias("rep_ratio"),
        )

    import re
    from typing import Iterator

    import pandas as pd

    split = re.compile(r"[\W_]+")

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ng, nd, rr = [], [], [], []
            for i, text in zip(pdf["id"], pdf["t"]):
                toks = [t for t in split.split((text or "").lower()) if t]
                grams = [
                    " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
                ]
                g, d = len(grams), len(set(grams))
                ids.append(i)
                ng.append(g)
                nd.append(d)
                rr.append(round((g - d) / g, 6) if g > 0 else 0.0)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype=pdf["id"].dtype),
                    "n_grams": pd.Series(ng, dtype="int32"),
                    "n_distinct": pd.Series(nd, dtype="int32"),
                    "rep_ratio": pd.Series(rr, dtype="float64"),
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).repartition(par)
    out = src.mapInPandas(kern, "id long, n_grams int, n_distinct int, rep_ratio double")
    return out.withColumnRenamed("id", id_col)


def char_entropy(
    df: DataFrame, id_col: str, text_col: str, *, kernel: str = "pandas"
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the lowercased character
    distribution — a compression-proxy quality signal: natural text sits in
    a band, while boilerplate / repeated filler (low) and random noise
    (high) fall outside it.

    kernel="pandas" (default): per-doc Counter in an Arrow batch kernel,
    summing -p·ln p over chars in sorted order (deterministic float path) —
    map-only, zero shuffle, the 100 TB shape. kernel="sql": explode chars →
    groupBy(doc, char) → per-doc aggregate; shuffles corpus-size char rows,
    kept as the Catalyst cross-check pinned equal in tests (rounding to 6dp
    absorbs summation-order float drift).
    """
    if kernel == "sql":
        chars = df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), ""), lambda c: c != "")
            ).alias("ch"),
        )
        counts = chars.groupBy("id", "ch").agg(F.count("*").alias("cnt"))
        tot = Window.partitionBy("id")
        p = F.col("cnt") / F.sum("cnt").over(tot)
        return (
            counts.withColumn("term", -p * F.log(p))
            .groupBy("id")
            .agg(
                F.round(F.sum("term"), 6).alias("entropy"),
                F.sum("cnt").alias("n_chars_counted"),
            )
            .withColumnRenamed("id", id_col)
        )

    from collections import Counter
    from typing import Iterator

    import math

    import pandas as pd

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ents, ns = [], [], []
            for i, text in zip(pdf["id"], pdf["t"]):
                c = Counter((text or "").lower())
                n = sum(c.values())
                if n:
                    ent = -sum(
                        (v / n) * math.log(v / n) for _, v in sorted(c.items())
                    )
                else:
                    ent = 0.0
                ids.append(i)
                ents.append(round(ent, 6))
                ns.append(n)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype=pdf["id"].dtype),
                    "entropy": pd.Series(ents, dtype="float64"),
                    "n_chars_counted": pd.Series(ns, dtype="int64"),
                }
            )

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    out = src.mapInPandas(kern, "id long, entropy double, n_chars_counted long")
    return out.withColumnRenamed("id", id_col)


def doc_keywords(df: DataFrame, id_col: str, text_col: str, *, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (sklearn's ln((1+N)/(1+df))+1 idf; tf = raw in-doc count). Classic
    corpus summarization / near-dup explanation surface.

    Plan shape: ONE fact-relation exchange, on the doc id. The source is
    repartitioned by id up front; hashpartitioning(id) satisfies the
    required distribution of BOTH the (id, term) tf aggregate (same-key rows
    can't cross docs) AND the per-doc ranking window, so neither re-shuffles
    the token relation — previously the window re-exchanged the full
    (doc, term, tf) relation after the tf aggregate had already exchanged it
    on (id, term). Document frequency aggregates the tf relation map-side
    (vocab-sized partials) and joins back on the term key with the 1-row
    corpus count; the df relation carries no broadcast hint because
    vocabulary grows with the corpus — AQE broadcasts it while small. The
    up-front repartition doubles as the single-split local-fixture fan-out
    (tokenization runs on every core; pre-split cluster inputs make it a
    near-free re-key). Ranking rounds the score to 6dp FIRST and tie-breaks
    on the term text so the top-k is engine-deterministic.
    """
    toks = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .repartition("id")
        .select("id", F.explode(tokens(F.col("t"))).alias("term"))
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((1 + F.col("n_docs")) / (1 + F.col("df")))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "tfidf", "rank")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, cos) sparse TF-IDF cosine document pairs ≥ threshold —
    the inverted-index similarity join (term-at-a-time partial products)
    that complements the dense-embedding kernels: no vectors exist, the
    dot product IS the posting-list intersection, so the shuffle carries
    (term, id, weight) postings and the pair fan-out is Σ per-term df² —
    never corpus². Terms with df > max_df_frac·N are dropped before the
    join (the stop-term cap every production similarity join applies;
    near-ubiquitous terms add O(N²) pairs and ~zero discrimination — at
    100 TB this cap is the difference between a join and an explosion).

    Determinism ladder: weights are ln-idf·tf doubles quantized to 9 dp;
    per-doc norms sum 12-dp-quantized squares as DECIMAL(28,12); pair dot
    products sum 9-dp-quantized cross products as DECIMAL(18,9); the final
    cosine is one double division rounded to 6 dp and thresholded on the
    rounded value — bit-replayable in SQL at any partitioning."""
    from ..functions.text import tokens

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    postings = toks.groupBy("id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    n_docs = df.select(id_col).distinct().count()
    dfreq = postings.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    kept = dfreq.where(F.col("df") <= max_df_frac * n_docs)
    weighted = postings.join(kept, "term").select(
        "id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 9
        ).alias("w"),
    )
    norms = (
        weighted.select(
            "id",
            F.round(F.col("w") * F.col("w"), 12).cast("decimal(28,12)").alias("w2"),
        )
        .groupBy("id")
        .agg(F.sqrt(F.sum("w2").cast("double")).alias("nrm"))
    )
    a = weighted.select(F.col("id").alias("id_a"), "term", F.col("w").alias("wa"))
    b = weighted.select(F.col("id").alias("id_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(F.col("wa") * F.col("wb"), 9).cast("decimal(18,9)").alias("p"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum("p").alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dot").cast("double") / (F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .orderBy("id_a", "id_b")
    )
