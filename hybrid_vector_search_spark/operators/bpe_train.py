"""Distributed BPE merge learning — the tokenizer-TRAINING half of the
tokenizer family (textstats covers the accounting half: pre-tokenizer
stats, fertility, OOV).

Byte-pair encoding training (Sennrich, Haddow, Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016) is an iterative
fixpoint: count adjacent symbol pairs over the corpus' word frequencies,
merge the most frequent pair everywhere, repeat. The reference engine has
no analog (it delegates all text analysis to Lucene — reference
indexes.py:73-86); this module exists because a training-data engine that
accounts for tokenizers should also be able to LEARN one at corpus scale.

Spark shape (the pagerank.py iterative-DataFrame policy):

- The corpus is touched ONCE: a word-frequency aggregation (the only
  corpus-sized job — exactly how hf/tokenizers trains: word counts first).
  Everything iterative runs over the DISTINCT-WORD relation, which is
  vocabulary-sized (Heaps' law), never corpus-sized.
- Each word is a space-delimited symbol sequence (" l o w "); one
  iteration = one integer-weighted pair count (groupBy (lhs, rhs),
  SUM(freq) — exact, order/partition-independent), one driver-side top-1
  (the merge decision is inherently global and one row — same class as
  pagerank's n = count()), one merge application via P passes of literal
  string replace (see below), one localCheckpoint to cut lineage so plan
  size stays constant across iterations.
- Merge application: ``replace(seq, ' l r ', ' lr ')`` scans
  left-to-right over non-overlapping matches — one pass can miss an
  occurrence that shared a delimiter space with the previous match, so the
  replace is applied ``passes`` times (adjacent shared-delimiter runs
  halve each pass; 6 passes covers words far beyond any natural length).
  Spark's ``replace`` and DuckDB's ``replace`` share these exact
  semantics, which is what makes the whole fixpoint replayable as a
  chained CTE by the oracle (plans/oracles.py::_bpe_sql) — the same
  engine-exactness policy as the DECIMAL PageRank.

At 100 TB: the word-count job is one map-side-combined aggregation over
the corpus; the training loop's working set is |vocab| rows regardless of
corpus size; each iteration shuffles |symbol pairs| ≤ |vocab|·max_word_len
integer-weighted rows. Co-partitioning is irrelevant at that size; the
driver sees exactly one row per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_SPLIT_RE = r"[^\p{L}]+"  # lower + split: the simplest cross-engine word unit


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased alphabetic words — the ONE corpus-sized
    job of BPE training; everything after runs on this vocab-sized table."""
    words = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE), lambda t: t != ""
        )
    )
    return docs.select(words.alias("word")).groupBy("word").agg(
        F.count("*").cast("long").alias("freq")
    )


def _initial_segments(words: DataFrame) -> DataFrame:
    """(word, ' w o r d ', freq) — every char its own symbol, space-delimited
    with outer sentinels so every symbol occurrence (first/last included)
    matches the ' l r ' replace pattern. The word key rides along untouched
    so training OUTPUT doubles as the word → segmentation lookup table."""
    chars = F.regexp_extract_all(F.col("word"), F.lit("\\p{L}"), 0)
    return words.select(
        "word",
        F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias("seq"),
        "freq",
    )


def learn_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    merges: int = 10,
    passes: int = 6,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Learn ``merges`` BPE merges; returns the merge table
    (rank, lhs, rhs, merged, pair_count) ordered by rank.

    Ties in pair counts break (count DESC, lhs ASC, rhs ASC) — a total
    order, so the learned tokenizer is deterministic across partitionings,
    engines, and runs.

    ``shuffle_partitions`` temporarily scopes
    ``spark.sql.shuffle.partitions`` around the iteration loop (consumed
    here because every iteration materializes eagerly — the pagerank
    policy): the loop's working set is vocabulary-sized, so per-task
    scheduling overhead × merges dominates unless partitions are sized to
    the vocab, not the corpus. Results are bit-identical either way
    (integer sums); only wall-clock changes.
    """
    return train_bpe(
        docs,
        text_col=text_col,
        merges=merges,
        passes=passes,
        shuffle_partitions=shuffle_partitions,
    )[0]


def train_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    merges: int = 10,
    passes: int = 6,
    shuffle_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(merge table, final segmented vocab) — learn_bpe plus the trained
    segmentation ``(seq, freq)`` it produced, so downstream consumers
    (vocabulary usage, token-id assignment, fertility of the LEARNED
    tokenizer) read the training output instead of re-running the loop."""
    spark = docs.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        return _learn_bpe_loop(spark, docs, text_col, merges, passes)
    finally:
        spark.conf.set(conf_key, old_sp)


def vocab_usage(segments: DataFrame, topk: int = 20) -> DataFrame:
    """(token, total_count) over a trained segmentation: corpus frequency of
    the learned subword vocabulary (frequency-weighted, so it reports token
    OCCURRENCES, not vocab membership) — the usage histogram a tokenizer
    report leads with. Top-k by (count DESC, token ASC)."""
    toks = F.explode(F.split(F.trim(F.col("seq")), " ")).alias("token")
    return (
        segments.select(toks, "freq")
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("total_count"))
        .orderBy(F.desc("total_count"), F.asc("token"))
        .limit(topk)
    )


def _learn_bpe_loop(spark, docs, text_col, merges, passes):
    seg = _initial_segments(word_frequencies(docs, text_col)).localCheckpoint()
    learned: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, merges + 1):
        toks = F.split(F.trim(F.col("seq")), " ")
        prs = F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda l, r: F.struct(l.alias("lhs"), r.alias("rhs")),
        )
        top = (
            seg.select(F.explode(prs).alias("p"), "freq")
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        learned.append((rank, lhs, rhs, lhs + rhs, cnt))
        pattern, repl = f" {lhs} {rhs} ", f" {lhs}{rhs} "
        col = F.col("seq")
        for _ in range(passes):
            col = F.replace(col, F.lit(pattern), F.lit(repl))
        # localCheckpoint: constant-size plan per iteration (pagerank policy)
        seg = seg.select("word", col.alias("seq"), "freq").localCheckpoint()
    merge_table = spark.createDataFrame(
        learned, "rank int, lhs string, rhs string, merged string, pair_count long"
    ).orderBy("rank")
    return merge_table, seg


def _replace_pass(syms: list[str], lhs: str, rhs: str) -> list[str]:
    """One left-to-right non-overlapping merge pass with ``replace``'s exact
    delimiter semantics: a match consumes its trailing space, so the symbol
    immediately after a merge cannot START a match within the same pass."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            if i + 2 < n:
                out.append(syms[i + 2])
            i += 3
        else:
            out.append(syms[i])
            i += 1
    return out


def apply_merge_reference(
    symbols: list[str], lhs: str, rhs: str, *, passes: int = 6
) -> list[str]:
    """Pure-Python mirror of the engines' P-pass replace merge application.
    Used by tests to pin the distributed learner against an independent
    implementation with byte-identical semantics."""
    for _ in range(passes):
        nxt = _replace_pass(symbols, lhs, rhs)
        if nxt == symbols:
            break
        symbols = nxt
    return symbols


def learn_bpe_reference(
    word_freqs: dict[str, int], merges: int, *, passes: int = 6
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python reference learner with identical pair counting, identical
    tie-breaking (count DESC, lhs ASC, rhs ASC) and identical merge
    application; tests pin learn_bpe equal to this on planted corpora."""
    segs: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        key = tuple(ch for ch in w if "a" <= ch <= "z")
        if key:
            segs[key] = segs.get(key, 0) + f
    out = []
    for rank in range(1, merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for seq, f in segs.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, lhs, rhs, lhs + rhs, cnt))
        new_segs: dict[tuple[str, ...], int] = {}
        for seq, f in segs.items():
            key = tuple(apply_merge_reference(list(seq), lhs, rhs, passes=passes))
            new_segs[key] = new_segs.get(key, 0) + f
        segs = new_segs
    return out
