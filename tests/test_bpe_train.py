"""BPE merge learning: the distributed learner vs an independent pure-Python
reference on planted corpora, merge-application semantics, determinism, and
the real-corpus path."""

from __future__ import annotations

import pytest

from hybrid_vector_search_spark.operators.bpe_train import (
    _replace_pass,
    apply_merge_reference,
    learn_bpe,
    learn_bpe_reference,
    word_frequencies,
)


def _docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_learner_matches_reference_on_planted_corpus(spark):
    """The classic Sennrich toy corpus: merges and counts must equal the
    pure-Python reference exactly, including tie-breaks."""
    rows = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    docs = _docs(spark, rows)
    got = [tuple(r) for r in learn_bpe(docs, merges=8, shuffle_partitions=4).collect()]
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    want = learn_bpe_reference(wf, 8)
    assert got == want
    # the textbook first merges for this corpus: 'es' (newest+widest = 9)
    assert got[0][1:] == ("e", "s", "es", 9)


def test_learner_matches_reference_with_repeated_letters(spark):
    """Runs of identical symbols exercise the shared-delimiter replace
    subtlety — the reference mirrors replace()'s pass semantics, so both
    sides must agree even on 'aaaa'-style words."""
    rows = ["aaaa aaa aa baaab " * 4, "banana bandana ananas " * 3]
    docs = _docs(spark, rows)
    got = [tuple(r) for r in learn_bpe(docs, merges=6, shuffle_partitions=4).collect()]
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    assert got == learn_bpe_reference(wf, 6)


def test_learner_deterministic_across_partitionings(spark):
    rows = ["the quick brown fox jumps over the lazy dog " * 3] * 7
    docs = _docs(spark, rows)
    a = [tuple(r) for r in learn_bpe(docs.repartition(1), merges=5).collect()]
    b = [tuple(r) for r in learn_bpe(docs.repartition(13), merges=5, shuffle_partitions=3).collect()]
    assert a == b and len(a) == 5


def test_replace_pass_semantics():
    # a match consumes its trailing delimiter: the next symbol cannot START
    # a match in the same pass
    assert _replace_pass(list("ababab"), "a", "b") == ["ab", "a", "b", "ab"]
    assert apply_merge_reference(list("ababab"), "a", "b") == ["ab", "ab", "ab"]
    assert _replace_pass(list("aaa"), "a", "a") == ["aa", "a"]
    assert apply_merge_reference(list("aaa"), "a", "a") == ["aa", "a"]
    # multi-char symbols merge as units
    assert apply_merge_reference(["ab", "c", "ab"], "ab", "c") == ["abc", "ab"]


def test_pair_count_is_integer_exact(spark):
    """pair_count is the exact integer frequency-weighted adjacent-pair
    count — checkable by hand on a tiny corpus."""
    docs = _docs(spark, ["ab ab ab"])
    got = [tuple(r) for r in learn_bpe(docs, merges=1, shuffle_partitions=2).collect()]
    assert got == [(1, "a", "b", "ab", 3)]


def test_empty_corpus_stops_early(spark):
    docs = _docs(spark, ["123 456 !!!"])  # no alphabetic words at all
    assert learn_bpe(docs, merges=3, shuffle_partitions=2).collect() == []


def test_vocab_usage_counts(spark):
    """Usage counts are frequency-weighted occurrences of the trained
    segmentation's tokens — hand-checkable on a toy corpus."""
    from hybrid_vector_search_spark.operators.bpe_train import train_bpe, vocab_usage

    docs = _docs(spark, ["ab ab cd"])
    merge_table, seg = train_bpe(docs, merges=1, shuffle_partitions=2)
    assert [tuple(r) for r in merge_table.collect()] == [(1, "a", "b", "ab", 2)]
    got = {(r.token, r.total_count) for r in vocab_usage(seg, topk=10).collect()}
    assert got == {("ab", 2), ("c", 1), ("d", 1)}
