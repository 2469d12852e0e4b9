"""Gopher-rule filter, char entropy, duplicate spans, canonicalization,
sign buckets — unit semantics on crafted corpora (the sf0.01 oracle parity
for these lives in test_oracle_parity via the driver contract)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import dedup, textstats
from hybrid_vector_search_spark.operators.quality_rules import gopher_rules


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopherRules:
    def test_clean_doc_passes(self, spark):
        text = " ".join(
            ["the quick brown fox jumps over that lazy dog of and with near river today"]
            * 4
        )
        row = gopher_rules(_docs(spark, [(1, text)]), "doc_id", "text").first()
        assert row.passes
        assert row.n_words == 60
        assert row.frac_alpha == 1.0
        assert row.stop_hits == 5  # the, that, of, and, with

    def test_short_doc_fails_min_words(self, spark):
        row = gopher_rules(
            _docs(spark, [(1, "the tiny doc with have that of and be")]),
            "doc_id",
            "text",
        ).first()
        assert not row.passes and row.n_words < 50
        assert row.stop_hits == 7

    def test_bullet_and_ellipsis_lines(self, spark):
        text = "- item one\n- item two\nplain line ends...\n"
        row = gopher_rules(_docs(spark, [(1, text)]), "doc_id", "text").first()
        assert row.frac_bullet_lines == pytest.approx(2 / 3, abs=1e-6)
        assert row.frac_ellipsis_lines == pytest.approx(1 / 3, abs=1e-6)

    def test_symbol_ratio(self, spark):
        row = gopher_rules(
            _docs(spark, [(1, "# head # tag more words here")]), "doc_id", "text"
        ).first()
        # 2 '#' over 5 words (tokenizer drops '#' itself)
        assert row.symbol_word_ratio == pytest.approx(2 / 5, abs=1e-6)
        assert not row.passes

    def test_empty_doc(self, spark):
        row = gopher_rules(_docs(spark, [(1, "")]), "doc_id", "text").first()
        assert row.n_words == 0 and not row.passes
        assert row.mean_word_len == 0.0 and row.symbol_word_ratio == 0.0


class TestCharEntropy:
    def test_known_value(self, spark):
        # "aabb": p(a)=p(b)=1/2 → H = ln 2
        out = textstats.char_entropy(
            _docs(spark, [(1, "aabb")]), "doc_id", "text"
        ).first()
        assert out.entropy == pytest.approx(math.log(2), abs=1e-6)
        assert out.n_chars_counted == 4

    def test_single_char_zero_entropy(self, spark):
        out = textstats.char_entropy(
            _docs(spark, [(1, "aaaa")]), "doc_id", "text"
        ).first()
        assert out.entropy == 0.0

    def test_kernels_pinned_equal(self, spark):
        rows = [(i, f"some text with répéated chars {i} ok" * (i + 1)) for i in range(8)]
        df = _docs(spark, rows)
        fast = textstats.char_entropy(df, "doc_id", "text").orderBy("doc_id").collect()
        slow = (
            textstats.char_entropy(df, "doc_id", "text", kernel="sql")
            .orderBy("doc_id")
            .collect()
        )
        assert [tuple(r) for r in fast] == [tuple(r) for r in slow]


class TestDuplicateSpans:
    def test_planted_duplicates(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        df = _docs(
            spark,
            [
                (1, shared + " unique tail one two three"),
                (2, shared + " other ending words here now"),
                (3, "completely different words nothing shared at all ok"),
            ],
        )
        out = {
            r.doc_id: r
            for r in dedup.duplicate_spans(df, "doc_id", "text", n=5).collect()
        }
        assert out[1].n_shared > 0 and out[2].n_shared > 0
        assert out[3].n_shared == 0 and out[3].dup_frac == 0.0
        # the 8-token shared prefix contributes exactly 4 shared 5-grams
        assert out[1].n_shared == 4

    def test_no_shingles_doc_absent(self, spark):
        df = _docs(spark, [(1, "too short"), (2, "one two three four five six")])
        ids = {
            r.doc_id for r in dedup.duplicate_spans(df, "doc_id", "text", n=5).collect()
        }
        assert ids == {2}


class TestCanonicalize:
    def test_longest_wins_and_singletons_kept(self, spark):
        docs = spark.createDataFrame(
            [(1, 100), (2, 300), (3, 200), (4, 50)],
            "doc_id long, n_chars long",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long"
        )
        out = {
            r.doc_id: r
            for r in dedup.canonicalize(docs, pairs, "doc_id").collect()
        }
        assert out[1].canonical_id == 2 and not out[1].is_kept
        assert out[2].canonical_id == 2 and out[2].is_kept
        assert out[3].canonical_id == 2 and not out[3].is_kept
        assert out[4].canonical_id == 4 and out[4].is_kept

    def test_tie_breaks_to_smallest_id(self, spark):
        docs = spark.createDataFrame(
            [(7, 100), (9, 100)], "doc_id long, n_chars long"
        )
        pairs = spark.createDataFrame([(7, 9)], "id_a long, id_b long")
        out = {r.doc_id: r for r in dedup.canonicalize(docs, pairs, "doc_id").collect()}
        assert out[7].is_kept and out[9].canonical_id == 7


class TestSignBucket:
    def test_known_buckets(self, spark):
        from hybrid_vector_search_spark.functions.vector import sign_bucket

        df = spark.createDataFrame(
            [
                (1, [1.0, 1.0, 1.0, 1.0]),
                (2, [-1.0, -1.0, -1.0, -1.0]),
                (3, [1.0, -1.0, 1.0, -1.0]),
                (4, [0.0, -1.0, -1.0, 1.0]),  # zero counts as non-negative
            ],
            "id long, v array<double>",
        )
        got = {
            r.id: r.b
            for r in df.select("id", sign_bucket(F.col("v"), bits=4).alias("b")).collect()
        }
        assert got == {1: 15, 2: 0, 3: 5, 4: 9}


class TestSimhashPairs:
    def test_identical_docs_distance_zero(self, spark):
        text = "the quick brown fox jumps over the lazy dog again and again"
        df = _docs(spark, [(1, text), (2, text), (3, "totally different words")])
        out = {
            (r.id_a, r.id_b): r.hamming
            for r in dedup.simhash_pairs(df, "doc_id", "text").collect()
        }
        assert out.get((1, 2)) == 0

    def test_banding_matches_exhaustive(self, spark):
        rows = [
            (i, f"doc {i % 4} shares words with group {i % 4} members plus {i}")
            for i in range(20)
        ]
        df = _docs(spark, rows)
        banded = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_pairs(
                df, "doc_id", "text", bits=32, bands=4, max_hamming=3
            ).collect()
        }
        fp = {r.id: r.simhash for r in dedup.simhash(df, "doc_id", "text").collect()}
        ids = sorted(fp)
        exhaustive = {
            (a, b, bin(fp[a] ^ fp[b]).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(fp[a] ^ fp[b]).count("1") <= 3
        }
        assert banded == exhaustive


class TestDocKeywords:
    def test_rare_term_outranks_common(self, spark):
        df = _docs(
            spark,
            [
                (1, "common common common zebra"),
                (2, "common words here"),
                (3, "common words again"),
            ],
        )
        out = textstats.doc_keywords(df, "doc_id", "text", k=2).collect()
        doc1 = {r.rank: r.term for r in out if r.doc_id == 1}
        # tf(common)=3 outweighs idf, but zebra (df=1) beats rank-2 terms
        assert set(doc1.values()) == {"common", "zebra"}
        for r in out:
            assert r.rank <= 2


class TestSourceMixture:
    def test_weights_normalized_and_sublinear(self, spark):
        from hybrid_vector_search_spark.plans import pipeline

        out = pipeline.source_mixture_weights(spark, "/root/testdata/sf0.001").collect()
        total = sum(r.weight for r in out)
        assert total == pytest.approx(1.0, abs=1e-4)
        # temperature 0.3 compresses the spread: max/min weight ratio must be
        # far smaller than the token ratio
        toks = [r.n_tokens for r in out]
        ws = [r.weight for r in out]
        assert max(ws) / min(ws) < (max(toks) / min(toks)) ** 0.5
