"""Prefix-filtered exact Jaccard (PPJoin-style): output equality with the
plain inverted-index join — on the real corpus at two SFs and on a seeded
random corpus — and the candidate-reduction claim itself."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_prefix,
    shingle_table,
)


def _pairs(df):
    return sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9)) for r in df.collect()
    )


def _docs_sh(spark, sf):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return shingle_table(docs, "doc_id", "text", n=3)


def test_prefix_equals_plain_on_corpus(spark):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        sh = _docs_sh(spark, sf).cache()
        sh.count()
        for t in (0.5, 0.7, 0.9):
            assert _pairs(jaccard_pairs_prefix(sh, min_jaccard=t)) == _pairs(
                jaccard_pairs(sh, min_jaccard=t)
            ), (sf, t)
        sh.unpersist()


def test_prefix_equals_plain_random_sets(spark):
    rnd = random.Random(23)
    vocab = [f"tok{i}" for i in range(60)]
    rows = []
    for i in range(80):
        base = rnd.sample(vocab, rnd.randint(4, 14))
        rows.extend((i, t) for t in base)
        if i % 3 == 0:  # plant a high-overlap sibling
            sib = base[: max(3, len(base) - 2)] + [rnd.choice(vocab)]
            rows.extend((1000 + i, t) for t in set(sib))
    sh = spark.createDataFrame(rows, "id long, sh string").distinct()
    for t in (0.4, 0.6, 0.8):
        assert _pairs(jaccard_pairs_prefix(sh, min_jaccard=t)) == _pairs(
            jaccard_pairs(sh, min_jaccard=t)
        ), t


def test_prefix_indexes_fewer_tokens(spark):
    sh = _docs_sh(spark, "/root/testdata/sf0.001").cache()
    total = sh.count()
    t = 0.7
    from pyspark.sql import Window

    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = sh.join(dfreq, "sh").withColumn(
        "pos", F.row_number().over(Window.partitionBy("id").orderBy("df", "sh"))
    )
    sizes = ranked.groupBy("id").agg(F.count("*").alias("sz"))
    pref = (
        ranked.join(sizes, "id")
        .where(F.col("pos") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1)
        .count()
    )
    assert pref < 0.45 * total  # ~(1-t) of tokens indexed
    sh.unpersist()


def _naive_containment(sh, t):
    """The plain full self-join composition containment_pairs_prefix must
    reproduce (the shape ngram_containment_pairs used before r11)."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        # integer predicate i >= ceil(t*sz), matching the r12 contract
        # (thresholding on the rounded ratio admits pairs the prefix plan
        # provably never generates once exact containment can sit within
        # 5e-7 below t)
        .where(
            (F.col("i") >= F.ceil(F.lit(t) * F.col("sa")))
            | (F.col("i") >= F.ceil(F.lit(t) * F.col("sb")))
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("i") / F.col("sa").cast("double"), 6).alias("cont_a_in_b"),
            F.round(F.col("i") / F.col("sb").cast("double"), 6).alias("cont_b_in_a"),
        )
    )


def _cpairs(df):
    return sorted(
        (r.id_a, r.id_b, r.cont_a_in_b, r.cont_b_in_a) for r in df.collect()
    )


def test_containment_prefix_equals_plain_on_corpus(spark):
    from hybrid_vector_search_spark.operators.dedup import containment_pairs_prefix

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        # the planted-snippet fixture ngram_containment_pairs uses: every
        # 25th doc re-inserted truncated to its first half
        truncated = docs.where(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 20_000).alias("doc_id"),
            F.expr("substring(text, 1, cast(floor(n_chars / 2) AS INT))").alias("text"),
        )
        corpus = docs.select("doc_id", "text").unionAll(truncated)
        sh = shingle_table(corpus, "doc_id", "text", n=3).cache()
        sh.count()
        for t in (0.6, 0.8):
            got = _cpairs(containment_pairs_prefix(sh, min_containment=t))
            want = _cpairs(_naive_containment(sh, t))
            assert got == want, (sf, t, len(got), len(want))
        assert len(got) > 0, "planted snippets must surface"
        sh.unpersist()


def test_containment_prefix_equals_plain_random_sets(spark):
    from hybrid_vector_search_spark.operators.dedup import containment_pairs_prefix

    rnd = random.Random(41)
    vocab = [f"tok{i}" for i in range(50)]
    rows = []
    for i in range(70):
        base = rnd.sample(vocab, rnd.randint(3, 12))
        rows.extend((i, t) for t in base)
        if i % 4 == 0:  # plant a strict-subset snippet (containment 1.0)
            rows.extend((1000 + i, t) for t in base[: max(2, len(base) // 2)])
    sh = spark.createDataFrame(rows, "id long, sh string").distinct()
    for t in (0.5, 0.8, 1.0):
        assert _cpairs(containment_pairs_prefix(sh, min_containment=t)) == _cpairs(
            _naive_containment(sh, t)
        ), t
