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
