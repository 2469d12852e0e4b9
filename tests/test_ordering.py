"""Epoch shuffle (operators.ordering): determinism under repartitioning,
dense per-shard positions, epoch decorrelation, shard balance, and the
manifest's budget accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import ordering
from tests.conftest import SF_SMALL

N_SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    df.cache().count()
    return df


def test_deterministic_under_repartition(spark, docs):
    a = ordering.epoch_order(docs, "doc_id", epoch=1, n_shards=N_SHARDS)
    b = ordering.epoch_order(
        docs.repartition(13), "doc_id", epoch=1, n_shards=N_SHARDS
    )
    rows_a = {r.doc_id: (r.shard, r.pos) for r in a.select("doc_id", "shard", "pos").collect()}
    rows_b = {r.doc_id: (r.shard, r.pos) for r in b.select("doc_id", "shard", "pos").collect()}
    assert rows_a == rows_b


def test_positions_dense_per_shard(spark, docs):
    out = ordering.epoch_order(docs, "doc_id", epoch=0, n_shards=N_SHARDS)
    per_shard = (
        out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi"),
             F.countDistinct("pos").alias("nd"))
        .collect()
    )
    assert len(per_shard) == N_SHARDS
    for r in per_shard:
        assert (r.lo, r.hi, r.nd) == (1, r.n, r.n)
    assert sum(r.n for r in per_shard) == docs.count()


def test_epochs_decorrelated(spark, docs):
    e0 = ordering.epoch_order(docs, "doc_id", epoch=0, n_shards=N_SHARDS)
    e1 = ordering.epoch_order(docs, "doc_id", epoch=1, n_shards=N_SHARDS)
    m0 = {r.doc_id: (r.shard, r.pos) for r in e0.select("doc_id", "shard", "pos").collect()}
    m1 = {r.doc_id: (r.shard, r.pos) for r in e1.select("doc_id", "shard", "pos").collect()}
    same = sum(1 for k in m0 if m0[k] == m1[k])
    # a fixed point is possible but the permutations must be ~independent
    assert same < 0.05 * len(m0)


def test_shards_balanced(spark, docs):
    out = ordering.epoch_order(docs, "doc_id", epoch=2, n_shards=N_SHARDS)
    sizes = [r.n for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    n = docs.count()
    expect = n / N_SHARDS
    assert all(0.5 * expect <= s <= 1.5 * expect for s in sizes)


def test_shard_manifest_budget(spark, docs):
    ordered = ordering.epoch_order(
        docs.withColumn("n_chars", F.length("text")), "doc_id", epoch=1,
        n_shards=N_SHARDS,
    )
    man = ordering.shard_manifest(ordered, len_col="n_chars").collect()
    assert [r.shard for r in man] == sorted(r.shard for r in man)
    total = docs.select(F.sum(F.length("text"))).first()[0]
    assert sum(r.len_sum for r in man) == total
    assert sum(r.n_rows for r in man) == docs.count()


def test_no_global_sort_in_assignment(spark, docs):
    # the coordinate assignment itself must not contain a global Sort/Exchange
    # rangepartitioning stage — only the hash shuffle for the per-shard window
    out = ordering.epoch_order(docs, "doc_id", epoch=1, n_shards=N_SHARDS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


def test_dense_ids_gap_free(spark, docs):
    out = ordering.dense_ids(docs, "doc_id")
    n = docs.count()
    stats = out.agg(
        F.min("dense_id").alias("lo"),
        F.max("dense_id").alias("hi"),
        F.countDistinct("dense_id").alias("nd"),
        F.count("*").alias("nr"),
    ).first()
    assert (stats.lo, stats.hi, stats.nd, stats.nr) == (0, n - 1, n, n)


def test_dense_ids_match_global_sort_reference(spark, docs):
    out = {r.doc_id: r.dense_id for r in ordering.dense_ids(docs, "doc_id").collect()}
    ref_rows = (
        docs.select(
            "doc_id",
            F.md5(F.concat(F.lit("ids:0#"), F.col("doc_id").cast("string"))).alias("h"),
        )
        .orderBy("h", "doc_id")
        .collect()
    )
    ref = {r.doc_id: i for i, r in enumerate(ref_rows)}
    assert out == ref


def test_dense_ids_repartition_invariant(spark, docs):
    a = {r.doc_id: r.dense_id for r in ordering.dense_ids(docs, "doc_id").collect()}
    b = {
        r.doc_id: r.dense_id
        for r in ordering.dense_ids(docs.repartition(11), "doc_id").collect()
    }
    assert a == b


def test_dense_ids_no_corpus_global_sort(spark, docs):
    # only the 64-row census may pass through a single partition; the corpus
    # itself must never range-partition (= global sort)
    plan = (
        ordering.dense_ids(docs, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower()
