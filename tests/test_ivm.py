"""IVM partials: merge associativity (maintenance == one-shot), retraction
semantics, and full-group dropout."""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import ivm


def _orders(spark):
    rows = [(i, f"P{i % 3}", float(10 + i)) for i in range(60)]
    return spark.createDataFrame(rows, "k long, g string, v double")


def test_merge_of_batches_equals_one_shot(spark):
    df = _orders(spark)
    one = ivm.partials(df, ["g"], "v")
    batched = ivm.merge(
        ivm.partials(df.where("k % 3 = 0"), ["g"], "v"),
        ivm.partials(df.where("k % 3 = 1"), ["g"], "v"),
        ivm.partials(df.where("k % 3 = 2"), ["g"], "v"),
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, batched.collect()))


def test_retraction_inverts_insert(spark):
    df = _orders(spark)
    sub = df.where("k % 4 = 0")
    view = ivm.merge(
        ivm.partials(df, ["g"], "v"),
        ivm.partials(sub, ["g"], "v", negate=True),
    )
    want = ivm.partials(df.where("k % 4 <> 0"), ["g"], "v")
    assert sorted(map(tuple, view.collect())) == sorted(map(tuple, want.collect()))


def test_fully_retracted_group_drops(spark):
    df = _orders(spark)
    g0 = df.where("g = 'P0'")
    view = ivm.merge(
        ivm.partials(df, ["g"], "v"),
        ivm.partials(g0, ["g"], "v", negate=True),
    )
    assert sorted(r.g for r in view.collect()) == ["P1", "P2"]


def test_finish_derives_average_from_partials(spark):
    df = _orders(spark)
    got = {
        r.g: (r.total, r.n_rows, r.avg_value)
        for r in ivm.finish(ivm.partials(df, ["g"], "v")).collect()
    }
    want = {
        r.g: (float(r.s), r.n, round(float(r.s) / r.n, 6))
        for r in df.groupBy("g")
        .agg(F.sum(F.col("v").cast("decimal(28,2)")).alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want
