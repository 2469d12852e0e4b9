"""Z-order clustering: key correctness vs a python reference, and 2-D
locality of the exported files (both columns' per-file ranges shrink)."""

from __future__ import annotations

import glob

import pandas as pd
import pyspark.sql.functions as F


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference(spark):
    from hybrid_vector_search_spark.functions.zorder import zorder_key

    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 64, 65535)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_key(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.z == _py_morton(r.a, r.b), (r.a, r.b)


def test_zorder_export_two_dim_locality(spark, tmp_path):
    """Range-partitioning on the Morton key must give per-file locality on
    BOTH columns (each file's span well below the global span) — the
    property that makes parquet min/max stats prune either predicate."""
    from hybrid_vector_search_spark.functions.zorder import zorder_export
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = str(tmp_path / "zdocs")
    zorder_export(docs, out, "doc_id", "n_chars", num_files=9)

    g_id = g_nc = None
    spans_id, spans_nc = [], []
    full = pd.concat(
        [pd.read_parquet(f)[["doc_id", "n_chars"]] for f in glob.glob(f"{out}/part-*.parquet")]
    )
    g_id = full.doc_id.max() - full.doc_id.min()
    g_nc = full.n_chars.max() - full.n_chars.min()
    for f in glob.glob(f"{out}/part-*.parquet"):
        pdf = pd.read_parquet(f)[["doc_id", "n_chars"]]
        if len(pdf) < 10:
            continue
        spans_id.append((pdf.doc_id.max() - pdf.doc_id.min()) / g_id)
        spans_nc.append((pdf.n_chars.max() - pdf.n_chars.min()) / g_nc)
    # average per-file coverage of each dimension must be a strict subset
    assert sum(spans_id) / len(spans_id) < 0.75, spans_id
    assert sum(spans_nc) / len(spans_nc) < 0.75, spans_nc
    assert len(full) == docs.count()


def test_zorder_key_random_pairs_roundtrip(spark):
    """Randomized breadth (seeded): the Catalyst key equals the reference
    AND de-interleaving the key's even/odd bits recovers both inputs."""
    import random

    from hybrid_vector_search_spark.functions.zorder import zorder_key

    rng = random.Random(42)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_key(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.z == _py_morton(r.a, r.b)
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)


def test_zorder_export_caller_bounds_single_scan(spark, tmp_path):
    """With bounds= (the 100 TB path: table statistics), the keyed plan is a
    pure projection — no Aggregate over the fact table anywhere — and
    out-of-bounds rows clamp into edge buckets instead of corrupting keys."""
    from hybrid_vector_search_spark.functions.zorder import (
        zorder_export,
        zorder_keyed,
    )
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    keyed = zorder_keyed(docs, "doc_id", "n_chars", bounds=(10, 100, 50, 200))
    plan = keyed._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan, plan
    out = str(tmp_path / "zb")
    # deliberately too-tight bounds: clamping must keep every row
    zorder_export(
        docs, out, "doc_id", "n_chars", num_files=4, bounds=(10, 100, 50, 200)
    )
    got = spark.read.parquet(out)
    assert got.count() == docs.count()


def test_zorder_export_default_bounds_is_lazy(spark, tmp_path):
    """The default (no bounds) path derives min/max as a broadcast stats
    relation INSIDE the write plan — constructing the keyed relation runs NO
    eager .first()/driver job (r5 verdict ask #4) — and the written rows
    round-trip."""
    from hybrid_vector_search_spark.functions.zorder import (
        zorder_export,
        zorder_keyed,
    )
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    keyed = zorder_keyed(docs, "doc_id", "n_chars")
    _ = keyed.columns  # analysis only
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "building the keyed plan must not run any job"
    out = str(tmp_path / "zl")
    zorder_export(docs, out, "doc_id", "n_chars", num_files=4)
    got = spark.read.parquet(out)
    assert got.count() == docs.count()
    assert sorted(got.columns) == sorted(docs.columns)
