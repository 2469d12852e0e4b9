"""Sequence packing (grouped next-fit) and per-group caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_MID


def _py_bucket(key, *, buckets, salt=""):
    """Python twin of sampling.hash_bucket (md5 first-8-hex mod buckets)."""
    import hashlib

    return int(hashlib.md5(f"{salt}#{key}".encode()).hexdigest()[:8], 16) % buckets


def _py_pack(items, capacity):
    """Reference next-fit: items = [(id, len)] in fold order."""
    out, bin_idx, fill = {}, 0, 0
    first = True
    for i, ln in items:
        if not first and fill + ln > capacity:
            bin_idx, fill = bin_idx + 1, 0
        first = False
        out[i] = (bin_idx, fill)
        fill += ln
    return out


@pytest.fixture(scope="module")
def docs_lens(spark):
    from hybrid_vector_search_spark.functions.text import token_count
    from hybrid_vector_search_spark.sources import load_table

    return (
        load_table(spark, SF_MID, "documents")
        .select("doc_id", token_count(F.col("text")).alias("n_tokens"))
        .cache()
    )


def test_pack_matches_python_reference(spark, docs_lens):
    from hybrid_vector_search_spark.operators.packing import pack_sequences

    cap, groups = 128, 8
    got = {
        r.doc_id: (r.pack_group, r.bin_idx, r.bin_offset)
        for r in pack_sequences(
            docs_lens, "doc_id", "n_tokens", capacity=cap, n_groups=groups
        ).collect()
    }
    rows = [(r.doc_id, int(r.n_tokens)) for r in docs_lens.collect()]
    by_group: dict[int, list] = {}
    for i, ln in rows:
        by_group.setdefault(_py_bucket(i, buckets=groups, salt="pack"), []).append((i, ln))
    want = {}
    for g, items in by_group.items():
        for i, (b, off) in _py_pack(sorted(items), cap).items():
            want[i] = (g, b, off)
    assert got == want


def test_pack_invariants_and_determinism(spark, docs_lens):
    from hybrid_vector_search_spark.operators.packing import pack_sequences, pack_stats

    cap = 100
    packed = pack_sequences(docs_lens, "doc_id", "n_tokens", capacity=cap, n_groups=4)
    rows = packed.collect()
    assert len(rows) == docs_lens.count()
    # offsets are contiguous prefix sums within each (group, bin)
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r.pack_group, r.bin_idx), []).append(r)
    for items in by_bin.values():
        items.sort(key=lambda r: r.bin_offset)
        run = 0
        for r in items:
            assert r.bin_offset == run
            run += r.n_tokens
        # a bin never overflows unless it holds a single oversize item
        assert run <= cap or len(items) == 1
    # bin indices dense from 0 per group
    for g in {r.pack_group for r in rows}:
        bins = sorted({r.bin_idx for r in rows if r.pack_group == g})
        assert bins == list(range(len(bins)))
    # stats agree with the mapping
    stats = pack_stats(packed, "n_tokens", capacity=cap).collect()
    fills = {(r.pack_group, r.bin_idx): (r.n_items, r.fill, r.slack) for r in stats}
    for key, items in by_bin.items():
        total = sum(r.n_tokens for r in items)
        assert fills[key] == (len(items), total, max(0, cap - total))
    # repartitioning must not change the packing (hash groups + id order)
    again = {
        (r.doc_id, r.pack_group, r.bin_idx, r.bin_offset)
        for r in pack_sequences(
            docs_lens.repartition(13), "doc_id", "n_tokens", capacity=cap, n_groups=4
        ).collect()
    }
    assert again == {(r.doc_id, r.pack_group, r.bin_idx, r.bin_offset) for r in rows}


def test_pack_oversize_item_gets_own_bin(spark):
    from hybrid_vector_search_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 10), (2, 500), (3, 10)], "id long, len long"
    )
    rows = {
        r.id: (r.bin_idx, r.bin_offset)
        for r in pack_sequences(df, "id", "len", capacity=64, n_groups=1).collect()
    }
    oversize_bin = rows[2][0]
    assert rows[2][1] == 0  # oversize opens its own bin at offset 0
    assert sum(1 for b, _ in rows.values() if b == oversize_bin) == 1

    with pytest.raises(ValueError):
        pack_sequences(df, "id", "len", capacity=0, n_groups=1)
    with pytest.raises(ValueError):
        pack_sequences(df, "id", "len", capacity=10, n_groups=0)


def test_cap_per_group(spark, docs_lens):
    from hybrid_vector_search_spark.operators.packing import cap_per_group
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, SF_MID, "documents")
    capped = cap_per_group(docs, "source", "doc_id", 20)
    counts = {r.source: r.n for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in full.items():
        assert counts[src] == min(n, 20)
    # deterministic hash-order selection, not scan order
    a = {r.doc_id for r in capped.collect()}
    b = {r.doc_id for r in cap_per_group(docs.repartition(17), "source", "doc_id", 20).collect()}
    assert a == b
    # python twin of the selection rule
    by_src: dict[str, list] = {}
    for r in docs.select("doc_id", "source").collect():
        by_src.setdefault(r.source, []).append(r.doc_id)
    want = set()
    for src, ids in by_src.items():
        ids.sort(key=lambda i: (_py_bucket(i, buckets=10_000, salt="cap"), i))
        want.update(ids[:20])
    assert a == want

    with pytest.raises(ValueError):
        cap_per_group(docs, "source", "doc_id", 0)
