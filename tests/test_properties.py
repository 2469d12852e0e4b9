"""Property-based checks (hypothesis) for driver-side pure functions whose
definitions are load-bearing across engines: the tokenizer (must equal the
Spark/DuckDB regex split), the embedder (determinism + normalization), and
limit clamping (reference contract)."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_py_tokens_matches_regex_definition(s):
    from hybrid_vector_search_spark.operators.bm25 import _py_tokens

    expected = [t for t in re.split(r"[\W_]+", s.lower()) if t]
    assert _py_tokens(s) == expected
    assert all(re.fullmatch(r"[^\W_]+", t) for t in _py_tokens(s))


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_embedder_unit_norm_or_zero(s):
    import numpy as np

    from hybrid_vector_search_spark.operators.embed import HashingEmbedder

    v = HashingEmbedder(dim=32).embed_one(s)
    n = float(np.linalg.norm(v))
    assert len(v) == 32
    assert n == 0.0 or math.isclose(n, 1.0, rel_tol=1e-5)
    # determinism
    assert np.array_equal(v, HashingEmbedder(dim=32).embed_one(s))


@given(st.integers(min_value=-(10**9), max_value=10**9) | st.none())
@settings(max_examples=200, deadline=None)
def test_clamp_limit_contract(k):
    from hybrid_vector_search_spark.operators.knn import clamp_limit

    out = clamp_limit(k)
    assert 1 <= out <= 25
    if k is None:
        assert out == 5
    elif 1 <= k <= 25:
        assert out == k


@given(
    st.lists(st.floats(-10, 10, allow_nan=False), min_size=1, max_size=8),
    st.lists(st.floats(-10, 10, allow_nan=False), min_size=1, max_size=8),
)
@settings(max_examples=100, deadline=None)
def test_fake_feature_vector_deterministic(a, b):
    from hybrid_vector_search_spark.multimodal import fake_feature_vector

    import numpy as np

    ba = bytes(bytearray(int(abs(x) * 10) % 256 for x in a))
    bb = bytes(bytearray(int(abs(x) * 10) % 256 for x in b))
    va = fake_feature_vector(ba, 16)
    assert np.array_equal(va, fake_feature_vector(ba, 16))
    if ba != bb:
        assert not np.array_equal(va, fake_feature_vector(bb, 16))


@given(
    st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=50, unique=True),
    st.lists(st.text(min_size=1, max_size=20), max_size=50),
    st.sampled_from([64, 256, 1 << 12, 1 << 16]),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=100, deadline=None)
def test_bloom_construction_never_false_negative(keys, probes, m_bits, k):
    """Pure-Python replay of operators.bloom's md5-position bitmap: for ANY
    key set, bitmap size, and hash count, every inserted key passes the
    membership test — the property the decontaminate_bloom oracle rests on.
    (The Spark twin of this arithmetic is pinned in test_bloom.py.)"""
    import hashlib

    def positions(key, kk, m):
        return [
            int(hashlib.md5(f"{i}#{key}".encode()).hexdigest()[:15], 16) % m
            for i in range(kk)
        ]

    words: dict[int, int] = {}
    for key in keys:
        for pos in positions(key, k, m_bits):
            words[pos // 64] = words.get(pos // 64, 0) | (1 << (pos % 64))

    def maybe_member(key):
        return all(
            words.get(pos // 64, 0) & (1 << (pos % 64)) for pos in positions(key, k, m_bits)
        )

    assert all(maybe_member(key) for key in keys)
    # and the filter is sound to USE: probes that pass are a superset of the
    # true members, never a subset (spot-checked against set membership)
    true_members = set(keys)
    for p in probes:
        if p in true_members:
            assert maybe_member(p)


@given(st.integers(0, 10**6), st.integers(0, 10**6), st.integers(0, 2**31))
@settings(max_examples=200, deadline=None)
def test_catalog_row_pure_function_of_seed_and_index(i, j, seed):
    """sources.pyds determinism contract: row i is a pure function of
    (seed, i) — equal inputs give identical rows, so ANY partitioning of
    the range generates the identical dataset."""
    from hybrid_vector_search_spark.sources.pyds import catalog_row

    assert catalog_row(seed, i) == catalog_row(seed, i)
    if i != j:
        # ids are 24 hex chars from independent RNG streams — collisions
        # would mean the streams are not independent
        assert catalog_row(seed, i)[0] != catalog_row(seed, j)[0]
