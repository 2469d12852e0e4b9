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

    expected = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    assert _py_tokens(s) == expected
    assert all(re.fullmatch(r"[a-z0-9]+", t) for t in _py_tokens(s))


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
