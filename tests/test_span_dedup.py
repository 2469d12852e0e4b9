"""C4-style duplicate-span removal (dedup.span_dedup): python-reference
equality, whole-document duplicate elimination, and the map-side partial
aggregation that keeps the first-occurrence election skew-safe."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators.dedup import span_dedup

DOCS = [
    (1, "a b c d e f g h i j k l m n o p"),              # spans: abcdefgh / ijklmnop
    (2, "a b c d e f g h zz yy xx"),                      # first span duplicates doc 1's
    (3, "i j k l m n o p"),                               # whole doc = doc 1's 2nd span
    (4, "unique words only here nothing repeats at all"),
    (5, ""),                                              # no tokens -> no output row
    (6, "a b c"),                                         # one short span
]
SPAN = 8


def _py_reference(docs, span):
    spans = []  # (doc_id, span_idx, text)
    for doc_id, text in docs:
        toks = [t for t in re.split(r"[\W_]+", text.lower()) if t]
        for i in range(0, len(toks), span):
            spans.append((doc_id, i // span, " ".join(toks[i : i + span])))
    first: dict[str, tuple] = {}
    for doc_id, idx, s in sorted(spans):
        first.setdefault(s, (doc_id, idx))
    out = {}
    for doc_id, _ in docs:
        mine = [(i, s) for d, i, s in spans if d == doc_id]
        if not mine:
            continue
        kept = [s for i, s in sorted(mine) if first[s] == (doc_id, i)]
        out[doc_id] = (
            len(mine),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_spans, r.n_kept, r.kept_md5)
        for r in span_dedup(df, "doc_id", "text", span_tokens=SPAN).collect()
    }
    assert got == _py_reference(DOCS, SPAN)


def test_recurring_boilerplate_is_removed_from_later_docs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in span_dedup(df, "doc_id", "text", span_tokens=SPAN).collect()
    }
    # doc 3 is exactly doc 1's second span: everything removed
    assert (out[3].n_spans, out[3].n_kept) == (1, 0)
    assert out[3].kept_md5 == hashlib.md5(b"").hexdigest()
    # doc 2 loses its first span (duplicate of doc 1's) but keeps its tail
    assert (out[2].n_spans, out[2].n_kept) == (2, 1)
    assert out[2].kept_md5 == hashlib.md5(b"zz yy xx").hexdigest()
    # doc 1, the first occurrence, keeps everything
    assert (out[1].n_spans, out[1].n_kept) == (2, 2)


def test_pandas_kernel_matches_sql_baseline(spark):
    """The Arrow span kernel (tokenize once per doc) must reproduce the
    pure-Catalyst higher-order-function baseline exactly."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = sorted(map(tuple, span_dedup(df, "doc_id", "text", span_tokens=SPAN, kernel="sql").collect()))
    b = sorted(map(tuple, span_dedup(df, "doc_id", "text", span_tokens=SPAN, kernel="pandas").collect()))
    assert a == b and len(a) > 0


def test_election_partial_aggregates_before_exchange(spark):
    """The min(id, span_idx) election must partial-aggregate map-side (two
    HashAggregates around the hash exchange), so a corpus-hot span collapses
    to one candidate per input partition before any shuffle — the property
    that makes the plan safe under degenerate span skew."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = span_dedup(df, "doc_id", "text", span_tokens=SPAN)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan, plan
