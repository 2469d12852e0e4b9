"""Sweeping plan lint over EVERY declared query: the anti-pattern audit the
100 TB design contract implies, pinned as a test instead of a per-round
hand-grep.

Two rules, both absolute for this engine:

1. No ``CartesianProduct`` anywhere. Every deliberate cross join in the
   repo broadcasts a tiny side (1-row aggregates, query sets, dimension
   stats), which plans as ``BroadcastNestedLoopJoin``; a bare
   CartesianProduct means a broadcast was lost and the plan would
   materialize |A|x|B| at scale.
2. No row-at-a-time Python UDF (``BatchEvalPython``) in any data path.
   All Python here is Arrow-batched (``ArrowEvalPython`` / ``MapInPandas``
   / ``FlatMapGroupsInPandas``) — the 10-100x serialization cliff between
   the two is the difference between a kernel and a bottleneck at 100 TB.

Streaming queries are skipped by name: their driver callables run
foreachBatch folds whose serve-time read is a state-sized parquet scan
(each has its own stream==batch parity pin in test_streaming_sketch.py).
"""

from __future__ import annotations

from .conftest import SF_SMALL


def test_no_cartesian_or_rowwise_python_in_any_declared_plan(spark):
    import __spark_entry__ as entry_mod

    violations: dict[str, list[str]] = {}
    try:
        for name, fn in entry_mod.queries().items():
            if name.startswith("stream_"):
                continue
            df = fn(spark, SF_SMALL)
            plan = df._jdf.queryExecution().executedPlan().toString()
            bad = []
            if "CartesianProduct" in plan:
                bad.append("CartesianProduct")
            if "BatchEvalPython" in plan:
                bad.append("BatchEvalPython (row-at-a-time Python UDF)")
            if bad:
                violations[name] = bad
    finally:
        # the driver queries cache shared relations (ANN corpus, layouts);
        # leaving them cached makes Catalyst substitute InMemoryRelation
        # for matching scans in LATER tests, which silently defeats the
        # parquet pushdown those tests assert on — sweep, then clean up
        spark.catalog.clearCache()
    assert not violations, f"plan lint violations: {violations}"
